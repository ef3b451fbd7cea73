package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys: spread each hot left key over
  * `saltBuckets` shuffle partitions by appending a deterministic salt,
  * replicate the right side once per bucket, join on (keys, salt).
  *
  * The salt is invisible in the result — a salted join returns EXACTLY
  * the plain join's rows (the oracle query is the plain join). Use when a
  * handful of keys dominate (AQE's skew-join handles sort-merge skew, but
  * salting also spreads the *aggregation* above the join and works for
  * broadcast-ineligible dimension replication).
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBuckets: Int): DataFrame = {
    // salt from the WHOLE left row (not the key — the point is to spread
    // rows of one hot key across buckets)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltBuckets)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
