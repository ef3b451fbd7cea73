package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — HOT KEYS ONLY. The naive formulation
  * replicates the whole right table `saltBuckets`×, which is exactly what
  * does not survive a 100 TB right side. Here:
  *
  *  1. a key-frequency aggregate over the left side finds keys with
  *     ≥ `hotThreshold` rows (map-side partial combine makes this a
  *     count-sized shuffle, not a data-sized one);
  *  2. the hot-key set broadcasts to tag both sides map-side;
  *  3. hot left rows get a deterministic row-hash salt in [0, buckets),
  *     hot right rows replicate once per bucket; COLD rows on both sides
  *     take salt 0 — one join on (keys, salt), no union, single scan per
  *     side, replication ∝ (hot keys × buckets) only.
  *
  * The salt is invisible in the result — output ≡ the plain join (the
  * oracle runs the plain join). AQE's skew-join covers sort-merge skew at
  * runtime; explicit salting also spreads the aggregation ABOVE the join
  * and works where the skewed side must hash-join.
  */
object SkewJoin {

  /** The salted sides, exposed for plan tests: left with a `__salt`
    * column, right replicated per bucket for hot keys only.
    */
  def saltedSides(left: DataFrame, right: DataFrame, keys: Seq[String],
                  saltBuckets: Int, hotThreshold: Long): (DataFrame, DataFrame) = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    require(hotThreshold > 0, s"hotThreshold must be positive, got $hotThreshold")
    val hot = left.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__freq"))
      .filter(col("__freq") >= hotThreshold)
      .select(keys.map(col): _*)
      .withColumn("__hot", lit(1))
    // salt from the WHOLE left row (not the key — the point is to spread
    // rows of one hot key across buckets)
    val l = left.join(broadcast(hot), keys, "left")
      .withColumn("__salt",
        when(col("__hot") === 1,
          pmod(xxhash64(left.columns.map(col): _*), lit(saltBuckets)).cast("int"))
          .otherwise(lit(0)))
      .drop("__hot")
    val r = right.join(broadcast(hot), keys, "left")
      .withColumn("__salt", explode(
        when(col("__hot") === 1, sequence(lit(0), lit(saltBuckets - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    (l, r)
  }

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBuckets: Int, hotThreshold: Long = 100000L): DataFrame = {
    val (l, r) = saltedSides(left, right, keys, saltBuckets, hotThreshold)
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
