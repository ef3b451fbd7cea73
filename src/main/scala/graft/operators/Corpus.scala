package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot maintenance — the operators a RECURRING training-data
  * build needs between crawls: what changed since the last snapshot, so
  * downstream stages (dedup indices, tokenizer stats, mixtures) update
  * incrementally instead of rebuilding from zero.
  */
object Corpus {

  /** Content-hash diff of two corpus snapshots: one row per doc present
    * in either side with status `added` (new only), `removed` (old
    * only), or `changed` (both, different content) — `unchanged` rows
    * are dropped before the result leaves the aggregate, so the output
    * is proportional to the CHURN, not the corpus.
    *
    * Shape at 100 TB: each side reduces to (id, 128-bit content hash)
    * map-side before the full-outer join — the shuffle carries ~24
    * bytes/doc regardless of document size, and on bucketed snapshots
    * (both sides written bucket-by-id, e.g. via `TopicStore`) the join
    * plans with zero exchange. The raw text never moves.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol), md5(col(textCol)).as("__oh"))
    val n = newSnap.select(col(idCol), md5(col(textCol)).as("__nh"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__oh").isNull, lit("added"))
          .when(col("__nh").isNull, lit("removed"))
          .when(col("__oh") =!= col("__nh"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col(idCol), col("status"))
  }
}
