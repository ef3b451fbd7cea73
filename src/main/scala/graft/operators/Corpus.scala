package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot maintenance — the operators a RECURRING training-data
  * build needs between crawls: what changed since the last snapshot, so
  * downstream stages (dedup indices, tokenizer stats, mixtures) update
  * incrementally instead of rebuilding from zero.
  */
object Corpus {

  /** CCNet-style boilerplate removal — the one common curation stage the
    * dedup family doesn't cover: lines repeated across ≥ `minDocFreq`
    * DISTINCT documents (cookie banners, nav menus, license footers) are
    * dropped from every document; everything else keeps its order. Line
    * identity is the trimmed line; whitespace-only lines are exempt
    * (never counted, never removed — they are structure, not content).
    * Returns one row per input doc: (id, clean_text, n_removed).
    *
    * Plan at 100 TB: the df table is a partial-aggregated
    * count-distinct over (line, doc) — the shuffle carries one row per
    * DISTINCT line per doc, not per occurrence; the boilerplate table it
    * filters to is answer-shaped (only lines crossing the threshold) and
    * AQE broadcasts it when small. One exchange of the line table for
    * the flag join, one id exchange for reassembly; text lines move
    * twice, never more. No driver-side state.
    */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                        minDocFreq: Long): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    // coalesce: split(NULL) is NULL and posexplode would DROP the row,
    // silently violating the one-row-per-input-doc contract — a NULL
    // text document flows through as an empty document instead.
    val lines = docs.select(col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")), "\n", -1))
          .as(Seq("__pos", "__line")))
      .withColumn("__norm", trim(col("__line")))
    val boiler = lines.filter(col("__norm") =!= "")
      .groupBy(col("__norm")).agg(count_distinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select(col("__norm"), lit(true).as("__boiler"))
    lines.join(boiler, Seq("__norm"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            filter(
              array_sort(collect_list(struct(col("__pos"), col("__line"),
                coalesce(col("__boiler"), lit(false)).as("__b")))),
              x => !x.getField("__b")),
            x => x.getField("__line")),
          "\n").as("clean_text"),
        sum(when(col("__boiler"), 1L).otherwise(0L)).as("n_removed"))
  }

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
