package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VARIANT payload columns in snapshot tables (Spark 4's VariantType —
  * the typed form of the reference's JSON payload strings): the binary
  * encoding rides append / recorded schema / compaction unchanged, and
  * the MANUAL-SHRED pattern (hot JSON paths extracted to stats-harvested
  * sibling columns at write — this Spark build's parquet writer has no
  * automatic shredding) gives the payload family the log-stats file
  * pruning the raw string form never had.
  */
class SnapshotVariantSpec extends SparkSpec {

  private def freshTable(tag: String): String =
    "file:" + java.nio.file.Files
      .createTempDirectory(s"graft-var-$tag").toString + "/t"

  private def payload(i: Long): String = s"""{"k": ${i % 100}, "tag": "t${i % 3}"}"""

  test("variant column roundtrips through append / recorded schema / compact") {
    val t = freshTable("rt")
    val df = spark.range(1, 101).select(col("id"),
      parse_json(concat(lit(""),
        format_string("""{"k": %d, "tag": "t%d"}""", col("id") % 100, col("id") % 3)))
        .as("v"))
    SnapshotStore.append(df, t, statsCols = Seq("id"))
    // schema recorded with the VARIANT type and read back through it
    val schema = SnapshotStore.tableSchema(spark, t).get
    assert(schema("v").dataType ===
      org.apache.spark.sql.types.VariantType)
    val back = SnapshotStore.snapshot(spark, t)
      .select(col("id"), variant_get(col("v"), "$.k", "long").as("k"),
        variant_get(col("v"), "$.tag", "string").as("tag"))
    assert(back.filter(col("k") =!= col("id") % 100).count() === 0L)
    assert(back.filter(col("tag") =!= concat(lit("t"), (col("id") % 3))).count() === 0L)
    // compaction rewrites the binary column losslessly
    SnapshotStore.append(df.withColumn("id", col("id") + 1000), t)
    SnapshotStore.compact(spark, t, targetFiles = 1, statsCols = Seq("id"))
    assert(SnapshotStore.snapshot(spark, t)
      .filter(variant_get(col("v"), "$.k", "long") =!= col("id") % 100)
      .count() === 0L)
    assert(SnapshotStore.snapshot(spark, t).count() === 200L)
  }

  test("manual shred: hot-path sibling column gives log-stats pruning the string never had") {
    val t = freshTable("shred")
    // 4 appends with DISJOINT shredded-k ranges -> disjoint per-file boxes
    (0 until 4).foreach { b =>
      val df = spark.range(b * 25L, b * 25L + 25L).select(col("id"),
        parse_json(format_string("""{"k": %d}""", col("id"))).as("v"),
        col("id").as("props_k"))
      SnapshotStore.append(df.coalesce(1), t, statsCols = Seq("props_k"))
    }
    val (kept, total) = SnapshotStore.prunedLiveFiles(spark, t,
      box = Map("props_k" -> (30L, 40L)))
    assert(total === 4 && kept.size === 1,
      s"a shredded-path box must prune from the LOG ($kept of $total)")
    val rows = SnapshotStore.readBox(spark, t, Map("props_k" -> (30L, 40L)))
      .select(variant_get(col("v"), "$.k", "long").as("k"))
    assert(rows.count() === 11L)
    assert(rows.agg(min(col("k")), max(col("k"))).head.toSeq === Seq(30L, 40L))
  }
}
