package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsManifestSpec extends SparkSpec {
  import spark.implicits._

  private def grid = spark.range(10000).select(
    (col("id") % 100).as("x"),
    (col("id") / 100).cast("long").as("y"),
    col("id").as("payload"))

  test("fresh-path manifest pruning ≡ live footer pruning") {
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    try {
      ZOrderStore.write(grid, "x", "y", s"$dir/z", numFiles = 16)
      StatsManifest.write(spark, s"$dir/z", Seq("x", "y"))
      assert(StatsManifest.isFresh(spark, s"$dir/z"))
      val box = Map("x" -> (10L, 19L), "y" -> (10L, 19L))
      val (mKept, mTotal) = StatsManifest.prunedFiles(spark, s"$dir/z", box)
      val (fKept, fTotal) = ZOrderStore.prunedFiles(spark, s"$dir/z", box)
      assert(mTotal == fTotal && mKept == fKept, s"manifest $mKept vs footers $fKept")
      assert(mKept.size < mTotal, "the box must actually prune")
      // single-dimension boxes agree too
      Seq(Map("x" -> (50L, 59L)), Map("y" -> (0L, 9L))).foreach { b =>
        assert(StatsManifest.prunedFiles(spark, s"$dir/z", b) ==
          ZOrderStore.prunedFiles(spark, s"$dir/z", b), b.toString)
      }
      // the manifest is invisible to Spark's own reader and to the
      // footer-stats listing (underscore-prefixed directory)
      assert(spark.read.parquet(s"$dir/z").count() == 10000L)
      assert(ZOrderStore.fileStats(spark, s"$dir/z", Seq("x")).size == mTotal)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("drift flips isFresh and pruning falls back to live footers (never a wrong prune)") {
    val dir = java.nio.file.Files.createTempDirectory("manifest2").toString
    try {
      ZOrderStore.write(grid, "x", "y", s"$dir/z", numFiles = 8)
      StatsManifest.write(spark, s"$dir/z", Seq("x", "y"))
      assert(StatsManifest.isFresh(spark, s"$dir/z"))
      // out-of-band ingest: a new file the manifest has never seen,
      // holding exactly the box the stale manifest would wrongly skip
      spark.range(1).select(lit(999L).as("x"), lit(999L).as("y"), lit(-1L).as("payload"))
        .coalesce(1).write.mode("append").parquet(s"$dir/z")
      assert(!StatsManifest.isFresh(spark, s"$dir/z"))
      val box = Map("x" -> (999L, 999L), "y" -> (999L, 999L))
      val (kept, _) = StatsManifest.prunedFiles(spark, s"$dir/z", box)
      assert(kept.nonEmpty, "fallback must see the out-of-band file")
      // re-harvest restores the fast path and the new file's stats
      StatsManifest.write(spark, s"$dir/z", Seq("x", "y"))
      assert(StatsManifest.isFresh(spark, s"$dir/z"))
      val (kept2, total2) = StatsManifest.prunedFiles(spark, s"$dir/z", box)
      assert(kept2 == kept && total2 == 9)
      // a box column the manifest does not cover also falls back
      val (keptP, totalP) = StatsManifest.prunedFiles(spark, s"$dir/z",
        Map("payload" -> (0L, 10L)))
      assert(totalP == 9 && keptP.nonEmpty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
