package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  // 20k high-cardinality ids scattered across 16 files by a hash — the
  // layout where min/max boxes are USELESS (every file spans the domain)
  private def scattered = spark.range(20000).select(
    (col("id") * 2654435761L % 1000003L).as("doc_id"),
    concat(lit("u"), col("id") % 4096).as("uid"),
    col("id").as("payload"))

  test("bloom skip prunes a long point lookup to few files; readPoints ≡ plain filter") {
    val dir = java.nio.file.Files.createTempDirectory("bloomskip").toString
    try {
      val df = scattered
      df.repartition(16, col("payload")) // hash-scatter: min/max can't prune
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#doc_id", "true")
        .parquet(s"$dir/t")
      val probe = df.filter(col("payload") === 12345L)
        .select("doc_id").as[Long].head()
      // min/max pruning keeps everything on this layout — the bloom is
      // the only thing that can skip
      val (boxKept, _) = ZOrderStore.prunedFiles(spark, s"$dir/t",
        Map("doc_id" -> (probe, probe)))
      assert(boxKept.size == 16, s"hash layout must defeat min/max: ${boxKept.size}")
      val (kept, total) = BloomSkip.prunedFiles(spark, s"$dir/t", "doc_id", Seq(probe))
      assert(total == 16 && kept.size <= 3,
        s"bloom must prune a point probe: kept ${kept.size} of $total")
      val got = BloomSkip.readPoints(spark, s"$dir/t", "doc_id", Seq(probe))
        .select("payload").as[Long].collect().toSet
      val want = df.filter(col("doc_id") === probe)
        .select("payload").as[Long].collect().toSet
      assert(got == want && got.nonEmpty)
      // absent value: every file's bloom rejects it (no false negative
      // risk — absent truly means absent), result is empty but well-formed
      val absent = -99999999L
      val (keptA, _) = BloomSkip.prunedFiles(spark, s"$dir/t", "doc_id", Seq(absent))
      assert(keptA.isEmpty)
      assert(BloomSkip.readPoints(spark, s"$dir/t", "doc_id", Seq(absent)).isEmpty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("dictionary stands in for the bloom on dict-encoded chunks; plain chunks keep their file") {
    val dir = java.nio.file.Files.createTempDirectory("bloomskip2").toString
    try {
      // parquet deliberately writes NO bloom for fully dictionary-encoded
      // chunks (4096 short strings dict-encode) — the dictionary is the
      // exact membership list and the prober must use it
      scattered.repartition(8, col("payload"))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#uid", "true")
        .parquet(s"$dir/s")
      val (kept, total) = BloomSkip.prunedFiles(spark, s"$dir/s", "uid", Seq("u77"))
      assert(total == 8 && kept.size < 8, s"kept ${kept.size} of $total")
      val got = BloomSkip.readPoints(spark, s"$dir/s", "uid", Seq("u77")).count()
      assert(got == scattered.filter(col("uid") === "u77").count())
      // a multi-value probe keeps the union of candidate files
      val (keptM, _) = BloomSkip.prunedFiles(spark, s"$dir/s", "uid", Seq("u77", "u1234"))
      assert(keptM.toSet.size >= kept.size)
      // high-entropy strings overflow the dictionary (plain fallback) and
      // no bloom is requested → nothing usable, every file kept
      spark.range(20000).select(concat(lit("v"), sha2(col("id").cast("string"), 256),
          sha2((col("id") + 1).cast("string"), 256)).as("big"), col("id").as("payload"))
        .repartition(8, col("payload"))
        .write.mode("overwrite").parquet(s"$dir/nb")
      val probe = spark.read.parquet(s"$dir/nb").select("big").head().getString(0)
      val (keptNb, totalNb) = BloomSkip.prunedFiles(spark, s"$dir/nb", "big", Seq(probe))
      assert(keptNb.size == totalNb, s"kept ${keptNb.size} of $totalNb")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("ZOrderStore.writeN(bloomCols) pairs box pruning with point skipping on one layout") {
    val dir = java.nio.file.Files.createTempDirectory("bloomskip3").toString
    try {
      // z-ordered on (x, y) for boxes, bloom on the unrelated id for points
      val cube = spark.range(16384).select(
        (col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"),
        (col("id") * 2654435761L % 1000003L).as("doc_id"))
      ZOrderStore.writeN(cube, Seq("x", "y"), s"$dir/z", numFiles = 16,
        bloomCols = Seq("doc_id"))
      val (boxKept, boxTotal) = ZOrderStore.prunedFiles(spark, s"$dir/z",
        Map("x" -> (0L, 15L), "y" -> (0L, 15L)))
      assert(boxKept.size < boxTotal, "z-order box pruning must still work")
      val probe = cube.filter(col("id") === 7777L).select("doc_id").as[Long].head()
      val (ptKept, ptTotal) = BloomSkip.prunedFiles(spark, s"$dir/z", "doc_id", Seq(probe))
      assert(ptTotal == 16 && ptKept.size <= 3, s"kept ${ptKept.size} of $ptTotal")
      assert(BloomSkip.readPoints(spark, s"$dir/z", "doc_id", Seq(probe)).count() ==
        cube.filter(col("doc_id") === probe).count())
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
