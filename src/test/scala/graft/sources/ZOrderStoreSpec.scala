package graft.sources

import graft.SparkSpec
import graft.functions.ZOrder
import org.apache.spark.sql.functions._

class ZOrderStoreSpec extends SparkSpec {
  import spark.implicits._

  private def grid = {
    // 100×100 integer grid — every (x, y) cell once
    spark.range(10000).select(
      (col("id") % 100).as("x"),
      (col("id") / 100).cast("long").as("y"),
      col("id").as("payload"))
  }

  test("zorder64 interleaves bits (known answers) and matches its SQL twin") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L),
      (0x7FFFFFFFL, 0L), (123456L, 654321L)).toDF("a", "b")
    val out = rows.select(
      ZOrder.zorder64(col("a"), col("b")).as("z"),
      expr(ZOrder.zorderSql("a", "b")).as("zsql"))
      .collect()
    def morton(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 31) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val expect = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L),
      (0x7FFFFFFFL, 0L), (123456L, 654321L)).map { case (a, b) => morton(a, b) }
    assert(out.map(_.getLong(0)).toSeq === expect)
    assert(out.map(_.getLong(1)).toSeq === expect, "Spark zorder64 != SQL twin")
    assert(morton(1L, 0L) == 1L && morton(0L, 1L) == 2L && morton(1L, 1L) == 3L)
  }

  test("zorder3_64 interleaves three dimensions (known answers) and matches its SQL twin") {
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (1L, 1L, 1L), (5L, 3L, 7L), (0x1FFFFFL, 0L, 0x1FFFFFL), (12345L, 54321L, 33333L))
    val out = cases.toDF("a", "b", "c").select(
      ZOrder.zorder3_64(col("a"), col("b"), col("c")).as("z"),
      expr(ZOrder.zorder3Sql("a", "b", "c")).as("zsql"))
      .collect()
    def morton3(a: Long, b: Long, c: Long): Long = {
      var z = 0L
      for (i <- 0 until 21) {
        z |= ((a >> i) & 1L) << (3 * i)
        z |= ((b >> i) & 1L) << (3 * i + 1)
        z |= ((c >> i) & 1L) << (3 * i + 2)
      }
      z
    }
    val expect = cases.map { case (a, b, c) => morton3(a, b, c) }
    assert(out.map(_.getLong(0)).toSeq === expect)
    assert(out.map(_.getLong(1)).toSeq === expect, "Spark zorder3_64 != SQL twin")
    assert(morton3(1L, 0L, 0L) == 1L && morton3(0L, 1L, 0L) == 2L && morton3(0L, 0L, 1L) == 4L)
    assert(expect.forall(_ >= 0L), "3-D codes must stay non-negative")
  }

  test("3-D layout prunes a 3-predicate box on every axis; readBox ≡ plain filter") {
    // 32×32×32 cube, every cell once
    val cube = spark.range(32768).select(
      (col("id") % 32).as("x"),
      ((col("id") / 32) % 32).cast("long").as("y"),
      (col("id") / 1024).cast("long").as("z"),
      col("id").as("payload"))
    val dir = java.nio.file.Files.createTempDirectory("zorder3").toString
    try {
      ZOrderStore.writeN(cube, Seq("x", "y", "z"), s"$dir/c", numFiles = 16)
      val box = Map("x" -> (8L, 15L), "y" -> (8L, 15L), "z" -> (8L, 15L))
      val (kept, total) = ZOrderStore.prunedFiles(spark, s"$dir/c", box)
      // an octant-of-an-octant box (1/64 of the cube) touches few 3-D
      // tiles — never a constant fraction of all files. ≤6 not ≤4: the
      // range partitioner SAMPLES, so tile edges (and one or two extra
      // grazed files) shift with the ambient partitioning of the input
      assert(total == 16 && kept.size <= 6,
        s"3-D layout kept ${kept.size} of $total files")
      val got = ZOrderStore.readBox(spark, s"$dir/c", box)
        .select("payload").as[Long].collect().toSet
      val want = cube.filter(col("x").between(8, 15) && col("y").between(8, 15) &&
        col("z").between(8, 15)).select("payload").as[Long].collect().toSet
      assert(got == want)
      // compactN keeps the 3-D clustering sharp after fragmentation
      cube.limit(0).write.mode("append").parquet(s"$dir/c") // harmless extra file
      ZOrderStore.compactN(spark, s"$dir/c", Seq("x", "y", "z"),
        targetFileBytes = 64L * 1024)
      val (kept2, _) = ZOrderStore.prunedFiles(spark, s"$dir/c", box)
      assert(kept2.nonEmpty)
      val got2 = ZOrderStore.readBox(spark, s"$dir/c", box)
        .select("payload").as[Long].collect().toSet
      assert(got2 == want)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("z-order layout prunes a box query to few files on BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    try {
      ZOrderStore.write(grid, "x", "y", s"$dir/z", numFiles = 16)
      // comparison layout: clustered by x only — perfect for x-ranges,
      // blind for y-ranges
      grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
        .write.mode("overwrite").parquet(s"$dir/linear")

      val box = Map("x" -> (10L, 19L), "y" -> (10L, 19L))
      val (zKept, zTotal) = ZOrderStore.prunedFiles(spark, s"$dir/z", box)
      assert(zTotal == 16)
      // a 10×10 box covers 1% of the grid: the z-curve tiles it with a
      // handful of files, never a constant fraction of ALL files
      assert(zKept.size <= 4, s"z layout kept ${zKept.size} of $zTotal files")

      // the x-clustered layout cannot prune on y at all
      val (linKeptY, _) = ZOrderStore.prunedFiles(spark, s"$dir/linear",
        Map("y" -> (10L, 19L)))
      assert(linKeptY.size == 16, "x-clustered layout unexpectedly pruned on y")
      // ... while the z layout prunes single-dimension ranges on EITHER axis
      val (zKeptX, _) = ZOrderStore.prunedFiles(spark, s"$dir/z", Map("x" -> (10L, 19L)))
      val (zKeptY, _) = ZOrderStore.prunedFiles(spark, s"$dir/z", Map("y" -> (10L, 19L)))
      assert(zKeptX.size < 16 && zKeptY.size < 16,
        s"z layout should prune both axes: x=${zKeptX.size} y=${zKeptY.size}")

      // pruned read ≡ full-scan filter, row for row
      val pruned = ZOrderStore.readBox(spark, s"$dir/z", box)
      val full = spark.read.parquet(s"$dir/z")
        .filter(col("x").between(10, 19) && col("y").between(10, 19))
      assert(pruned.exceptAll(full).union(full.exceptAll(pruned)).isEmpty)
      assert(pruned.count() == 100)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("pruneReport: row-group boxes sharpen inside big files beyond the per-file merge") {
    val dir = java.nio.file.Files.createTempDirectory("zorder_rg").toString
    try {
      // TWO big z-ordered files with a tiny parquet block size → many row
      // groups per file, each covering a short z-run (a small x/y box)
      grid.withColumn("__z", ZOrder.zorder64(col("x"), col("y")))
        .repartitionByRange(2, col("__z")).sortWithinPartitions("__z").drop("__z")
        .write.option("parquet.block.size", 16 * 1024)
        .option("parquet.page.size", 4 * 1024)
        .mode("overwrite").parquet(s"$dir/z")
      val box = Map("x" -> (10L, 19L), "y" -> (10L, 19L))
      val report = ZOrderStore.pruneReport(spark, s"$dir/z", box)
      assert(report.totalFiles == 2 && report.totalRows == 10000L)
      assert(report.totalRowGroups > 4,
        s"expected several row groups per file, got ${report.totalRowGroups}")
      // file-level accounting must agree with what readBox actually scans
      val (kept, _) = ZOrderStore.prunedFiles(spark, s"$dir/z", box)
      assert(report.keptFiles == kept.size)
      // the sharpening: with only 2 files the merged boxes keep ~everything,
      // but row-group boxes drop most blocks — and never the 100 true rows
      assert(report.keptRowGroups < report.totalRowGroups,
        s"row groups should prune inside files: ${report.keptRowGroups}/${report.totalRowGroups}")
      assert(report.keptRows >= 100L && report.keptRows < report.totalRows,
        s"keptRows=${report.keptRows} of ${report.totalRows}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("compact bin-packs a fragmented layout and keeps z-pruning sharp") {
    val dir = java.nio.file.Files.createTempDirectory("zorder_c").toString
    try {
      ZOrderStore.write(grid, "x", "y", s"$dir/z", numFiles = 64)
      val fullBefore = spark.read.parquet(s"$dir/z").collect().toSet
      val totalBytes = new java.io.File(s"$dir/z").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum
      val (before, after) = ZOrderStore.compact(spark, s"$dir/z", "x", "y",
        targetFileBytes = totalBytes / 4)
      assert(before == 64 && after >= 4 && after <= 6, s"$before -> $after")
      val files = new java.io.File(s"$dir/z").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == after)
      // same rows, and the compacted tiles still prune a 1% box
      assert(spark.read.parquet(s"$dir/z").collect().toSet == fullBefore)
      val (kept, total) = ZOrderStore.prunedFiles(spark, s"$dir/z",
        Map("x" -> (10L, 19L), "y" -> (10L, 19L)))
      assert(total == after && kept.size < after,
        s"compacted layout should still prune: ${kept.size} of $after")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("prunedFiles keeps files without stats for a requested column") {
    val dir = java.nio.file.Files.createTempDirectory("zorder2").toString
    try {
      grid.write.mode("overwrite").parquet(s"$dir/t")
      // "missing" column → no stats → every file kept (never skip blind)
      val (kept, total) = ZOrderStore.prunedFiles(spark, s"$dir/t",
        Map("nope" -> (0L, 1L)))
      assert(kept.size == total)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
