package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tools.PlanLint

class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  test("flags a partition-less window as an error") {
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")
      .withColumn("rn", row_number().over(Window.orderBy($"v")))
    df.collect()
    val fs = PlanLint.lint(df)
    assert(fs.exists(f => f.severity == "error" && f.kind == "single-partition-window"), fs)
  }

  test("a partition-less window over a plan-constant LIMIT is bounded, not an error") {
    // the k-row seed-rank shape (kmeansAssign's rank seeding): the one
    // task ranks k rows, not the corpus
    val df = spark.range(1000L).select($"id", ($"id" % 7).as("v"))
      .orderBy($"id").limit(4)
      .withColumn("rn", row_number().over(Window.orderBy($"id")))
    df.collect()
    val fs = PlanLint.lint(df)
    assert(!fs.exists(_.kind == "single-partition-window"), fs)
  }

  test("per-PARTITION bounds do not exempt the partition-less window") {
    // a bare LocalLimit (no global stage) caps rows per partition, not
    // globally: O(partitions·k) rows can still funnel into the one
    // window task, so the exemption must demand the GLOBAL operator.
    // Build the shape directly — RDD-side local limit, no GlobalLimit.
    val local = spark.range(1000L).repartition(8)
      .mapPartitions(_.take(4)).toDF("id")
      .withColumn("rn", row_number().over(Window.orderBy($"id")))
    local.collect()
    // mapPartitions is opaque to limitBounded — the point is the flag
    assert(PlanLint.lint(local).exists(_.kind == "single-partition-window"))
    // a PARTIAL no-grouping aggregate emits one row per partition; only
    // Final/Complete-mode aggregates bound rows globally. A grouped agg
    // re-aggregated to no-grouping keeps Partial stages in the chain —
    // the window child here is the global Final agg, which IS exempt;
    // the inverse (window directly over a partial) can't be built from
    // the DataFrame API, so pin the positive direction plus the flag
    // above as the negative witness.
    val overAgg = spark.range(1000L).agg(sum($"id").as("s"))
      .withColumn("rn", row_number().over(Window.orderBy($"s")))
    overAgg.collect()
    assert(!PlanLint.lint(overAgg).exists(_.kind == "single-partition-window"))
  }

  test("flags cartesian joins and Scala UDFs") {
    val udfInc = udf((x: Long) => x + 1)
    val a = Seq(1L, 2L).toDF("x")
    val b = Seq(3L, 4L).toDF("y")
    val df = a.crossJoin(b).select(udfInc($"x").as("x1"), $"y")
    df.collect()
    val fs = PlanLint.lint(df)
    assert(fs.exists(f => f.severity == "error" && f.kind == "cartesian"), fs)
    assert(fs.exists(f => f.severity == "warn" && f.kind == "scala-udf"), fs)
  }

  test("flags a filter whose shape defeats parquet pushdown; clean pushdown passes") {
    val dir = java.nio.file.Files.createTempDirectory("lint").toString
    try {
      spark.range(100).select($"id", ($"id" * 2).as("v")).write.parquet(s"$dir/t")
      // cast around the column defeats the source filter
      val bad = spark.read.parquet(s"$dir/t")
        .filter($"id".cast("string") === "7")
      bad.collect()
      assert(PlanLint.lint(bad).exists(_.kind == "missed-pushdown"),
        PlanLint.report(bad))
      // the plain comparison pushes down → no warning
      val good = spark.read.parquet(s"$dir/t").filter($"id" === 7)
      good.collect()
      assert(!PlanLint.lint(good).exists(_.kind == "missed-pushdown"),
        PlanLint.report(good))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("source-planning audit: pooled graft scans pass; serial per-file planning warns; unaudited graft scans flag") {
    import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan}
    import org.apache.spark.sql.types.StructType
    // the REAL bag source (per-file planning I/O, pooled) lints clean
    val dir = java.nio.file.Files.createTempDirectory("lint-bag").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.bag"),
      BagCodec.pack(Seq(("t", 1L, Array[Byte](1))), "none"))
    val df = spark.read.format("graft.sources.v2.BagDataSource").load(dir)
    df.collect()
    val fs = PlanLint.lint(df)
    assert(!fs.exists(f => f.kind == "serial-source-planning" ||
      f.kind == "unaudited-source-planning"), fs)
    // a scan CERTIFYING serial per-file planning I/O is the 100k-bag
    // driver stall — warn
    class SerialScan extends Scan with graft.sources.v2.PlanningAudit {
      override def readSchema(): StructType = new StructType()
      override def planningDoesPerFileIO: Boolean = true
      override def planningParallel: Boolean = false
    }
    val warn = PlanLint.auditScan(new SerialScan)
    assert(warn.exists(f => f.severity == "warn" &&
      f.kind == "serial-source-planning"), warn)
    // a graft scan with NO audit gets the info nudge (new sources can't
    // regress silently); foreign scans are not judged
    class NoAuditScan extends Scan {
      override def readSchema(): StructType = new StructType()
    }
    val info = PlanLint.auditScan(new NoAuditScan)
    assert(info.exists(f => f.severity == "info" &&
      f.kind == "unaudited-source-planning"), info)
  }

  test("reports graft interpreted kernels as info, counts exchanges, clean plan is clean") {
    GraftExtensions.register(spark)
    // a real source: a LOCAL relation would be constant-folded wholesale
    // (ConvertToLocalRelation evaluates the kernel at plan time)
    val docs = spark.range(2).select($"id".as("doc_id"),
      concat_ws(" ", lit("a"), lit("b"), lit("c"), $"id".cast("string")).as("text"))
    val df = docs.select($"doc_id",
      call_function("minhash_slots_tokens",
        split($"text", " "), lit(3), lit(8)).as("sig"))
    df.collect()
    val fs = PlanLint.lint(df)
    assert(fs.exists(f => f.severity == "info" && f.kind == "codegen-fallback" &&
      f.detail.contains("minhash_slots_tokens")), fs)
    // map-side only: no exchange finding
    assert(!fs.exists(_.kind == "exchange"), fs)
    assert(!fs.exists(_.severity == "error"), fs)
    // an aggregate adds exactly one exchange finding (enough rows that
    // AQE doesn't plan the tiny shuffle away)
    val big = spark.range(100000).select(($"id" % 1000).as("doc_id"))
    val agg = big.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    agg.collect()
    val fs2 = PlanLint.lint(agg)
    assert(fs2.exists(f => f.kind == "exchange" && f.detail.startsWith("1 shuffle")), fs2)
  }
}
