package graft.sources.v2

import graft.SparkSpec
import graft.sources.SnapshotStore
import org.apache.spark.sql.functions._

class SnapshotDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = classOf[SnapshotDataSource].getName

  private def tempTable(tag: String): String =
    "file:" + java.nio.file.Files
      .createTempDirectory(s"graft-snapdsv2-$tag").toString + "/t"

  test("format read: latest snapshot + versionAsOf time travel") {
    val t = tempTable("tt")
    SnapshotStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    SnapshotStore.overwrite(Seq((9L, "z")).toDF("id", "v"), t)
    assert(spark.read.format(fmt).load(t)
      .as[(Long, String)].collect().toSet === Set((9L, "z")))
    assert(spark.read.format(fmt).option("versionAsOf", 1).load(t)
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
  }

  test("the delegated scan keeps parquet pushdown: filters + pruned read schema") {
    val t = tempTable("push")
    SnapshotStore.append(
      (1L to 100L).map(i => (i, s"s$i", i * 2.0)).toDF("id", "s", "x"), t)
    val df = spark.read.format(fmt).load(t)
      .filter(col("id") === 7L).select("s")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(id,7)"),
      s"filter must reach the parquet scan:\n$plan")
    assert(!plan.contains("x:double"),
      s"unprojected column must be pruned from ReadSchema:\n$plan")
    assert(df.as[String].collect().toSeq === Seq("s7"))
  }

  test("read-only: the write path cannot bypass the commit protocol") {
    val t = tempTable("ro")
    SnapshotStore.append(Seq((1L, "a")).toDF("id", "v"), t)
    intercept[Exception] {
      Seq((2L, "b")).toDF("id", "v").write.format(fmt).mode("append").save(t)
    }
    assert(spark.read.format(fmt).load(t).count() === 1L,
      "a refused write must leave the snapshot untouched")
  }

  test("SQL text: a version-pinned temp view serves time travel to pure SQL") {
    val t = tempTable("sql")
    SnapshotStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    SnapshotStore.overwrite(Seq((30L, "c")).toDF("id", "v"), t)
    spark.read.format(fmt).option("versionAsOf", 1).load(t)
      .createOrReplaceTempView("snap_v1")
    spark.read.format(fmt).load(t).createOrReplaceTempView("snap_now")
    assert(spark.sql(
      "SELECT (SELECT sum(id) FROM snap_v1) AS old, (SELECT sum(id) FROM snap_now) AS now")
      .as[(Long, Long)].head === ((3L, 30L)))
  }
}
