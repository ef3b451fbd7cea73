package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetaProbeSpec extends SparkSpec {
  import spark.implicits._
  test("probe: _metadata.file_path resolves through an alias Project") {
    val dir = java.nio.file.Files.createTempDirectory("graft-metaprobe").toString
    Seq((1L, "a")).toDF("x", "v").write.mode("overwrite").parquet(dir + "/d")
    val df = spark.read.parquet(dir + "/d")
      .select(col("x").as("y"), col("v"))
      .filter(col("y") > 0)
    val fp = df.select(col("_metadata.file_path")).as[String].head()
    assert(fp.contains("graft-metaprobe"))
  }
}
