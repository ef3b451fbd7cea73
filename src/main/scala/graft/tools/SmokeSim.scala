package graft.tools

import org.apache.spark.sql.SparkSession

/** Simulates the harness smoke test: runs `SparkEntry.entry` on a BARE
  * session — no graft configs, no extensions — to prove the flagship
  * path has no hidden dependency on session setup.
  */
object SmokeSim {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.SparkEntry.entry(spark).collect()
    require(rows.nonEmpty, "entry() returned no rows")
    println(s"[smokesim] entry rows=${rows.length} first=${rows.head}")
    spark.stop()
  }
}
