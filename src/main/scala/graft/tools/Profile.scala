package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Dev profiler: stage-level timings for the dedup hotspots. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-profile")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, sfDir).cache()
    println(s"[profile] docs=${docs.count()}")

    val sh = Dedup.explodedShingles(docs, "doc_id", "text", 3)
    time("shingle explode count")(sh.count())
    val shC = sh.cache(); shC.count()
    time("naive self-join count") {
      shC.as("a").join(shC.as("b"), "sh")
        .filter(col("a.doc_id") < col("b.doc_id")).count()
    }
    time("naive inter groupBy") {
      shC.as("a").join(shC.as("b"), "sh")
        .filter(col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).count().count()
    }
    time("full ngramJaccardPairs") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3).count()
    }
    time("minHashSignatures")(
      Dedup.minHashSignatures(docs, "doc_id", "text", 8, 3).count())
    time("full minHashPairs")(
      Dedup.minHashPairs(docs, "doc_id", "text", 8, 3, 2).count())
    time("simHash")(
      Dedup.simHash(docs, "doc_id", "text").count())
    time("full simHashPairs")(
      Dedup.simHashPairs(docs, "doc_id", "text", 8, 24).count())
    spark.stop()
  }
}
