package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("normalize lowercases, collapses whitespace, trims") {
    val out = Seq("  The   QUICK\t fox ").toDF("t")
      .select(TextFunctions.normalize(col("t"))).as[String].collect().head
    assert(out == "the quick fox")
  }

  test("bpeishCount segments letter runs, digits, and marks") {
    val out = Seq("ab12 c!").toDF("t")
      .select(TextFunctions.bpeishCount(col("t"))).as[Int].collect().head
    // "ab","1","2","c","!"
    assert(out == 5)
  }

  test("langId picks the dominant stopword profile") {
    val df = Seq(
      ("the cat and the dog is in a house", "en"),
      ("der hund und die katze ist nicht da", "de"),
      ("el perro y la casa es un lugar", "es")
    ).toDF("text", "expected")
    df.select(TextFunctions.langId(col("text")).as("got"), col("expected"))
      .collect().foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("fingerprint is whitespace/case-invariant; hash60 is stable") {
    val fps = Seq("Hello  World", "hello world").toDF("t")
      .select(TextFunctions.fingerprint(col("t"))).as[String].collect()
    assert(fps(0) == fps(1))
    val h = Seq("hello").toDF("t")
      .select(TextFunctions.hash60(col("t"))).as[Long].collect().head
    assert(h == 419982666956583591L) // = ('0x'||substr(md5('hello'),1,15))::BIGINT in DuckDB
  }
}
