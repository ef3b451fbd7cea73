package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemiStructured: the reference's parse_yaml_val list-of-objects parse
  * (main.py:51-58) — chunking on the sniffed object-start key, map and
  * typed-struct views, null handling.
  */
class SemiStructuredSpec extends SparkSpec {
  import spark.implicits._

  private val raw = "[x: 1, y: 2.5, cls: car, x: 3, y: 4, cls: person]"

  test("parseObjectList splits on the object-start key and maps pairs") {
    val df = Seq((1L, raw), (2L, "x: 9, y: 9, cls: bike"), // unbracketed single
      (3L, null.asInstanceOf[String])).toDF("id", "raw")
    val rows = df.select(col("id"),
      SemiStructured.parseObjectList(col("raw"), "x").as("objs"))
      .orderBy("id").collect()
    val objs1 = rows(0).getAs[scala.collection.Seq[Map[String, String]]]("objs")
    assert(objs1 == Seq(
      Map("x" -> "1", "y" -> "2.5", "cls" -> "car"),
      Map("x" -> "3", "y" -> "4", "cls" -> "person")))
    assert(rows(1).getAs[scala.collection.Seq[Map[String, String]]]("objs") ==
      Seq(Map("x" -> "9", "y" -> "9", "cls" -> "bike")))
    assert(rows(2).isNullAt(1))
  }

  test("typed view casts fields; missing keys become null") {
    val df = Seq((1L, "[x: 1, cls: car, x: 3, y: 4, cls: person]")).toDF("id", "raw")
    val objs = df.select(SemiStructured.parseObjectListTyped(col("raw"), "x",
      Seq("x" -> "double", "y" -> "double", "cls" -> "string")).as("o"))
      .selectExpr("inline(o)").collect()
    assert(objs(0).getDouble(0) == 1.0 && objs(0).isNullAt(1))
    assert(objs(1).getDouble(1) == 4.0 && objs(1).getString(2) == "person")
  }

  test("sniffObjectStart finds the first key like the reference") {
    val df = Seq("plain", "[w: 1, h: 2]").toDF("c")
    assert(SemiStructured.sniffObjectStart(df, "c").contains("w"))
    assert(SemiStructured.sniffObjectStart(df.filter(col("c") === "plain"), "c").isEmpty)
  }
}
