package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-structured "YAML-ish" multi-object payload parsing — the
  * reference's `parse_yaml_val` (service/app/main.py:51-58): a messy
  * delimited string like `"[x: 1, y: 2, cls: car, x: 3, y: 4, cls:
  * person]"` holds a LIST of flat objects, with a new object starting at
  * every repeat of the sniffed first key. The reference marks object
  * starts (`", x:" → ", NEWOBJ x:"`), strips brackets, splits, and
  * yaml-parses each chunk per row in pandas.
  *
  * Here the whole parse is native codegen'd string expressions —
  * regexp_replace to mark starts, split, `str_to_map` per chunk — one
  * map-side projection, no UDF, no driver loop. Column sniffing
  * (main.py:101-113 scans for the first ":"-bearing value) is a
  * one-row driver lookup, exactly like the reference's `example` scan.
  */
object SemiStructured {

  /** `array<map<string,string>>` of the objects in a bracketed
    * multi-object string (null input → null). */
  def parseObjectList(raw: Column, objStartKey: String): Column = {
    val quoted = java.util.regex.Pattern.quote(objStartKey)
    // mark each subsequent object start with a \\u0001 sentinel, then split
    val stripped = regexp_replace(raw, "^\\[|\\]$", "")
    val marked = regexp_replace(stripped, s", (?=$quoted:)", "\u0001")
    transform(split(marked, "\u0001"), c => str_to_map(c, lit(", "), lit(": ")))
  }

  /** Typed view of [[parseObjectList]]: `array<struct>` with the given
    * (field, castType) list, e.g. Seq("x" -> "double", "cls" -> "string").
    */
  def parseObjectListTyped(raw: Column, objStartKey: String,
                           fields: Seq[(String, String)]): Column =
    transform(parseObjectList(raw, objStartKey), m =>
      struct(fields.map { case (f, t) =>
        element_at(m, f).cast(t).as(f)
      }: _*))

  /** Sniff the object-start key of a semi-structured column: first key of
    * the first value containing ":" (main.py:101-113). One-row driver
    * lookup — the per-row parse above stays fully distributed.
    */
  def sniffObjectStart(df: DataFrame, colName: String): Option[String] =
    df.select(col(colName))
      .filter(col(colName).contains(":"))
      .limit(1).collect().headOption
      .map(_.getString(0).split(":")(0).replace("[", "").trim)
}
