package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Corpus.removeBoilerplate]]: CCNet line-df filtering — threshold
  * boundary, whitespace exemption, order preservation, all-removed and
  * untouched documents.
  */
class CorpusBoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Long): Map[Long, (String, Long)] =
    Corpus.removeBoilerplate(docs.toDF("id", "text"), "id", "text", k)
      .as[(Long, String, Long)].collect()
      .map { case (id, t, n) => id -> ((t, n)) }.toMap

  test("lines at df >= k are dropped everywhere; df = k-1 survives; order kept") {
    val docs = Seq(
      1L -> "BANNER\nalpha\nmid\nomega",
      2L -> "BANNER\nbeta\nmid",
      3L -> "BANNER\ngamma")
    val out = run(docs, k = 3) // BANNER df=3 removed; mid df=2 kept
    assert(out(1L) === (("alpha\nmid\nomega", 1L)))
    assert(out(2L) === (("beta\nmid", 1L)))
    assert(out(3L) === (("gamma", 1L)))
  }

  test("line identity is the TRIMMED line; whitespace-only lines are exempt") {
    val docs = Seq(
      1L -> "  footer \nkeep1\n\n ",
      2L -> "footer\nkeep2\n\n",
      3L -> "footer  \nkeep3")
    val out = run(docs, k = 3) // 'footer' matches across trim variants
    assert(out(1L) === (("keep1\n\n ", 1L)), "blank lines never removed")
    assert(out(2L) === (("keep2\n\n", 1L)), "trailing empty split slots survive")
    assert(out(3L) === (("keep3", 1L)))
  }

  test("a document of pure boilerplate comes back empty, not dropped") {
    val docs = Seq(1L -> "x\ny", 2L -> "x\ny", 3L -> "x\ny", 4L -> "unique")
    val out = run(docs, k = 3)
    assert(out(1L) === (("", 2L)))
    assert(out(4L) === (("unique", 0L)))
    assert(out.size === 4, "every input doc yields a row")
  }

  test("df counts DISTINCT documents — in-doc repetition cannot fake boilerplate") {
    val docs = Seq(1L -> "echo\necho\necho\nown", 2L -> "other")
    val out = run(docs, k = 3) // echo df=1 despite 3 occurrences
    assert(out(1L) === (("echo\necho\necho\nown", 0L)))
  }

  test("a NULL text document flows through as empty — never silently dropped") {
    val docs = Seq((1L, "a\nb"), (2L, null: String), (3L, "a\nb"), (4L, "a\nb"))
    val out = run(docs, k = 3)
    assert(out.size === 4, "one row per input doc, NULL text included")
    assert(out(2L) === (("", 0L)), "NULL text behaves as an empty document")
    assert(out(1L) === (("", 2L)), "boilerplate removal unaffected")
  }
}
