package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract guards on the driver surface: every query has an oracle and
  * vice versa (a query without an oracle silently downgrades to a
  * rows-only check in the correctness gate).
  */
class SparkEntrySpec extends AnyFunSuite {

  test("queries and oracleSql cover exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("every oracle is non-empty single-statement SQL") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      assert(!sql.trim.stripSuffix(";").contains(";"),
        s"$name: oracle must be one statement")
    }
  }
}
