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

  test("shared pair table is keyed on corpus CONTENT, not just the path") {
    // a rewritten corpus at the same path must not serve the previous
    // snapshot's pair table from the cache
    val spark = SparkSpec.session
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val first = SparkEntry.queries("q_dedup_minhash")(spark, dir).count()
    assert(first > 0, "seed corpus should contain near-dup pairs")
    // rewrite the corpus at the SAME path down to a single document — a
    // one-doc corpus cannot have pairs, so any non-empty result is the
    // stale cache talking
    docs.limit(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val second = SparkEntry.queries("q_dedup_minhash")(spark, dir).count()
    assert(second == 0,
      s"cache served stale pairs after corpus rewrite: $first -> $second")
    SparkEntry.clearSharedTables()
  }
}
