package graft.operators

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("pack assigns contiguous bins per shard with correct offsets") {
    val docs = Seq(
      (1L, "s1", 300L), (2L, "s1", 300L), (3L, "s1", 100L),
      (4L, "s2", 600L)
    ).toDF("doc_id", "source", "n_tokens")
    val out = Packing.pack(docs, "doc_id", "n_tokens", windowTokens = 512L,
      shardCols = Seq("source"))
      .orderBy("source", "doc_id").collect()
    val got = out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bin_id"),
      r.getAs[Long]("bin_offset"))).toSeq
    // s1: prefixes 0, 300, 600 → bins 0,0,1; offsets 0,300,88
    // s2: prefix 0 → bin 0 offset 0
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 300L), (3L, 1L, 88L), (4L, 0L, 0L)))
  }
}
