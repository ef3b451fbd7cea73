package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "abc"), (2L, "x" * 250)).toDF("doc_id", "text")

  test("ingest produces binary payloads with byte counts") {
    val m = Multimodal.ingest(docs, "doc_id", "text", "text/plain").collect()
    val r1 = m.find(_.media_id == 1L).get
    assert(r1.payload.toSeq == "abc".getBytes("UTF-8").toSeq)
    assert(r1.n_bytes == 3L && r1.media_type == "text/plain")
  }

  test("decode kernel is deterministic over payload bytes") {
    val d = Multimodal.decode(Multimodal.ingest(docs, "doc_id", "text", "text/plain"))
      .collect().map(r => r.media_id -> r).toMap
    // checksum("abc") = ('a'*31 + 'b')*31 + 'c'
    assert(d(1L).checksum == (('a' * 31 + 'b') * 31 + 'c').toLong)
    assert(d(1L).width == 3 && d(1L).height == 3 && d(1L).n_frames == 1)
    assert(d(2L).n_frames == 3) // 250 / 100 + 1
  }

  test("frameSample emits stride-spaced indices") {
    val d = Multimodal.decode(Multimodal.ingest(docs, "doc_id", "text", "text/plain"))
    val s = Multimodal.frameSample(d.toDF(), stride = 2)
      .filter(col("media_id") === 2L)
      .select("sampled_frames").as[Seq[Int]].collect().head
    assert(s == Seq(0, 2))
  }

  test("resize preserves aspect ratio bound") {
    val d = Multimodal.decode(Multimodal.ingest(
      Seq((1L, "y" * 400)).toDF("doc_id", "text"), "doc_id", "text", "text/plain"))
    val r = Multimodal.resize(d.toDF(), maxDim = 100).select("out_width", "out_height").collect().head
    // width 400, height 400%480=400 → scale 0.25 → 100x100
    assert(r.getInt(0) == 100 && r.getInt(1) == 100)
  }
}
