package graft.tools

import java.nio.charset.StandardCharsets.UTF_8

import graft.plans.BagCodec

/** Pure-JVM microbench of [[BagCodec.pack]]/[[BagCodec.unpack]] at the
  * bench's two shapes (guide §1: isolate the per-task kernel before
  * touching it):
  *
  *  - "fleet" — 64 bags × ~1.5k msgs, 256-msg chunks (packEventBags /
  *    q_bag_counts..manifest_refresh shape);
  *  - "peruser" — 1500 bags × ~67 msgs, single chunk (q_bag_typed /
  *    q_bag_roundtrip shape);
  *
  * each per codec (none/bz2/lz4). Payloads mimic the props strings
  * (~60 B json-ish text). Reports ms per full pack pass and per unpack
  * pass (median of 5 after 2 warmups).
  */
object BagCodecProbe {
  private def payload(i: Int): Array[Byte] =
    s"""{"k":"v$i","idx":$i,"flag":${i % 2 == 0},"pad":"xxxxxxxxxxxxxxxx"}"""
      .getBytes(UTF_8)

  private def msgs(n: Int, seed: Int): Seq[(String, Long, Array[Byte])] =
    (0 until n).map(i => (s"topic${i % 5}", (seed * 100000L + i) * 1000L,
      payload(seed * 31 + i)))

  private def medianMs(reps: Int)(f: () => Unit): Double = {
    f(); f() // warm
    val runs = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e6
    }.sorted
    runs(runs.size / 2)
  }

  def main(args: Array[String]): Unit = {
    val shapes = Seq(
      ("fleet", 64, 1500, 256),
      ("peruser", 1500, 67, Int.MaxValue))
    for ((name, bags, per, chunk) <- shapes; codec <- Seq("none", "bz2", "lz4")) {
      val inputs = (0 until bags).map(b => msgs(per, b))
      var packed: Seq[Array[Byte]] = Nil
      val packMs = medianMs(5) { () =>
        packed = inputs.map(m => BagCodec.pack(m, codec, messagesPerChunk = chunk))
      }
      val bytes = packed.map(_.length.toLong).sum
      val unpackMs = medianMs(5) { () => packed.foreach(BagCodec.unpack) }
      println(f"[bagcodec] $name%-8s $codec%-5s pack=$packMs%8.1f ms  unpack=$unpackMs%8.1f ms  bytes=$bytes%10d")
    }
  }
}
