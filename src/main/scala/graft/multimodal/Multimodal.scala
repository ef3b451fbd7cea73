package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed in partition-sized batches.
  *
  * The decode kernels are REAL byte-level codecs ([[MediaCodec]]: binary
  * PPM, 24-bit BMP, concatenated-PPM frame sequences — pure JVM, no
  * native deps). The surrounding shape is the 100 TB design: kernels see
  * an iterator per partition (amortizing codec/model init, exactly like
  * an inference UDF batch), pixel buffers never leave the executor —
  * only fixed-width features (dims, frame count, checksums) come back as
  * columns — and metadata stays columnar for Catalyst.
  *
  * Reference: the ROS-bag pipeline treats camera topics as opaque
  * payloads next to typed signal columns (service/app/main.py:87
  * message_by_topic extraction); decode here plays the role an inference
  * or thumbnailing kernel would in its Fargate task.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      media_type: String,
      payload: Array[Byte],
      n_bytes: Long)

  /** Decoded media features. `media_type` is DETECTED from the payload's
    * magic bytes, not trusted from ingest metadata. `checksum` is the sum
    * of the format-normalized (top-down RGB) pixel bytes; `wchecksum`
    * weights each byte by its position, so a decoder that forgets BMP's
    * bottom-up row order or BGR channel order produces the same checksum
    * but a different wchecksum — the pair pins the full normalization.
    */
  case class DecodedMedia(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long,
      wchecksum: Long)

  /** One frame of a sequence medium as a signal sample. */
  case class MediaFrame(media_id: Long, frame_idx: Int, mean_intensity: Double)

  /** Ingest any table with a binary-able column as a media table. */
  def ingest(df: DataFrame, idCol: String, payloadCol: String,
             mediaType: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast("binary").as("payload"),
      length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** Deterministic media synthesis over an id column: real encoded bytes,
    * with geometry / format / frame count / pixels all pure functions of
    * the id — so a SQL oracle can predict every decoded feature while the
    * decode kernel genuinely parses headers and rasters. id mod 3 picks
    * the format (PPM, BMP, PPM sequence); even-id BMPs encode as
    * palettized BI_RLE8 (a COMPRESSED format — variable-length byte
    * stream, n_bytes ≠ raster size). Pixel k of the flat frame-major
    * DECODED raster is (id*7 + k*13) mod 256 for every format: the RLE8
    * palette maps index i to (i, i+13, i+26) mod 256 and pixel j's index
    * is the formula's R channel, so decompression reproduces the same
    * raster the other formats carry verbatim.
    */
  def synthesize(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { d =>
        val w = (d % 13 + 2).toInt
        val h = (d % 7 + 2).toInt
        val frames = if (d % 3 == 2) (d % 4 + 1).toInt else 1
        val px = Array.tabulate[Byte](frames * w * h * 3)(k => ((d * 7 + k * 13) % 256).toByte)
        val (mt, bytes) = (d % 3) match {
          case 0 => ("image/x-portable-pixmap", MediaCodec.encodePpm(w, h, px))
          case 1 =>
            if (d % 2 == 0) {
              val indices = Array.tabulate[Byte](w * h)(j => ((d * 7 + 39L * j) % 256).toByte)
              ("image/bmp-rle8", MediaCodec.encodeBmpRle8(w, h, indices, rle8Palette))
            } else if (d % 4 == 3) {
              // PNG: zlib-framed deflate — the second compressed format,
              // same canonical raster
              ("image/png", MediaCodec.encodePng(w, h, px))
            } else ("image/bmp", MediaCodec.encodeBmp(w, h, px))
          case _ => ("video/x-ppm-seq", MediaCodec.encodePpmSeq(w, h, frames, px))
        }
        MediaRecord(d, mt, bytes, bytes.length.toLong)
      }
    }
  }

  /** Palette for the synthesized RLE8 BMPs: entry i is packed RGB
    * (i, (i+13) mod 256, (i+26) mod 256), the color triple the canonical
    * raster formula assigns to a pixel whose R channel is i.
    */
  private val rle8Palette: Array[Int] = Array.tabulate(256)(i =>
    (i << 16) | (((i + 13) % 256) << 8) | ((i + 26) % 256))

  /** Decode kernel: parse each payload's actual bytes (magic sniff →
    * header parse → raster normalization) and emit fixed-width features.
    * One iterator per partition is the production batch shape — per-
    * partition init (codec handles, buffers) happens once, and the raster
    * buffer is dropped before rows are returned.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init happens here (codec/model handles, buffers)
      it.map { m =>
        val dec = MediaCodec.decode(m.payload)
        var sum = 0L
        var wsum = 0L
        var k = 0
        while (k < dec.pixels.length) {
          val v = dec.pixels(k) & 0xff
          sum += v
          wsum += k.toLong * v
          k += 1
        }
        DecodedMedia(
          media_id = m.media_id,
          media_type = dec.format,
          n_bytes = m.n_bytes,
          width = dec.width,
          height = dec.height,
          n_frames = dec.nFrames,
          checksum = sum,
          wchecksum = wsum)
      }
    }
  }

  /** One row PER FRAME of sequence media with its mean pixel intensity —
    * the bridge from the multimodal family to the SIGNAL family: a frame
    * sequence becomes a (media, frame_idx, intensity) time series that
    * `Scenes.boundaries` (batch) or `Streaming.sceneDetect` (live)
    * consume unchanged. Map-side kernel like [[decode]]; single-frame
    * formats yield one row.
    */
  def decodeFrames(media: Dataset[MediaRecord]): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val dec = MediaCodec.decode(m.payload)
      val nf = math.max(dec.nFrames, 1)
      val frameLen = dec.pixels.length / nf
      (0 until nf).map { f =>
        var s = 0L
        var k = f * frameLen
        while (k < (f + 1) * frameLen) { s += (dec.pixels(k) & 0xff); k += 1 }
        MediaFrame(m.media_id, f,
          if (frameLen == 0) 0.0 else s.toDouble / frameLen)
      }
    }
  }

  /** One row per frame with the MEAN ABSOLUTE pixel difference vs the
    * previous frame — the shot-boundary signal keyframe selection
    * thresholds (the standard content-based video summarization cue).
    * The first frame of each medium has no predecessor: diff = NULL,
    * always a keyframe. Map-side kernel like [[decodeFrames]] — pixels
    * never leave the executor; the exchange carries one double per
    * frame.
    */
  case class FrameDiff(media_id: Long, frame_idx: Int,
                       mean_abs_diff: Option[Double])

  def frameDiffs(media: Dataset[MediaRecord]): Dataset[FrameDiff] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val dec = MediaCodec.decode(m.payload)
      val nf = math.max(dec.nFrames, 1)
      val frameLen = dec.pixels.length / nf
      (0 until nf).map { f =>
        if (f == 0 || frameLen == 0) FrameDiff(m.media_id, f, None)
        else {
          var s = 0L
          var k = 0
          while (k < frameLen) {
            val a = dec.pixels(f * frameLen + k) & 0xff
            val b = dec.pixels((f - 1) * frameLen + k) & 0xff
            s += math.abs(a - b)
            k += 1
          }
          FrameDiff(m.media_id, f, Some(s.toDouble / frameLen))
        }
      }
    }
  }

  /** Keyframe selection over [[frameDiffs]] output: a frame is a
    * keyframe when it has no predecessor or its mean absolute pixel
    * difference clears `threshold` — downstream samplers keep exactly
    * these instead of a blind stride ([[frameSample]]).
    */
  def keyframes(diffs: DataFrame, threshold: Double): DataFrame =
    diffs.withColumn("keyframe",
      col("mean_abs_diff").isNull || col("mean_abs_diff") >= threshold)

  /** Frame sampling: every `stride`-th frame index, as a plan-native
    * `sequence` — the sampled index list stays columnar; no kernel call.
    */
  def frameSample(decoded: DataFrame, stride: Int): DataFrame =
    decoded.withColumn("sampled_frames",
      when(col("n_frames") > 0,
        sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .otherwise(array()))

  /** Resize plan: metadata-only dimension computation (what downstream
    * operators consume to budget batches). `resizePayload` below is the
    * pixel-level kernel twin.
    */
  def resize(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim) / greatest(col("width"), lit(1)),
      lit(maxDim) / greatest(col("height"), lit(1)),
      lit(1.0))
    decoded
      // clamp to >= 1: an extreme aspect ratio must thumbnail to a 1px
      // strip, not a zero-dimensional image (standard thumbnail rule)
      .withColumn("out_width", greatest(lit(1), floor(col("width") * scale).cast("int")))
      .withColumn("out_height", greatest(lit(1), floor(col("height") * scale).cast("int")))
  }

  /** Decoded audio features — same fixed-width-columns-out contract as
    * [[DecodedMedia]]: samples never leave the executor.
    */
  case class DecodedAudioRow(
      media_id: Long,
      n_bytes: Long,
      sample_rate: Int,
      n_channels: Int,
      n_samples: Int,
      duration_us: Long,
      checksum: Long,
      wchecksum: Long)

  /** Deterministic WAV synthesis over an id column: real RIFF/PCM bytes
    * with rate / channels / length / samples all pure functions of the
    * id — interleaved sample k is ((id*31 + k*17) mod 65536) − 32768.
    */
  def synthesizeAudio(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { d =>
        val rate = 8000 * (d % 3 + 1).toInt
        val nCh = (d % 2 + 1).toInt
        val frames = (d % 50 + 10).toInt
        val samples = Array.tabulate[Short](nCh * frames)(k =>
          (((d * 31 + k * 17) % 65536) - 32768).toShort)
        val bytes = MediaCodec.encodeWav(rate, nCh, samples)
        MediaRecord(d, "audio/wav", bytes, bytes.length.toLong)
      }
    }
  }

  /** Audio decode kernel: parse the actual RIFF chunk list and PCM data;
    * emit rate/channels/length plus sample checksums (the positional
    * weight pins interleaving order).
    */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[DecodedAudioRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val dec = MediaCodec.decodeWav(m.payload)
        var sum = 0L
        var wsum = 0L
        var k = 0
        while (k < dec.samples.length) {
          val v = dec.samples(k).toLong
          sum += v
          wsum += k.toLong * v
          k += 1
        }
        DecodedAudioRow(
          media_id = m.media_id,
          n_bytes = m.n_bytes,
          sample_rate = dec.sampleRate,
          n_channels = dec.nChannels,
          n_samples = dec.nSamples,
          duration_us = dec.nSamples * 1000000L / dec.sampleRate,
          checksum = sum,
          wchecksum = wsum)
      }
    }
  }

  /** Pixel-level resize kernel: decode → nearest-neighbor downsample each
    * frame to fit `maxDim` → re-encode (PPM / PPM-seq; BMP inputs come
    * back as PPM — normalization is the point of a curation pipeline).
    * Geometry math matches `resize` exactly; MultimodalSpec proves the
    * round trip (re-decoding yields the predicted dims and the predicted
    * nearest-neighbor pixels).
    */
  def resizePayload(media: Dataset[MediaRecord], maxDim: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val dec = MediaCodec.decode(m.payload)
        val scale = math.min(
          math.min(maxDim.toDouble / math.max(dec.width, 1),
            maxDim.toDouble / math.max(dec.height, 1)), 1.0)
        val ow = math.max(1, math.floor(dec.width * scale).toInt)
        val oh = math.max(1, math.floor(dec.height * scale).toInt)
        val frameLen = dec.width * dec.height * 3
        val outLen = ow * oh * 3
        val out = new Array[Byte](dec.nFrames * outLen)
        var f = 0
        while (f < dec.nFrames) {
          val frame = java.util.Arrays.copyOfRange(
            dec.pixels, f * frameLen, (f + 1) * frameLen)
          System.arraycopy(
            MediaCodec.resizeNearest(frame, dec.width, dec.height, ow, oh),
            0, out, f * outLen, outLen)
          f += 1
        }
        val bytes =
          if (dec.nFrames == 1) MediaCodec.encodePpm(ow, oh, out)
          else MediaCodec.encodePpmSeq(ow, oh, dec.nFrames, out)
        MediaRecord(m.media_id, "image/x-portable-pixmap", bytes, bytes.length.toLong)
      }
    }
  }
}
