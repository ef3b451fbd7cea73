package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed in partition-sized batches.
  *
  * The decode kernels are deterministic STUBS (this container has no
  * image/audio codecs — see the builder contract): `fakeDecode` derives
  * "pixels" from the payload bytes. Everything around the kernel — the
  * schema, the typed Dataset plumbing, the `mapPartitions` batch shape, the
  * partition sizing — is the real 100 TB design: kernels see an iterator
  * per partition (amortizing model/codec init, exactly like an inference
  * UDF batch), rows never leave the executor, and metadata stays columnar.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      media_type: String,
      payload: Array[Byte],
      n_bytes: Long)

  /** Decoded frame features (stub kernel output). */
  case class DecodedMedia(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

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

  /** STUB decode kernel: deterministic features from payload bytes. A real
    * deployment swaps the body for a codec call; the signature — an
    * iterator of records in, an iterator of decoded rows out, one call per
    * partition — is the production batch shape.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init happens here (codec/model handles, buffers)
      it.map { m =>
        val sum = m.payload.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
        DecodedMedia(
          media_id = m.media_id,
          media_type = m.media_type,
          n_bytes = m.n_bytes,
          width = (m.n_bytes % 640).toInt,
          height = (m.n_bytes % 480).toInt,
          n_frames = (m.n_bytes / 100 + 1).toInt,
          checksum = sum)
      }
    }
  }

  /** Frame sampling: every `stride`-th frame index, as a plan-native
    * `sequence` — the sampled index list stays columnar; no kernel call.
    */
  def frameSample(decoded: DataFrame, stride: Int): DataFrame =
    decoded.withColumn("sampled_frames",
      when(col("n_frames") > 0,
        sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .otherwise(array()))

  /** "Resize": metadata-only transform (a real kernel would rewrite the
    * payload; the metadata contract is what downstream operators consume).
    */
  def resize(decoded: DataFrame, maxDim: Int): DataFrame = {
    val d = decoded
    val scale = least(
      lit(maxDim) / greatest(col("width"), lit(1)),
      lit(maxDim) / greatest(col("height"), lit(1)),
      lit(1.0))
    d.withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }
}
