package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads as opaque `binary` columns with
  * typed metadata, batch feature extraction via `mapPartitions` (the Scala
  * equivalent of a Pandas-UDF `mapInPandas` stage: per-partition batch,
  * schema-stable output).
  *
  * The actual codec work (image decode / resize / audio frame extraction) is
  * STUBBED — this container ships no media libraries — behind
  * [[FakeCodec]], a deterministic stand-in with the same call shape a real
  * decoder (e.g. javax.imageio / ffmpeg bindings) would have. The Spark-side
  * plumbing — schema, binary handling, partition batching, output shape — is
  * real and tested.
  *
  * Scale: payloads never pass through a shuffle (derive → extract in one
  * narrow stage); metadata-only projections (kind, sizes) prune the binary
  * column from the scan entirely.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Derive a deterministic media table from `documents`: the text bytes act
    * as the opaque payload; kind cycles image/audio/video. */
  def media(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(lit(Array("image", "audio", "video")), (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height"),
        (col("n_chars") * 10).as("duration_ms")).as("meta"))

  /** STUB codec: deterministic byte statistics standing in for a real
    * decoder. A production build would replace `decode` with the actual
    * image/audio library call — the signature and batch shape stay. */
  object FakeCodec {
    final case class Features(nBytes: Long, checksum: Long, brightness: Double)

    def decode(kind: String, bytes: Array[Byte]): Features = {
      // ??? <- real decoder goes here (javax.imageio / ffmpeg / soundfile)
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
      Features(bytes.length.toLong, sum, if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", LongType),
    StructField("brightness", DoubleType)))

  /** Batch feature extraction: one decoder invocation per row, batched per
    * partition (mapInPandas-equivalent plumbing). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("doc_id", "kind", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val f = FakeCodec.decode(r.getString(1), r.getAs[Array[Byte]]("bytes"))
        Row(r.getLong(0), r.getString(1), f.nBytes, f.checksum, f.brightness)
      }
    }(enc)
  }

  /** Frame sampling: every `stride`-th 16-byte slice of the payload becomes
    * a (doc_id, frame_idx, frame_bytes) row — the video-pipeline shape. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    val step = 16 * stride
    // ceil division keeps the trailing partial frame; empty payloads emit none
    val nFrames = ceil(length(col("bytes")).cast("double") / step).cast("int")
    media
      .filter(col("kind") === "video" && length(col("bytes")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), nFrames - 1),
          i => col("bytes").substr(i * step + 1, lit(16)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
  }
}
