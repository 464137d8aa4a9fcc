package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines (SURVEY §7.5).
  *
  * Media travels as opaque `BINARY` columns + a typed metadata struct;
  * decode / feature-extraction runs as a batched per-partition transform
  * (`mapPartitions`) so a real decoder would amortize model/codec init
  * per partition, not per row — the Spark-side contract (schema, batch
  * shape, partitioning) is real and tested; only the codec itself is
  * stubbed because no image/audio libraries ship in this container.
  *
  * STUB NOTE: [[decodeStub]] is a clearly-marked deterministic fake.
  * A production decoder replaces exactly that function (bytes → pixels);
  * nothing else changes.
  */
object Multimodal {

  /** media metadata struct carried beside the binary payload */
  val MetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType)))

  val FeatureDim = 8

  /** Wrap a text corpus as a fake media corpus: content = UTF-8 bytes,
    * metadata derived deterministically (stands in for an image table;
    * the plumbing downstream is payload-agnostic). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("image").as("modality"),
      col("text").cast("binary").as("content"),
      struct(
        lit("fake/raw").as("format"),
        (length(col("text")) % 640).cast("int").as("width"),
        ((length(col("text")) * 7) % 480).cast("int").as("height"),
        lit(3).as("channels")).as("meta"))

  /** DETERMINISTIC FAKE of a media decoder: "decodes" the byte payload to
    * a fixed-length feature vector (mean byte value per stride bucket).
    * Replace with a real codec (JPEG decode → CNN features, audio →
    * fbank, video → frame sample) — signature stays `Array[Byte] →
    * Array[Float]`. */
  def decodeStub(content: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (content == null || content.isEmpty) return out
    val counts = new Array[Int](FeatureDim)
    var i = 0
    while (i < content.length) {
      val bucket = i % FeatureDim
      out(bucket) += (content(i) & 0xff).toFloat
      counts(bucket) += 1
      i += 1
    }
    var b = 0
    while (b < FeatureDim) { if (counts(b) > 0) out(b) /= counts(b); b += 1 }
    out
  }

  /** Batched feature extraction over the media table: one decoder init per
    * partition, rows streamed through it (the mapInPandas batch shape,
    * expressed Scala-side). Output schema: doc_id, meta, features. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("doc_id", "content", "meta.width", "meta.height")
      .mapPartitions { rows =>
        // per-partition decoder init goes here (codec/model handle)
        rows.map { r =>
          val feats = decodeStub(r.getAs[Array[Byte]]("content"))
          Row(r.getAs[Long]("doc_id"), r.getAs[Int]("width"),
            r.getAs[Int]("height"), feats.toSeq)
        }
      }(enc)
  }

  /** Pure-SQL media stats (oracle-checkable): payload size + fake-decode
    * dimensions from metadata. Proves the binary column + struct metadata
    * path end-to-end without the UDF. */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      octet_length(col("content")).cast("long").as("n_bytes"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      (col("meta.width") * col("meta.height") * col("meta.channels")).cast("long")
        .as("n_pixels"))
}
