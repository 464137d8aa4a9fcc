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

  /** DETERMINISTIC FAKE of an image resize: real resizers map pixel
    * buffers; the stub scales the payload by stride-sampling bytes to the
    * target size. Spark-side contract (binary→binary, metadata updated in
    * the same projection) is the real part. */
  def resizeStub(content: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    if (content == null || content.isEmpty) return Array.empty
    val target = math.max(1, math.min(targetW * targetH, content.length))
    val out = new Array[Byte](target)
    var i = 0
    while (i < target) {
      out(i) = content((i.toLong * content.length / target).toInt)
      i += 1
    }
    out
  }

  /** Resize a media table to target dimensions: payload re-sampled,
    * metadata struct rewritten — one narrow projection, no shuffle. */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val f = udf((c: Array[Byte]) => resizeStub(c, targetW, targetH))
    media
      .withColumn("content", f(col("content")))
      .withColumn("meta", struct(
        col("meta.format").as("format"),
        lit(targetW).as("width"),
        lit(targetH).as("height"),
        col("meta.channels").as("channels")))
  }

  /** DETERMINISTIC FAKE of video frame sampling: treats the payload as a
    * contiguous frame buffer and cuts `n` evenly-spaced equal slices (a
    * real implementation seeks keyframes via the container index). One
    * row per (doc, frame) — the explode shape a frame-level pipeline
    * consumes. */
  def frameSample(media: DataFrame, n: Int): DataFrame = {
    val slicer = udf { (c: Array[Byte]) =>
      if (c == null || c.isEmpty) Seq.empty[Array[Byte]]
      else {
        val frame = math.max(1, c.length / n)
        (0 until math.min(n, c.length)).map { i =>
          val start = i * frame
          java.util.Arrays.copyOfRange(c, start, math.min(start + frame, c.length))
        }
      }
    }
    media.select(col("doc_id"),
      posexplode(slicer(col("content"))).as(Seq("frame_no", "frame")))
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
