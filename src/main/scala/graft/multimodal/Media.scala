package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder-prompt mandate): image/audio/video
  * as opaque `binary` columns with typed metadata, plus batched
  * decode/feature-extract/resize/frame-sample operators.
  *
  * The image/audio codec libraries are NOT in this container, so the decode
  * step is a clearly-marked DETERMINISTIC STUB (`stubDecode`) — the
  * Spark-side plumbing (schema, partitioning, batch shape, mapPartitions
  * signature) is real and tested. Swapping the stub for a real decoder
  * (javacv / a Python `mapInPandas` stage in PySpark deployments) changes
  * only the function body, not the plan shape.
  *
  * Scale notes: blobs never pass through a shuffle — features are derived
  * in narrow mapPartitions batches; only the (small) feature vectors and
  * metadata continue downstream. Partition sizing for blob tables should
  * target spark.sql.files.maxPartitionBytes rather than row counts.
  */
object Media {

  /** Typed metadata for an opaque media blob. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("codec", StringType, nullable = true)))

  /** Canonical media-table schema: id + blob + typed meta. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", MediaMetaSchema, nullable = false)))

  val FeatureDim = 16

  /** STUB DECODER — deterministic byte-histogram "features".
    * A real deployment replaces this body with an actual image/audio decode
    * (the container has no codec libs). Signature and batch usage are the
    * real contract: Array[Byte] => Array[Float] of FeatureDim.
    */
  def stubDecode(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    if (bytes == null || bytes.isEmpty) return hist
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xFF) % FeatureDim) += 1f
      i += 1
    }
    val n = bytes.length.toFloat
    var j = 0
    while (j < FeatureDim) { hist(j) /= n; j += 1 }
    hist
  }

  /** STUB RESIZE — deterministic byte down-sampling standing in for an
    * image resize; preserves the (bytes → bytes) contract.
    */
  def stubResize(bytes: Array[Byte], factor: Int): Array[Byte] = {
    if (bytes == null || factor <= 1) return bytes
    bytes.indices.collect { case i if i % factor == 0 => bytes(i) }.toArray
  }

  /** STUB FRAME SAMPLE — every k-th fixed-size window as a "frame". */
  def stubFrameSample(bytes: Array[Byte], frameSize: Int, every: Int): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length < frameSize) return Seq.empty
    (0 until bytes.length - frameSize by frameSize * every)
      .map(off => bytes.slice(off, off + frameSize))
  }

  /** Batched feature extraction: one mapPartitions pass adds a
    * `features: array<float>` column from `bytesCol`. The decode is invoked
    * per row but all per-batch setup is amortized — the exact shape a real
    * model-based decoder needs (cf. SURVEY.md §2.7 M2 pattern).
    */
  def withFeatures(df: DataFrame, bytesCol: String, outCol: String): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(FloatType), nullable = false)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      // per-batch setup happens here (a real decoder loads its model once)
      it.map { r =>
        val b = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ stubDecode(b).toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Pure-Catalyst metadata derivation for blobs: size + deterministic
    * content hash (no decode needed — stays in codegen).
    */
  def blobStats(bytesCol: Column): Column =
    struct(
      length(bytesCol).as("n_bytes"),
      xxhash64(bytesCol).as("content_hash"),
      md5(bytesCol).as("content_md5"))

  /** Build a deterministic media table from any binary column (used by
    * tests and the driver query — the documents' html wrapper bytes stand
    * in for media blobs).
    */
  def mediaFromBinary(df: DataFrame, idCol: String, bytesCol: String,
                      kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(bytesCol).as("bytes"),
      struct(
        lit(kind).as("kind"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit("stub").as("codec")).as("meta"))
}
