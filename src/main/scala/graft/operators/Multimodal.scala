package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Query, Tables}

/** Multimodal column handling for training-data pipelines: media as
  * opaque BINARY columns + a typed metadata struct, with
  * decode / feature-extraction / resize / frame-sampling as
  * *batched per-partition* transforms (the Scala analog of
  * mapInPandas: one iterator pass per partition, constant memory,
  * no per-row JVM<->library round trips).
  *
  * The image/audio codecs are NOT available in this environment, so
  * `FakeCodec` is a clearly-marked deterministic STUB: it treats the
  * blob bytes as "pixels". The Spark-side plumbing — schema, batch
  * shape, partition iteration, feature vectors, metadata pruning —
  * is real and is what carries to a cluster; swapping FakeCodec for
  * a JNI/FFI codec touches nothing else.
  */
object Multimodal {

  /** Typed row for the media table. */
  case class Media(media_id: Long, format: String, width: Int, height: Int,
                   blob: Array[Byte])

  /** Decoded features per media item. */
  case class MediaFeatures(media_id: Long, format: String, n_bytes: Int,
                           byte_sum: Long, mean_byte: Double,
                           histogram: Array[Long])

  /** STUB decoder — deterministic stand-in for an image/audio codec.
    * Real implementation would decode `blob` into pixels/samples; this
    * one uses the raw bytes directly so every value is reproducible. */
  object FakeCodec {
    val HistBins = 16

    def features(m: Media): MediaFeatures = {
      val hist = new Array[Long](HistBins)
      var sum = 0L
      var i = 0
      while (i < m.blob.length) {
        val b = m.blob(i) & 0xff
        hist(b * HistBins / 256) += 1
        sum += b
        i += 1
      }
      MediaFeatures(m.media_id, m.format, m.blob.length, sum,
        if (m.blob.length == 0) 0.0 else sum.toDouble / m.blob.length, hist)
    }

    /** "Resize": deterministic re-sampling of the byte plane. */
    def resize(blob: Array[Byte], outLen: Int): Array[Byte] =
      if (blob.isEmpty) new Array[Byte](outLen)
      else Array.tabulate(outLen)(i => blob((i.toLong * blob.length / outLen).toInt))

    /** "Frame sampling": every `stride`-th window of `frameLen` bytes. */
    def sampleFrames(blob: Array[Byte], frameLen: Int, stride: Int): Seq[Array[Byte]] =
      (0 until math.max(0, blob.length - frameLen + 1) by stride)
        .map(off => blob.slice(off, off + frameLen))
  }

  /** Synthesize the media table from the documents fixture: text bytes
    * play the blob role; format/width/height are deterministic typed
    * metadata. */
  def mediaTable(s: SparkSession, d: String): Dataset[Media] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("png"), lit("jpeg"), lit("webp")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("format"),
        (col("n_chars") % 64 + 16).cast(IntegerType).as("width"),
        (col("n_chars") % 48 + 12).cast(IntegerType).as("height"),
        col("text").cast(BinaryType).as("blob"))
      .as[Media]
  }

  private def featuresDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).mapPartitions(_.map(FakeCodec.features)).toDF()
  }

  private def framesDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).flatMap { m =>
      val resized = FakeCodec.resize(m.blob, 128)
      FakeCodec.sampleFrames(resized, 32, 24).zipWithIndex.map {
        case (f, i) => (m.media_id, m.format, i, f.length,
          f.foldLeft(0L)((a, b) => a + (b & 0xff)))
      }
    }.toDF("media_id", "format", "frame_idx", "frame_bytes", "byte_sum")
  }

  /** Materialize the codec outputs (features + sampled frames) for
    * the DuckDB oracles: the stub codec runs in Spark once, and the
    * oracles re-aggregate independently (Verify-only). */
  def materializeMediaAux(s: SparkSession, d: String, auxDir: String): Unit = {
    featuresDf(s, d).drop("histogram")
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/media_features.parquet")
    framesDf(s, d)
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/media_frames.parquet")
  }

  /** q90: batched decode + feature extraction, aggregated per format.
    * mapPartitions = one codec context per partition (the expensive
    * init a real decoder would amortize across its batch). The mean
    * byte value is the size-weighted mean computed from exact integer
    * sums — no double quantization anywhere, so the oracle divides
    * the same two BIGINTs (a decimal-cast mean-of-means hit a
    * double->DECIMAL tie-rounding divergence at sf0.1). Oracle:
    * re-aggregated from the materialized feature table. */
  private def q90(s: SparkSession, d: String): DataFrame =
    featuresDf(s, d)
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        (sum(col("byte_sum")) / sum(col("n_bytes"))).as("avg_byte"))
      .orderBy("format")

  private val q90Sql = """
    SELECT format, COUNT(*) AS n_media,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(byte_sum) AS BIGINT) / CAST(SUM(n_bytes) AS BIGINT) AS avg_byte
    FROM read_parquet('/root/repo/target/verify_aux/media_features.parquet/*.parquet')
    GROUP BY format ORDER BY format"""

  /** q91: resize + frame-sample the blobs, explode frames with index,
    * count frames and bytes per format (all deterministic). Oracle:
    * re-aggregated from the materialized frame table. */
  private def q91(s: SparkSession, d: String): DataFrame =
    framesDf(s, d).groupBy(col("format"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("media_id")).as("n_media"),
        sum(col("byte_sum")).as("total_byte_sum"))
      .orderBy("format")

  private val q91Sql = """
    SELECT format, COUNT(*) AS n_frames, COUNT(DISTINCT media_id) AS n_media,
           CAST(SUM(byte_sum) AS BIGINT) AS total_byte_sum
    FROM read_parquet('/root/repo/target/verify_aux/media_frames.parquet/*.parquet')
    GROUP BY format ORDER BY format"""

  val queries: Seq[Query] = Seq(
    Query("q90_media_features", q90, Some(q90Sql)),
    Query("q91_frame_sample",   q91, Some(q91Sql)))
}
