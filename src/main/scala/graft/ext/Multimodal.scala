package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY.md §2.11 extension surface):
  * media as opaque `binary` columns with typed metadata, processed in
  * partition-streamed batches — the Scala/Tungsten analogue of an
  * Arrow-batched `mapInPandas` decode stage.
  *
  * The actual image/audio decode is STUBBED ([[decodeMedia]]): codec
  * libraries are unavailable here, so features come from a
  * deterministic byte-level fake. Everything around the stub — the
  * schema, the binary column, the batch shape, the per-partition
  * streaming, the feature output contract — is real and oracle-tested
  * (q37): swap [[fakeFeatures]] for a JNI/codec call and nothing else
  * changes.
  *
  * Scale: `mapPartitions` streams one partition per task with O(batch)
  * memory; a decode stage at 100 TB is embarrassingly parallel and
  * this shape (no shuffle before or after, columnar scan in, typed
  * Dataset out) is the one you want.
  */
object Multimodal {

  /** A media row: opaque bytes + typed metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])

  /** Output contract of the (stubbed) decode/feature stage. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, byte_sum: Long,
                                 content_hash: String, feat_mean: Double)

  /** Batch size of the decode stage — mirrors an Arrow record-batch. */
  val DecodeBatchSize = 64

  /** STUB — a real implementation decodes image/audio/video bytes into
    * pixels/samples. Unavailable in this environment by design.
    */
  def decodeMedia(bytes: Array[Byte]): Nothing =
    throw new UnsupportedOperationException(
      "decodeMedia is a stub: codec libraries are not available in this environment")

  /** Deterministic fake standing in for the decoder: byte-level stats
    * and a content hash.
    */
  def fakeFeatures(m: MediaRow): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < m.content.length) { sum += (m.content(i) & 0xff); i += 1 }
    val digest = MessageDigest.getInstance("SHA-256").digest(m.content)
    val hex = digest.map("%02x".format(_)).mkString
    MediaFeatures(m.doc_id, m.content.length, sum, hex,
      if (m.content.isEmpty) 0.0 else sum.toDouble / m.content.length)
  }

  /** Media table derived from `documents` (text bytes as the opaque
    * payload — the test environment's stand-in for image bytes).
    */
  def mediaFromDocuments(spark: SparkSession, d: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id", lit("text/plain").as("media_type"),
              $"text".cast("binary").as("content"))
      .as[MediaRow]
  }

  /** The decode/feature-extract stage: partition-streamed, batched like
    * an Arrow UDF, stub-decoded.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        // A real decoder would process `batch` as one columnar block
        // (e.g. hand it to a native library); the fake is per-row.
        batch.iterator.map(fakeFeatures)
      }
    }
  }

  /** q37: the full multimodal pipeline — binary ingestion, batched
    * decode stub, typed features — with deterministic output.
    */
  def mediaFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(spark, d))
      .toDF()
      .select($"doc_id", $"n_bytes", $"byte_sum", $"content_hash",
        (round($"feat_mean" * lit(10000.0), 0) / lit(10000.0)).as("feat_mean"))
      .orderBy($"doc_id")
  }
}
