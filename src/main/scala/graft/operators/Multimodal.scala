package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal binary-column plumbing (SURVEY.md §2 #31): media
  * payloads ride through the engine as opaque `binary` columns with
  * typed metadata; decode/feature-extract runs per-partition so a
  * native decoder amortizes its init across a batch of rows.
  *
  * The decode step itself is a STUB (this container has no image/
  * audio libs): `decodeStub` derives deterministic fake features from
  * the byte length. Everything around it — the typed Dataset schema,
  * the binary cast at the scan, the per-partition batching, the
  * feature schema written out — is the real plumbing a decoder drops
  * into.
  */
object Multimodal {

  case class MediaIn(doc_id: Long, payload: Array[Byte])
  case class MediaFeat(doc_id: Long, n_bytes: Long, n_chunks: Long,
      width: Long, height: Long, channels: Long)

  val ChunkBytes = 4096L

  /** STUB decoder: deterministic pseudo-features of the payload size.
    * A real decoder (libjpeg/ffmpeg/…) replaces exactly this function;
    * the pipeline shape stays identical. */
  def decodeStub(m: MediaIn): MediaFeat = {
    val n = m.payload.length.toLong
    MediaFeat(m.doc_id, n, (n + ChunkBytes - 1) / ChunkBytes,
      width = 16 + n % 624, height = 16 + (n * 7) % 464,
      channels = 1 + n % 3)
  }

  /** #48 Chunk/frame-sample plumbing: split each payload into fixed
    * 4 KiB chunks, one row per chunk — the fan-out shape of frame
    * sampling or tiled image decode, where a downstream decoder
    * consumes bounded pieces. The explode is bounded by payload size
    * and runs inside the scan stage (no shuffle). */
  def multimodalChunks(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
      // empty payloads have no chunks (and sequence(0,-1) would
      // count down); both engines drop them identically
      .filter(col("n_bytes") > 0L)
      .withColumn("n_chunks", ((col("n_bytes") + ChunkBytes - 1L) /
        lit(ChunkBytes)).cast("long"))
      .select(col("doc_id"), col("n_bytes"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        least(lit(ChunkBytes), col("n_bytes") - col("chunk_id") * ChunkBytes)
          .as("chunk_len"))
      .orderBy("doc_id", "chunk_id")

  /** #31 Scan → binary cast → per-partition decode → typed features.
    * (mapPartitions is deliberate here — SURVEY.md §4 preference (d)
    * is allowed for genuinely imperative per-batch native decode.) */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      // a null payload has nothing to decode (decodeStub would NPE on
      // payload.length) — mirror multimodalChunks' null/empty policy
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .orderBy("doc_id")
  }
}
