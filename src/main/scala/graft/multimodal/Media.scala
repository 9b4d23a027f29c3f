package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling (builder mandate): image/audio/video as
  * opaque `binary` payload columns with typed metadata, plus a
  * feature-extraction pass over `mapPartitions` with bounded batches.
  *
  * The actual media decode is STUBBED — this container ships no
  * image/audio codecs — behind `decodeStub`, a clearly-marked
  * deterministic fake that derives metadata/features from payload
  * bytes with a pinned formula (so specs are exact). Everything
  * AROUND the stub is the real production plumbing a decoder would
  * drop into:
  *
  *  - explicit input/output schemas (case classes + product encoders);
  *  - partition-local batch iteration (`grouped(batchSize)`) — the
  *    same bounded-batch shape a vectorized/Arrow UDF sees, never
  *    materializing a whole partition;
  *  - one map-only stage: no shuffle, no driver involvement, scales
  *    linearly with scan bandwidth at 100 TB (payloads never leave
  *    the executor that read them).
  */
object Media {

  val DefaultBatchSize = 64
  val EmbeddingDim = 8

  /** Ingest shape: one opaque payload + its declared modality. */
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata + feature vector (fixed-dim embedding). */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int,
      embedding: Array[Float])

  /** Attach a binary payload column to any frame (here: utf-8 bytes of
    * a text column — the stand-in payload for this container). */
  def withPayload(df: DataFrame, sourceCol: String, kindCol: String): DataFrame =
    df.withColumn("payload", encode(col(sourceCol), "UTF-8"))
      .withColumn("kind", col(kindCol))

  /** ====== STUB ======
    * Deterministic fake decoder: metadata and an `EmbeddingDim`-float
    * signature derived from payload bytes (chunk sums). A real
    * deployment replaces ONLY this function with an actual codec call
    * (e.g. JNI image decode); signature and call sites are unchanged. */
  def decodeStub(kind: String, payload: Array[Byte]): MediaFeaturesParts = {
    val n = payload.length
    def byteAt(i: Int): Int = if (n == 0) 0 else payload(i % n) & 0xff
    val width = 16 + byteAt(0) % 240
    val height = 16 + byteAt(1) % 240
    val frames = kind match {
      case "video" => 1 + byteAt(2) % 32
      case "audio" => 1 + byteAt(2) % 8
      case _       => 1
    }
    val emb = Array.tabulate(EmbeddingDim) { j =>
      val chunk = math.max(1, n / EmbeddingDim)
      val from = j * chunk
      var s = 0L
      var i = from
      while (i < math.min(from + chunk, n)) { s += (payload(i) & 0xff); i += 1 }
      (s % 997).toFloat / 997f
    }
    MediaFeaturesParts(width, height, frames, emb)
  }

  final case class MediaFeaturesParts(
      width: Int, height: Int, n_frames: Int, embedding: Array[Float])

  /** The feature-extraction pass: partition-local, bounded batches.
    * `batchSize` bounds peak memory per task to one batch of decoded
    * outputs regardless of partition size. */
  def extractFeatures(
      ds: Dataset[MediaRecord],
      batchSize: Int = DefaultBatchSize): Dataset[MediaFeatures] =
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // A real decoder would decode `batch` in one vectorized call.
        batch.map { r =>
          val d = decodeStub(r.kind, r.payload)
          MediaFeatures(r.media_id, r.kind, r.payload.length,
            d.width, d.height, d.n_frames, d.embedding)
        }
      }
    }(Encoders.product[MediaFeatures])

  /** Frame sampling as a pure metadata op: every `stride`-th frame
    * index — no payload touched, so it runs before any decode. */
  def frameSampleIndices(df: DataFrame, stride: Int): DataFrame =
    // Guard n_frames = 0: sequence(0, -1) auto-descends to [0, -1]
    // instead of producing an empty array. decodeStub never returns 0
    // frames, but a real codec can.
    df.withColumn("sampled_frames",
      when(col("n_frames") > 0,
        filter(sequence(lit(0), col("n_frames") - 1), i => i % stride === 0))
        .otherwise(array().cast("array<long>")))
}
