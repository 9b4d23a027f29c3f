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

  // ---- real-bytes container codec (r15 verdict #4) -------------------

  /** A decoded raster: dimensions from the header, the raw pixel
    * plane from the body. */
  final case class PgmImage(width: Int, height: Int, pixels: Array[Byte])

  /** Build a REAL binary P5 (raw PGM) container around a pixel
    * plane: `P5 <w> <h> 255\n` + one byte per pixel, width = plane
    * length, height = 1 (the synthetic fixture shape — a real camera
    * feed sets both). This is what lands in an object store's media
    * bucket; everything downstream must go through [[decodePgm]] to
    * touch the pixels. */
  def pgmPayload(pixels: Array[Byte]): Array[Byte] = {
    val header = s"P5 ${pixels.length} 1 255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, pixels.length)
    out
  }

  /** REAL decode of a P5 raw-PGM payload: parse the magic, the
    * whitespace-separated width/height/maxval header (any ASCII
    * whitespace run separates tokens — the actual format), then
    * extract exactly width·height pixel bytes after the single
    * whitespace that terminates the header. Malformed payloads
    * (wrong magic, non-numeric or missing header fields, maxval
    * outside (0, 255], truncated plane) REFUSE loudly — a corrupt
    * object must surface at ingest, not digest as garbage. This is
    * the function a real deployment keeps; only the upstream payload
    * SOURCE (synthetic here, a bucket scan in production) changes. */
  def decodePgm(payload: Array[Byte]): PgmImage = {
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"decodePgm: $msg")
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\t' || b == '\r' || b == '\f'
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '5')
      fail("missing P5 magic")
    i = 2
    def token(): Int = {
      while (i < payload.length && isWs(payload(i))) i += 1
      if (i >= payload.length) fail("truncated header")
      var v = 0L
      var any = false
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = v * 10 + (payload(i) - '0')
        any = true
        i += 1
        if (v > Int.MaxValue) fail("header field overflow")
      }
      if (!any) fail(s"non-numeric header field at byte $i")
      v.toInt
    }
    val w = token()
    val h = token()
    val maxval = token()
    if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
    if (i >= payload.length || !isWs(payload(i)))
      fail("header not terminated by whitespace")
    i += 1 // exactly ONE whitespace terminates the header (the spec)
    val n = w.toLong * h
    if (n > Int.MaxValue || payload.length - i < n)
      fail(s"truncated pixel plane: need $n bytes, have ${payload.length - i}")
    val pixels = new Array[Byte](n.toInt)
    System.arraycopy(payload, i, pixels, 0, n.toInt)
    PgmImage(w, h, pixels)
  }

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
