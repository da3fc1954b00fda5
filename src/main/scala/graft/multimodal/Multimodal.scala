package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json north star): image/audio/video
  * as opaque `binary` columns plus typed metadata, flowing through typed
  * `Dataset.mapPartitions` stages (the Scala analogue of arrow-batched
  * decode UDFs).
  *
  * The actual media decode is STUBBED — the container ships no image/audio
  * codecs — behind `decodeStub`, a deterministic fake that derives
  * "features" from the bytes alone. Everything around the stub (schemas,
  * partitioning, batch iteration, feature layout) is real and tested, so a
  * real decoder drops in by replacing ONE function.
  *
  * Scale notes: decode is per-row/per-partition — embarrassingly parallel,
  * no shuffle. Large blobs should be read via `binaryFile` with
  * `spark.sql.files.maxPartitionBytes` sized so a partition of blobs fits
  * executor memory; frame-sampling keeps per-row output bounded.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      // fake decode output: fixed-length feature vector + "dimensions"
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  /** STUB decode: deterministic pseudo-features from raw bytes — stands in
    * for pillow/ffmpeg-style decoding, which is unavailable offline. A real
    * implementation replaces only this function.
    */
  def decodeStub(row: MediaRow, featDim: Int = 16): MediaFeatures = {
    val bytes = if (row.payload == null) Array.emptyByteArray else row.payload
    val len = bytes.length
    // fake "image dimensions": derived from length, deterministic
    val width = 64 + (len % 512)
    val height = 64 + ((len / 7) % 512)
    val nFrames = if (row.kind == "video") 1 + (len % 30) else 1
    val feats = new Array[Float](featDim)
    var i = 0
    while (i < len) {
      feats(i % featDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    var j = 0
    while (j < featDim) { feats(j) = feats(j) / math.max(1, len).toFloat; j += 1 }
    MediaFeatures(row.media_id, row.kind, len.toLong, width, height, nFrames, feats)
  }

  /** The fixture set ships no media table, so media rows are derived from
    * `documents` (text bytes as the opaque payload) — exercising the same
    * binary-column plumbing a real corpus would use.
    */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Batched decode stage: one decode call per row, iterated per partition
    * (codec/context init would amortize per-partition here).
    */
  def decodeFeatures(media: Dataset[MediaRow], featDim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => decodeStub(r, featDim)))
  }

  /** Frame-sampling for "video" rows: every strideBytes-th byte starts a
    * fake frame; emits (media_id, frame_no, frame_hash). Real pipelines
    * sample frames the same shape — 1 row in, N bounded rows out.
    */
  def sampleFrames(media: Dataset[MediaRow], maxFrames: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val n = math.min(maxFrames, math.max(1, r.payload.length / 64))
      (0 until n).map { f =>
        val start = f * (r.payload.length / math.max(1, n))
        val end = math.min(r.payload.length, start + 64)
        val slice = java.util.Arrays.copyOfRange(r.payload, start, end)
        (r.media_id, f, java.util.Arrays.hashCode(slice).toLong)
      }
    }.toDF("media_id", "frame_no", "frame_hash")
  }

  /** Fake "resize": deterministic byte-stride downsample of the payload to
    * at most `targetBytes` bytes (stands in for image resizing — same
    * 1-row-in/1-smaller-row-out shape and bounded-output contract a real
    * resampler has).
    */
  def resize(media: Dataset[MediaRow], targetBytes: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val n = if (r.payload == null) 0 else r.payload.length
      if (n <= targetBytes) r
      else {
        val stride = math.max(1, n / targetBytes)
        val out = Array.ofDim[Byte]((n + stride - 1) / stride)
        var i = 0
        var j = 0
        while (i < n && j < out.length) { out(j) = r.payload(i); i += stride; j += 1 }
        r.copy(payload = out)
      }
    })
  }

  /** SQL-expressible metadata over the binary column (octet length, prefix
    * hash) — this slice is oracle-checkable in DuckDB.
    */
  def metadata(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      length(encode(col("text"), "UTF-8")).cast("bigint").as("byte_len"),
      substring(col("text"), 1, 8).as("head8"))
}
