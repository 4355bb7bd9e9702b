package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata structs, processed batch-wise.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`fakeDecode`); the Spark-side plumbing
  * — binary column, schema, partition-parallel batch processing through a
  * typed `mapPartitions` (the Scala analogue of `mapInPandas` batch shape) —
  * is real and tested. Swap `fakeDecode` for a codec call and nothing else
  * changes.
  */
object Multimodal {

  case class MediaIn(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(
      doc_id: Long, n_bytes: Long, content_hash: String,
      fake_width: Long, fake_height: Long, fake_frames: Long)

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * A real implementation would decode the container header here. */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (640 + n % 640, 360 + n % 360, 1 + n % 120)
  }

  /** Deterministic frame sampling over the (stubbed) decoded media: every
    * `stride`-th frame index up to the fake frame count — the batch shape a
    * video pipeline uses (explode frames, process per frame, regroup).
    * Returns one row per sampled frame with a content-addressed frame id. */
  def frameSample(docs: org.apache.spark.sql.DataFrame, stride: Int = 10): org.apache.spark.sql.DataFrame = {
    val meta = binaryMeta(docs)
    meta
      .select(col("doc_id"), col("content_hash"), col("fake_frames"),
        explode(sequence(lit(0L), col("fake_frames") - 1, lit(stride.toLong))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        concat(col("content_hash"), lit(":"), col("frame_idx").cast("string")).as("frame_id"))
  }

  case class MediaResized(
      doc_id: Long, out_width: Long, out_height: Long, out_bytes: Long,
      resized_md5: String)

  /** Deterministic stub RESIZE — the down-scaling stage's batch shape
    * (decode → scale → re-encode, per partition, binary in binary out).
    * The stub contract halves each fake dimension and keeps the first
    * ⌈n/4⌉ payload bytes (a quarter of the pixels ⇒ a quarter of the
    * bytes), so the byte stream is bit-deterministic and the oracle can
    * recompute the output hash without a codec; swap the body for a real
    * scaler and the plumbing — typed `mapPartitions` batches, hash-only
    * verification so full media never ships to the driver — is unchanged. */
  def resizeBatch(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val media: Dataset[MediaIn] = docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaIn]
    media.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { m =>
        val (w, h, _) = fakeDecode(m.payload)
        val outBytes = (m.payload.length + 3) / 4
        val resized = java.util.Arrays.copyOfRange(m.payload, 0, outBytes)
        md.reset()
        val hash = md.digest(resized).map("%02x".format(_)).mkString
        MediaResized(m.doc_id, (w / 2).toLong, (h / 2).toLong, outBytes.toLong, hash)
      }
    }.toDF()
  }

  /** Build a binary media column from text (placeholder payload), then
    * extract metadata partition-parallel in typed batches. */
  def binaryMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val media: Dataset[MediaIn] = docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaIn]
    media.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { m =>
        md.reset()
        val hash = md.digest(m.payload).map("%02x".format(_)).mkString
        val (w, h, f) = fakeDecode(m.payload)
        MediaMeta(m.doc_id, m.payload.length.toLong, hash, w.toLong, h.toLong, f.toLong)
      }
    }.toDF()
  }
}
