package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column processing: images/audio/video as opaque binary columns
  * with typed metadata, processed batch-wise on executors.
  *
  * The decode step itself (JPEG/WAV/H.264) needs native libraries that are
  * not in this container, so `FakeDecoder` is a clearly-marked deterministic
  * stand-in — but the Spark-side plumbing is real and tested: schema
  * (binary payload + struct metadata), partition-parallel `mapPartitions`
  * over a typed Dataset (the Scala analogue of `mapInPandas` batch UDFs),
  * and a stable output schema downstream stages can rely on.
  *
  * Scale: decode is embarrassingly parallel; the only knobs that matter at
  * 100 TB are input split size (spark.sql.files.maxPartitionBytes vs media
  * object size) and avoiding any shuffle before the decode — this pipeline
  * has none (map-only until the caller aggregates features).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
      meta_lang: String, meta_chars: Long)
  case class MediaFeatures(doc_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  /** The decode extension point: a codec-bearing deployment implements this
    * one method (JPEG/WAV/H.264 via its native libs) and passes it to
    * [[decodeFeatures]] — no operator, schema, or partitioning code changes.
    * Implementations must be Serializable (they ship to executors) and
    * deterministic per payload (reruns/retries must agree). */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRow): MediaFeatures
  }

  /** STUB: deterministic fake decode — derives pseudo width/height/frames
    * and an 8-dim feature vector from the payload bytes. A real deployment
    * swaps this for an image/audio codec; everything around it stays. */
  object FakeDecoder extends MediaDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val bytes = r.payload
      val h = java.util.Arrays.hashCode(bytes)
      val width = 64 + math.abs(h % 1024)
      val height = 64 + math.abs((h / 1024) % 1024)
      val frames = if (r.kind == "video") 1 + math.abs(h % 32) else 1
      val feat = Array.tabulate(8) { i =>
        if (bytes.isEmpty) 0f
        else bytes(i * math.max(bytes.length / 8, 1) % bytes.length).toFloat / 127f
      }
      MediaFeatures(r.doc_id, r.kind, bytes.length, width, height, frames, feat)
    }
  }

  /** Binary-ingest view over `documents` (payload = utf8 bytes stands in for
    * a media object; metadata typed alongside). */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select($"doc_id",
        when($"doc_id" % 3 === 0, "image")
          .when($"doc_id" % 3 === 1, "audio").otherwise("video").as("kind"),
        $"text".cast(BinaryType).as("payload"),
        $"lang".as("meta_lang"),
        $"n_chars".as("meta_chars"))
      .as[MediaRow]
  }

  /** The batch decode stage: partition-parallel, no shuffle. The decoder is
    * pluggable ([[MediaDecoder]]); the default is the documented stub. */
  def decodeFeatures(media: Dataset[MediaRow],
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decoder.decode))
  }

  /** Frame-sampling shape: explode a video payload into every k-th "frame"
    * (byte-window stand-in), keyed for downstream grouping. */
  def sampleFrames(media: Dataset[MediaRow], every: Int, window: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.kind != "video") Iterator.empty
      else r.payload.grouped(window).zipWithIndex.collect {
        case (chunk, i) if i % every == 0 => (r.doc_id, i, chunk)
      }
    }.toDF("doc_id", "frame_no", "frame_bytes")
  }
}
