package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A decoded media record: the typed output of the decode stage. */
final case class MediaFeatures(
    doc_id: Long, kind: String, byte_len: Long,
    width: Int, height: Int, n_frames: Int, features: Array[Float])

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata; decode / feature-extract runs
  * partition-batched on executors.
  *
  * The actual codec is STUBBED — this container has no image/audio
  * libraries — with a deterministic fake keyed on the payload bytes, so
  * the Spark-side shape (binary column in, typed Dataset out, per-
  * partition batching, no driver collect) is real and tested while the
  * kernel is swappable for a JNI/Pandas-UDF codec in production.
  */
object Multimodal {

  /** Attach a binary payload column (here: utf-8 of `text` — the corpus
    * has no real media) plus kind metadata derived from the source id.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("source"),
      col("text").cast("binary").as("payload"),
      // pmod, not %: Spark % keeps the dividend's sign, so a negative
      // doc_id would index 0/-1 and throw or wrap instead of cycling.
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"))

  /** STUB decode kernel — deterministic fake standing in for a real
    * codec. Replace the body (only) with e.g. javax.imageio / ffmpeg
    * bindings; signature and call-site shape stay identical.
    */
  private[operators] def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val len = payload.length
    val h   = java.util.Arrays.hashCode(payload)
    val width  = 16 + math.abs(h % 640)
    val height = 16 + math.abs((h / 640) % 480)
    val frames = if (kind == "video") 1 + math.abs(h % 64) else 1
    // 8-dim fake feature vector folded from the bytes, deterministic.
    val feats = new Array[Float](8)
    var i = 0
    while (i < len) { feats(i % 8) += (payload(i) & 0xFF) / 255.0f; i += 1 }
    (width, height, frames, feats)
  }

  /** Decode stage: binary column in, typed Dataset out. Runs per
    * partition on executors — at 100 TB this is the stage you'd size
    * `maxPartitionBytes` around, and the decode batch never leaves the
    * executor.
    */
  def decode(withPayloads: DataFrame): Dataset[MediaFeatures] = {
    import withPayloads.sparkSession.implicits._
    withPayloads
      .select(col("doc_id").cast("long"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val (w, h, f, feats) = decodeStub(kind, payload)
          MediaFeatures(id, kind, payload.length.toLong, w, h, f, feats)
        }
      }
  }

  /** Resize stage (STUB kernel, real plumbing): scale the spatial
    * metadata to fit a bounding box, aspect-preserving. A real codec
    * would transform pixel buffers here; the typed shape, per-partition
    * execution, and downstream schema are identical.
    */
  def resize(decoded: Dataset[MediaFeatures], maxW: Int, maxH: Int): Dataset[MediaFeatures] = {
    require(maxW > 0 && maxH > 0, s"bounding box must be positive, got ${maxW}x$maxH")
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map { m =>
      val scale = math.min(1.0, math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
      // round (not truncate) and clamp: extreme aspect ratios still land
      // as close to the true scaled shape as an integer grid allows
      m.copy(width = math.min(maxW, math.max(1, math.round(m.width * scale).toInt)),
        height = math.min(maxH, math.max(1, math.round(m.height * scale).toInt)))
    })
  }

  /** Frame-sample stage: every `stride`-th frame index per video row,
    * exploded to one row per sampled frame. Stills emit frame 0 only.
    * Row-count amplification happens AFTER the (expensive) decode, which
    * is the ordering that matters at scale.
    */
  def sampleFrames(decoded: Dataset[MediaFeatures], stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    decoded.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride))))
      .select(col("doc_id"), col("kind"), col("frame_idx"), col("width"), col("height"))
  }
}
