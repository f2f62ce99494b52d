package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Extracted per-item features of a decoded media payload. */
final case class MediaFeatures(
    media_id: Long,
    n_bytes: Long,
    checksum: Long,
    width: Int,
    height: Int,
    format: String)

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The decode step is a clearly-marked deterministic STUB — image/audio
  * codec libraries are not in this container. Everything Spark-side is real
  * and tested: the binary column schema, the typed `Dataset` boundary, the
  * per-partition batch shape (one decoder init per partition, streamed
  * iterator — the exact shape a JNI/FFI decoder needs at scale), and the
  * columnar hand-off back to SQL.
  */
object Multimodal {

  /** Attach an opaque binary payload column + typed metadata struct — the
    * canonical multimodal table shape (`payload binary, media_meta struct`).
    * Here the payload is the UTF-8 encoding of a text column (the container
    * has no real media), but nothing downstream depends on that.
    */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit("text/plain").as("mime"),
        octet_length(col(textCol)).cast("long").as("declared_bytes")))

  /** Per-partition decode + feature extraction over the binary payload.
    *
    * STUB decode: `fakeDecode` stands in for a real codec call; it is
    * deterministic so results are testable. The partition iterator shape is
    * the real contract — a production decoder would init its native context
    * once per partition exactly here.
    */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { batches =>
        // real decoder init would happen once per partition, here:
        batches.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
      .toDF()
  }

  /** Frame sampling over a video-like binary payload: emit every
    * `everyNth` fixed-size frame as its own row (media_id, frame_idx,
    * frame) — the demux → sample → one-row-per-frame shape a real video
    * pipeline needs before per-frame feature extraction.
    *
    * The "demuxer" is the same documented stub class as [[decodeFeatures]]
    * (fixed `frameBytes` slices stand in for codec frame boundaries); the
    * Spark plumbing is the real contract: a per-partition iterator that
    * FLATMAPS frames out lazily — one demuxer init per partition, no
    * buffering of a whole video's frames in memory, rows stream straight
    * into the downstream columnar batch.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String = "payload",
                   frameBytes: Int = 32, everyNth: Int = 2): DataFrame = {
    require(frameBytes > 0 && everyNth > 0, "frameBytes and everyNth must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { items =>
        // real demuxer/native context init would happen once per partition
        items.flatMap { case (id, bytes) =>
          val nFrames = (bytes.length + frameBytes - 1) / frameBytes
          Iterator.range(0, nFrames, everyNth).map { f =>
            val from = f * frameBytes
            (id, f.toLong, java.util.Arrays.copyOfRange(
              bytes, from, math.min(from + frameBytes, bytes.length)))
          }
        }
      }
      .toDF(idCol, "frame_idx", "frame")
  }

  /** Resize planning over decoded media features: fit (width, height)
    * into a target box preserving aspect ratio — the standard
    * downscale-before-embedding step. Pure integer column arithmetic
    * (codegen'd); the actual pixel resample belongs to the per-partition
    * decoder ([[decodeFeatures]]' stub boundary), but the geometry — what
    * production schedulers size buffers and batch shapes with — is real.
    * Upscaling is not performed (scale capped at 1).
    */
  def resizeToFit(df: DataFrame, targetW: Int, targetH: Int,
                  widthCol: String = "width", heightCol: String = "height"): DataFrame = {
    require(targetW > 0 && targetH > 0, "target box must be positive")
    // scale = min(tw/w, th/h, 1); new dims = max(1, floor(dim * scale))
    val scale = least(
      lit(targetW).cast("double") / col(widthCol),
      lit(targetH).cast("double") / col(heightCol),
      lit(1.0))
    df.withColumn("resized_width",
        greatest(floor(col(widthCol) * scale), lit(1)).cast("int"))
      .withColumn("resized_height",
        greatest(floor(col(heightCol) * scale), lit(1)).cast("int"))
  }

  /** Deterministic stand-in for a media decoder (??? in spirit): derives
    * plausible image-like features purely from the bytes.
    */
  private def fakeDecode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    MediaFeatures(
      media_id = id,
      n_bytes = bytes.length.toLong,
      checksum = h,
      width = 64 + (math.floorMod(h, 512L)).toInt,
      height = 64 + (math.floorMod(h >>> 16, 512L)).toInt,
      format = "stub/raw")
  }
}
