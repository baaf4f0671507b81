package graft.operators

import graft.{Fin, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support (round brief): image/audio/video travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract run as partition-local batch functions.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): `FakeCodec.decode` derives deterministic pseudo-metadata
  * and features from the bytes. Everything around it — the schema, the
  * `Dataset[T]` encoders, the mapPartitions batch shape, the
  * partitioning — is real and is what matters at 100 TB:
  *
  *  - assets stay as one `binary` column; never exploded into rows of
  *    pixels (that 1000×es the shuffle volume);
  *  - decode is `mapPartitions`, so a real codec would amortize its init
  *    (model load, JNI handle) once per partition, not once per row;
  *  - extracted features land in an `array<float>` column that feeds the
  *    existing similarity/centroid operators (LlmOps).
  */
object MultimodalOps {
  import Fin._

  /** An opaque media asset: id + raw bytes + declared kind. */
  case class Asset(asset_id: Long, kind: String, media: Array[Byte])

  /** Typed metadata a real decoder would emit. */
  case class AssetMeta(asset_id: Long, kind: String, byte_len: Int,
                       width: Int, height: Int, frames: Int,
                       features: Array[Float])

  /** Deterministic stand-in for an image/audio decoder. A production
    * build replaces `decode` with a real codec behind the same
    * signature; the pipeline shape does not change. */
  object FakeCodec {
    def decode(a: Asset): AssetMeta = {
      val n = a.media.length
      // Deterministic pseudo-metadata from content, no RNG.
      val w = 64 + (n % 640)
      val h = 64 + ((n * 7) % 480)
      val frames = if (a.kind == "video") 1 + (n % 10) else 1
      val feats = Array.tabulate(8) { i =>
        // rolling byte aggregate per stripe — stable feature stub
        var acc = 0L
        var j = i
        while (j < n) { acc = acc * 31 + (a.media(j) & 0xff); j += 8 }
        (acc % 1000).toFloat / 1000.0f
      }
      AssetMeta(a.asset_id, a.kind, n, w, h, frames, feats)
    }
  }

  /** Build a binary-column asset table from `documents` (the only bytes
    * available in the test image); partition-preserving. */
  def assets(s: SparkSession, d: String): Dataset[Asset] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id").as("asset_id"),
              when(col("doc_id") % 3 === 0, "image")
                .when(col("doc_id") % 3 === 1, "audio")
                .otherwise("video").as("kind"),
              encode(col("text"), "UTF-8").as("media"))
      .as[Asset]
  }

  /** The decode pipeline: mapPartitions so a real codec initializes once
    * per partition. Returns the typed metadata Dataset. */
  def decoded(s: SparkSession, d: String): Dataset[AssetMeta] = {
    import s.implicits._
    assets(s, d).mapPartitions { it =>
      // real build: val codec = HeavyCodec.init() here, once
      it.map(FakeCodec.decode)
    }
  }

  /** A resized asset: same bytes contract, new declared dimensions. */
  case class Resized(asset_id: Long, width: Int, height: Int, media: Array[Byte])

  /** Resize plumbing: partition-local, output bytes bounded by the
    * target dims (stub: truncate/pad to w*h bytes — a real scaler slots
    * in behind the same signature). The point at 100 TB: resize happens
    * WHERE the bytes already are (no shuffle), and output size becomes a
    * function of the target dims, not the source. */
  def resized(s: SparkSession, d: String, w: Int, h: Int): Dataset[Resized] = {
    import s.implicits._
    assets(s, d).mapPartitions { it =>
      it.map { a =>
        val out = java.util.Arrays.copyOf(a.media, w * h)
        Resized(a.asset_id, w, h, out)
      }
    }
  }

  /** One sampled frame of a video asset. */
  case class Frame(asset_id: Long, idx: Int, n_bytes: Int)

  /** Frame sampling: every `everyN`-th frame of each video, emitted as
    * one row per sampled frame through the typed decode path. Frame
    * payload size is byte_len/frames (integer division — deterministic
    * stub for the per-frame slice a real demuxer would hand over).
    *
    * Corrupt-asset guard: a real demuxer can report `frames <= 0` for a
    * truncated/invalid container. Such assets yield ZERO frame rows
    * (filtered before the byte_len/frames division) instead of killing
    * the whole pipeline with an ArithmeticException. */
  def sampleFrames(metas: Dataset[AssetMeta], everyN: Int): Dataset[Frame] = {
    require(everyN > 0, s"frame sampling stride must be positive, got $everyN")
    import metas.sparkSession.implicits._
    metas.filter(m => m.kind == "video" && m.frames > 0).flatMap { m =>
      val frameLen = m.byte_len / m.frames
      (0 until m.frames by everyN).map(i => Frame(m.asset_id, i, frameLen))
    }
  }

  def frameSample(s: SparkSession, d: String, everyN: Int): Dataset[Frame] =
    sampleFrames(decoded(s, d), everyN)

  /** q_multimodal_frames — frame sampling under the oracle gate, and
    * with it the WHOLE typed pipeline it runs through (mapPartitions
    * decode → filter → flatMap): per video asset, the count and total
    * bytes of every-2nd-frame samples. The oracle mirrors the stub's
    * integer arithmetic; a real codec changes the numbers, not the
    * plan. */
  def multimodalFrames(s: SparkSession, d: String): DataFrame = {
    ord(
      frameSample(s, d, 2).toDF()
        .groupBy(col("asset_id"))
        .agg(count(lit(1)).as("n_sampled"),
             sum(col("n_bytes")).as("sampled_bytes")),
      col("asset_id"))
  }

  /** q_multimodal_meta — oracle-checkable slice of the pipeline: the
    * metadata that is pure byte arithmetic (and therefore expressible in
    * DuckDB SQL too). The mapPartitions path is covered in the test
    * suite against this same arithmetic. */
  def multimodalMeta(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val blen = length(encode(col("text"), "UTF-8"))
    ord(
      docs.select(
          col("doc_id").as("asset_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("kind"),
          blen.as("byte_len"),
          (lit(64) + blen % 640).as("width"),
          (lit(64) + (blen * 7) % 480).as("height"))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
             sum(col("byte_len")).as("total_bytes"),
             r4(avg(col("width"))).as("avg_width"),
             r4(avg(col("height"))).as("avg_height")),
      col("kind"))
  }
}
