package graft.operators

import graft.{Fin, Tables}
import graft.sources.MediaContainers.{Bmp, Wav}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support: image/audio/video travel as opaque
  * `binary` columns with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as partition-local
  * batch functions.
  *
  * The media decode is REAL as of r9: assets are genuine BMP (image),
  * RIFF/WAVE PCM (audio), and concatenated-BMP (video, one container
  * per frame) byte streams built from the document payloads, and
  * [[decode]] recovers width/height/frames/sample-rate/duration by
  * PARSING the container headers back
  * (graft.sources.MediaContainers — pure-JVM, no codec libraries;
  * both formats are public fixed-layout little-endian structs). The
  * gated queries therefore exercise a full write→parse round trip:
  * the oracle computes the expected fields in closed form from the
  * payload length, so a writer/parser disagreement of even one byte
  * breaks the hash gate.
  *
  * What matters at 100 TB is unchanged:
  *  - assets stay as one `binary` column; never exploded into rows of
  *    pixels (that 1000×es the shuffle volume);
  *  - build and decode are `mapPartitions`, so a heavier codec would
  *    amortize its init (model load, JNI handle) once per partition;
  *  - extracted features land in an `array<float>` column that feeds
  *    the existing similarity/centroid operators (LlmOps).
  */
object MultimodalOps {
  import Fin._

  /** An opaque media asset: id + raw container bytes + declared kind.
    * `kind` is CATALOG metadata (what the asset means); the container
    * structure is never trusted from it — [[decode]] sniffs the magic
    * bytes. It exists because structure alone can't distinguish a
    * single BMP from a 1-frame video. */
  case class Asset(asset_id: Long, kind: String, media: Array[Byte])

  /** Typed metadata the decoder emits. Audio: width=height=0,
    * frames=1; image/video: sample_rate=0. A corrupt container
    * decodes to frames=0 (the downstream corrupt-asset filter), never
    * an exception. */
  case class AssetMeta(asset_id: Long, kind: String, byte_len: Int,
                       width: Int, height: Int, frames: Int,
                       sample_rate: Int, duration_ms: Long,
                       features: Array[Float])

  /** PCM sample rate for audio assets (8 kHz telephone-band mono). */
  val WavRate = 8000

  /** Fixed video frame duration: 25 fps ⇒ 40 ms per frame. */
  val FrameMs = 40L

  /** Deterministic 8-dim feature stub over the container bytes
    * (rolling per-stripe byte hash) — the one remaining stand-in: a
    * real embedding model is a network, not a header parse. Shape
    * (array<float> column from partition-local batches) is what the
    * similarity operators consume. */
  private def features(b: Array[Byte]): Array[Float] =
    Array.tabulate(8) { i =>
      var acc = 0L
      var j = i
      while (j < b.length) { acc = acc * 31 + (b(j) & 0xff); j += 8 }
      (acc % 1000).toFloat / 1000.0f
    }

  /** Deterministic container dims from a payload of n bytes — small
    * enough that a 10-frame video stays under ~100 KB, varied enough
    * to exercise stride padding (w mod 4 takes every value). */
  private[graft] def dimsFor(n: Int): (Int, Int) =
    (4 + n % 60, 4 + (7 * n) % 44)

  /** Build the binary-column asset table from `documents` (the only
    * bytes available in the test image): each doc's UTF-8 payload
    * becomes a REAL container — BMP for image, WAV for audio,
    * concatenated BMPs (1 + n%10 frames) for video. mapPartitions:
    * bytes are assembled where they live, nothing shuffles. */
  def assets(s: SparkSession, d: String): Dataset[Asset] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id").as("asset_id"),
              when(col("doc_id") % 3 === 0, "image")
                .when(col("doc_id") % 3 === 1, "audio")
                .otherwise("video").as("kind"),
              encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val n = payload.length
          val (w, h) = dimsFor(n)
          val media = kind match {
            case "image" => Bmp.write(w, h, payload)
            case "audio" => Wav.write(WavRate, payload)
            case _ =>
              val frame = Bmp.write(w, h, payload)
              val nf = 1 + n % 10
              val out = new Array[Byte](frame.length * nf)
              var f = 0
              while (f < nf) {
                System.arraycopy(frame, 0, out, f * frame.length, frame.length)
                f += 1
              }
              out
          }
          Asset(id, kind, media)
        }
      }
  }

  /** Decode one asset by SNIFFING its container magic and parsing the
    * headers — never by trusting catalog metadata for structure. */
  def decode(a: Asset): AssetMeta = {
    val b = a.media
    val feats = features(b)
    def corrupt = AssetMeta(a.asset_id, a.kind, b.length, 0, 0, 0, 0, 0L, feats)
    if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')
      Wav.parse(b).map { h =>
        AssetMeta(a.asset_id, a.kind, b.length, 0, 0, 1,
                  h.sampleRate, h.durationMs, feats)
      }.getOrElse(corrupt)
    else
      Bmp.parseConcat(b).map { fs =>
        val h0 = fs.head
        val dur = if (a.kind == "video") fs.length * FrameMs else 0L
        AssetMeta(a.asset_id, a.kind, b.length, h0.width, h0.height,
                  fs.length, 0, dur, feats)
      }.getOrElse(corrupt)
  }

  /** The decode pipeline: mapPartitions so a heavier codec initializes
    * once per partition. Returns the typed metadata Dataset. */
  def decoded(s: SparkSession, d: String): Dataset[AssetMeta] = {
    import s.implicits._
    assets(s, d).mapPartitions(_.map(decode))
  }

  /** A resized asset: a fresh, valid container at the new dims. */
  case class Resized(asset_id: Long, width: Int, height: Int, media: Array[Byte])

  /** Real nearest-neighbor resize of every BMP-structured asset
    * (images; a video resizes its first frame — the thumbnail path).
    * Partition-local: resize happens WHERE the bytes already are (no
    * shuffle), and output size becomes a function of the target dims,
    * not the source. Non-BMP / corrupt assets are dropped, not
    * crashed on. */
  def resized(s: SparkSession, d: String, w: Int, h: Int): Dataset[Resized] = {
    import s.implicits._
    assets(s, d).mapPartitions { it =>
      it.flatMap { a =>
        Bmp.parse(a.media).map { hdr =>
          Resized(a.asset_id, w, h, Bmp.resizeNearest(a.media, hdr, w, h))
        }
      }
    }
  }

  /** One sampled frame of a video asset. */
  case class Frame(asset_id: Long, idx: Int, n_bytes: Int)

  /** Frame sampling: every `everyN`-th frame of each video, one row
    * per sampled frame. Frame payload size is byte_len/frames — exact
    * here because the video container is `frames` equal-size BMPs.
    *
    * Corrupt-asset guard: [[decode]] reports `frames = 0` for a
    * truncated/invalid container; such assets yield ZERO frame rows
    * (filtered before the byte_len/frames division) instead of
    * killing the pipeline with an ArithmeticException. */
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
    * with it the whole typed pipeline it runs through (container
    * build → mapPartitions header decode → filter → flatMap): per
    * video asset, the count and total bytes of every-2nd-frame
    * samples. The oracle computes the per-frame container size in
    * closed form from the payload length; the engine recovers it by
    * parsing the frame headers it wrote. */
  def multimodalFrames(s: SparkSession, d: String): DataFrame = {
    ord(
      frameSample(s, d, 2).toDF()
        .groupBy(col("asset_id"))
        .agg(count(lit(1)).as("n_sampled"),
             sum(col("n_bytes")).as("sampled_bytes")),
      col("asset_id"))
  }

  /** q_multimodal_meta — per kind: asset count, total container
    * bytes, average parsed dims, total parsed duration. Every number
    * on the Spark side comes out of the header PARSE of bytes the
    * asset builder wrote; the oracle recomputes them in closed form
    * from payload lengths — a one-byte writer/parser disagreement
    * breaks the hash. */
  def multimodalMeta(s: SparkSession, d: String): DataFrame = {
    ord(
      decoded(s, d).toDF()
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
             sum(col("byte_len")).as("total_bytes"),
             r4(avg(col("width"))).as("avg_width"),
             r4(avg(col("height"))).as("avg_height"),
             sum(col("duration_ms")).as("total_duration_ms")),
      col("kind"))
  }

  /** Per-asset acoustic accumulators parsed out of the PCM DATA bytes
    * (not the header): sample count, peak |amplitude|, Σ|s|, Σs², and
    * the count of near-silent samples (|s| < 2048 ≈ −24 dBFS). */
  case class AudioStats(asset_id: Long, n_samples: Int, peak: Int,
                        sum_abs: Long, sum_sq: Long, n_quiet: Long)

  /** q_audio_stats — CONTENT-level audio decode under the oracle gate:
    * per audio asset, mean |amplitude|, RMS level and the near-silence
    * ratio, computed by parsing the 16-bit PCM samples back out of the
    * WAV data chunk the asset builder wrote. q_multimodal_meta gates
    * the header geometry; this gates the SAMPLES — a one-bit
    * disagreement in any sample byte between writer and parser breaks
    * the hash. (The oracle recomputes the stats in closed form from
    * the source payload chars — documents.text is ASCII by driver
    * contract, asserted loudly by the gate itself if a regeneration
    * ever changes that.)
    *
    * Scale shape: mapPartitions where the bytes live — the sample loop
    * never materializes an array per asset, just five accumulators;
    * output is one narrow row per asset. No shuffle before the final
    * sort.
    *
    * Determinism: all accumulators are exact integers; mean/ratio
    * divide once and r4; RMS is the correctly-rounded IEEE √ of an
    * exact-int division, identical on both engines. */
  def audioStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val st = assets(s, d).mapPartitions { it =>
      it.flatMap { a =>
        if (a.kind != "audio") None
        else Wav.parseWithData(a.media).flatMap { case (_, off, len) =>
          val n = len / 2
          if (n == 0) None
          else {
            var i = 0; var peak = 0; var sabs = 0L; var ssq = 0L; var q = 0L
            while (i < n) {
              val lo = a.media(off + 2 * i) & 0xff
              val s16 = (a.media(off + 2 * i + 1) << 8) | lo // sign from hi byte
              val as = math.abs(s16)
              if (as > peak) peak = as
              sabs += as
              ssq += as.toLong * as
              if (as < 2048) q += 1
              i += 1
            }
            Some(AudioStats(a.asset_id, n, peak, sabs, ssq, q))
          }
        }
      }
    }
    ord(
      st.toDF().select(col("asset_id"), col("n_samples"), col("peak"),
        r4(col("sum_abs").cast("double") / col("n_samples")).as("mean_abs"),
        r4(sqrt(col("sum_sq").cast("double") / col("n_samples"))).as("rms"),
        r4(col("n_quiet").cast("double") / col("n_samples"))
          .as("quiet_ratio")),
      col("asset_id"))
  }

  /** Per-asset pixel-array accumulators parsed from the BMP bytes. */
  case class PixelStats(asset_id: Long, width: Int, height: Int,
                        n_bytes: Int, sum_bytes: Long, max_byte: Int)

  /** q_pixel_stats — CONTENT-level image decode under the oracle gate:
    * per image asset, the mean and max pixel-array byte value read
    * back through the parsed BMP header (offset 54, stride·height
    * bytes). The asset builder fills the pixel array by cycling the
    * payload, so the oracle can recompute Σbytes in closed form —
    * q·Σpayload + prefix(r) for L = q·|payload| + r — from the source
    * chars; the engine must recover the identical numbers from the
    * container bytes alone.
    *
    * Scale shape: identical to q_audio_stats — partition-local byte
    * loop, five accumulators, one narrow row per asset. */
  def pixelStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val st = assets(s, d).mapPartitions { it =>
      it.flatMap { a =>
        if (a.kind != "image") None
        else Bmp.parse(a.media).map { h =>
          val off = Bmp.HeaderLen
          val n = h.fileSize - off
          var i = 0; var sum = 0L; var mx = 0
          while (i < n) {
            val v = a.media(off + i) & 0xff
            sum += v
            if (v > mx) mx = v
            i += 1
          }
          PixelStats(a.asset_id, h.width, h.height, n, sum, mx)
        }
      }
    }
    ord(
      st.toDF().select(col("asset_id"), col("width"), col("height"),
        col("n_bytes"), col("max_byte"),
        r4(col("sum_bytes").cast("double") / col("n_bytes")).as("mean_byte")),
      col("asset_id"))
  }
}
