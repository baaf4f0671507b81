package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps
import graft.sources.MediaContainers.Bmp

/** The mapPartitions decode pipeline over REAL containers (r9): the
  * asset builder writes genuine BMP/WAV/concat-BMP bytes, decode
  * parses the headers back, and the recovered metadata must agree with
  * the closed-form arithmetic the oracle uses. */
class MultimodalSpec extends AnyFunSuite {
  import TestBase._

  test("decode pipeline yields one parsed-metadata row per asset") {
    val metas = MultimodalOps.decoded(spark, sf0001).collect()
    assert(metas.length == 500)
    assert(metas.forall(_.features.length == 8))
    assert(metas.forall(_.frames >= 1), "every written container must parse")
    metas.foreach { m =>
      m.kind match {
        case "audio" =>
          assert(m.width == 0 && m.height == 0 && m.frames == 1)
          assert(m.sample_rate == MultimodalOps.WavRate)
        case "image" =>
          assert(m.width >= 4 && m.height >= 4 && m.frames == 1)
          assert(m.sample_rate == 0 && m.duration_ms == 0L)
        case "video" =>
          assert(m.width >= 4 && m.height >= 4 && m.frames >= 1)
          assert(m.duration_ms == m.frames * MultimodalOps.FrameMs)
      }
    }
  }

  test("parsed metadata equals the closed-form arithmetic the oracle uses") {
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "octet_length(encode(text, 'UTF-8')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    MultimodalOps.decoded(spark, sf0001).collect().foreach { m =>
      val n = docs(m.asset_id)
      val (w, h) = MultimodalOps.dimsFor(n)
      val bmpLen = Bmp.fileSize(w, h)
      m.kind match {
        case "image" =>
          assert((m.width, m.height, m.byte_len) == ((w, h, bmpLen)))
        case "audio" =>
          assert(m.byte_len == 44 + 2 * n)
          assert(m.duration_ms == n.toLong * 1000 / 8000)
        case "video" =>
          val f = 1 + n % 10
          assert((m.width, m.height, m.frames) == ((w, h, f)))
          assert(m.byte_len == f * bmpLen)
      }
    }
  }

  test("decode is deterministic across runs") {
    def run() = MultimodalOps.decoded(spark, sf0001).collect()
      .map(m => (m.asset_id, m.width, m.height, m.frames, m.duration_ms,
                 m.features.toSeq)).sortBy(_._1)
    assert(run().sameElements(run()))
  }

  test("resize emits a valid 32x32 container for every BMP-structured asset") {
    val out = MultimodalOps.resized(spark, sf0001, 32, 32).collect()
    // images (doc_id % 3 == 0) + videos (% 3 == 2); audio is not BMP
    assert(out.length == 333)
    assert(out.forall(r => r.width == 32 && r.height == 32))
    assert(out.forall(r =>
      Bmp.parse(r.media).contains(Bmp.Header(32, 32, Bmp.fileSize(32, 32)))))
  }

  test("frame sampling emits every 2nd frame with the parsed per-frame size") {
    val metas = MultimodalOps.decoded(spark, sf0001).collect()
      .filter(_.kind == "video").map(m => m.asset_id -> m).toMap
    val frames = MultimodalOps.frameSample(spark, sf0001, 2).collect()
      .groupBy(_.asset_id)
    assert(frames.keySet == metas.keySet)
    frames.foreach { case (id, fs) =>
      val m = metas(id)
      assert(fs.length == (m.frames + 1) / 2, s"asset $id sampled ${fs.length}")
      assert(fs.forall(_.n_bytes == m.byte_len / m.frames))
      assert(fs.map(_.idx).sorted.toSeq == (0 until m.frames by 2).toSeq)
    }
  }

  test("a corrupt asset (frames=0) yields zero frame rows, not a crash") {
    import spark.implicits._
    val f8 = Array.fill(8)(0f)
    val metas = Seq(
      MultimodalOps.AssetMeta(1L, "video", 100, 64, 64, 0, 0, 0L, f8),
      MultimodalOps.AssetMeta(2L, "video", 100, 64, 64, 4, 0, 160L, f8),
      MultimodalOps.AssetMeta(3L, "image", 100, 64, 64, 1, 0, 0L, f8)
    ).toDS()
    val frames = MultimodalOps.sampleFrames(metas, 2).collect()
    assert(!frames.exists(_.asset_id == 1L), "corrupt asset must emit no frames")
    assert(frames.filter(_.asset_id == 2L).map(_.idx).sorted.toSeq == Seq(0, 2))
    assert(!frames.exists(_.asset_id == 3L), "non-video must emit no frames")
  }

  test("a non-positive sampling stride is rejected loudly") {
    import spark.implicits._
    val metas = Seq(
      MultimodalOps.AssetMeta(1L, "video", 100, 64, 64, 4, 0, 160L,
        Array.fill(8)(0f))).toDS()
    val ex = intercept[IllegalArgumentException] {
      MultimodalOps.sampleFrames(metas, 0)
    }
    assert(ex.getMessage.contains("stride"))
  }

  test("audio stats recover the source payload's acoustic truth sample-exact") {
    import org.apache.spark.sql.functions.col
    val got = MultimodalOps.audioStats(spark, TestBase.sf0001).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val texts = Tables.documents(spark, TestBase.sf0001)
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == texts.keySet)
    texts.foreach { case (id, t) =>
      val abs = t.map(c => (128 - c.toInt) * 256)
      assert(got(id) == ((t.length, abs.max)),
        s"asset $id: parsed ${got(id)} vs source (${t.length}, ${abs.max})")
    }
  }

  test("pixel stats parse dims and byte sums identical to the builder's cycle") {
    import org.apache.spark.sql.functions.col
    val rows = MultimodalOps.pixelStats(spark, TestBase.sf0001).collect()
    val texts = Tables.documents(spark, TestBase.sf0001)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val t = texts(r.getLong(0))
      val (w, h) = MultimodalOps.dimsFor(t.length)
      assert((r.getInt(1), r.getInt(2)) == ((w, h)))
      val stride = (3 * w + 3) & ~3
      val L = stride * h
      assert(r.getInt(3) == L)
      val sum = (0 until L).map(i => t(i % t.length).toLong).sum
      assert(math.abs(r.getDouble(5) - math.rint(sum.toDouble / L * 1e4) / 1e4) < 1e-9)
    }
  }
}
