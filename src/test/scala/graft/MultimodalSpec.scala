package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalOps

/** The mapPartitions decode pipeline: typed plumbing is real, the codec
  * is a deterministic stub (round brief: decode STUBBED, plumbing real). */
class MultimodalSpec extends AnyFunSuite {
  import TestBase._

  test("decode pipeline yields one metadata row per asset with 8-dim features") {
    val metas = MultimodalOps.decoded(spark, sf0001).collect()
    assert(metas.length == 500)
    assert(metas.forall(_.features.length == 8))
    assert(metas.forall(m => m.width >= 64 && m.height >= 64 && m.frames >= 1))
    assert(metas.filter(_.kind == "video").forall(_.frames >= 1))
  }

  test("decode is deterministic across runs") {
    val a = MultimodalOps.decoded(spark, sf0001).collect()
      .map(m => (m.asset_id, m.width, m.height, m.frames, m.features.toSeq)).sortBy(_._1)
    val b = MultimodalOps.decoded(spark, sf0001).collect()
      .map(m => (m.asset_id, m.width, m.height, m.frames, m.features.toSeq)).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("resize bounds every asset's bytes to the target dims, partition-locally") {
    val out = MultimodalOps.resized(spark, sf0001, 32, 32).collect()
    assert(out.length == 500)
    assert(out.forall(r => r.media.length == 32 * 32 && r.width == 32 && r.height == 32))
  }

  test("frame sampling emits every 2nd frame with the stub's byte slice") {
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
    val metas = Seq(
      MultimodalOps.AssetMeta(1L, "video", 100, 64, 64, 0, Array.fill(8)(0f)),
      MultimodalOps.AssetMeta(2L, "video", 100, 64, 64, 4, Array.fill(8)(0f)),
      MultimodalOps.AssetMeta(3L, "image", 100, 64, 64, 1, Array.fill(8)(0f))
    ).toDS()
    val frames = MultimodalOps.sampleFrames(metas, 2).collect()
    assert(!frames.exists(_.asset_id == 1L), "corrupt asset must emit no frames")
    assert(frames.filter(_.asset_id == 2L).map(_.idx).sorted.toSeq == Seq(0, 2))
    assert(!frames.exists(_.asset_id == 3L), "non-video must emit no frames")
  }

  test("a non-positive sampling stride is rejected loudly") {
    import spark.implicits._
    val metas = Seq(
      MultimodalOps.AssetMeta(1L, "video", 100, 64, 64, 4, Array.fill(8)(0f))).toDS()
    val ex = intercept[IllegalArgumentException] {
      MultimodalOps.sampleFrames(metas, 0)
    }
    assert(ex.getMessage.contains("stride"))
  }

  test("mapPartitions metadata agrees with the SQL-expressible q_multimodal_meta slice") {
    import org.apache.spark.sql.functions._
    val fromPipeline = MultimodalOps.decoded(spark, sf0001)
      .groupBy("kind").agg(count(lit(1)).as("n"), sum(col("byte_len")).as("total_bytes"))
    val fromQuery = MultimodalOps.multimodalMeta(spark, sf0001)
      .select(col("kind"), col("n"), col("total_bytes"))
    assert(collectSet(fromPipeline) == collectSet(fromQuery))
  }
}
