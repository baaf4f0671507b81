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

  test("mapPartitions metadata agrees with the SQL-expressible q_multimodal_meta slice") {
    import org.apache.spark.sql.functions._
    val fromPipeline = MultimodalOps.decoded(spark, sf0001)
      .groupBy("kind").agg(count(lit(1)).as("n"), sum(col("byte_len")).as("total_bytes"))
    val fromQuery = MultimodalOps.multimodalMeta(spark, sf0001)
      .select(col("kind"), col("n"), col("total_bytes"))
    assert(collectSet(fromPipeline) == collectSet(fromQuery))
  }
}
