package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CurationOps

/** [[graft.Iter.cut]] (r17, the r16 verdict's executor-loss ask): the
  * iterative loops' lineage cut must behave identically in its local
  * form (default: localCheckpoint — fused-job, fails loudly on block
  * loss) and its cluster form (graft.iter.checkpoint.dir set: reliable
  * checkpoint that survives executor loss). This pins the two forms to
  * identical results on the loop that matters most — connected
  * components, both engines — so a production deployment can flip the
  * key without a behavior audit. */
class IterCutSpec extends AnyFunSuite {
  import TestBase._

  /** Two 3-vertex chains + one isolated pair: exercises multi-round
    * propagation (the chain 1-2-3 needs two hops) on both engines. */
  private def edges() = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (20L, 21L))
      .toDF("d1", "d2")
  }

  private def run(): (Seq[(Long, Long)], Seq[(Long, Long)]) = {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("component"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    (rows(CurationOps.ccMinLabel(edges())), rows(CurationOps.ccStars(edges())))
  }

  test("reliable-checkpoint form returns identical components to the local form") {
    val localForm = run()
    val dir = java.nio.file.Files.createTempDirectory("graft_iter_ckpt")
      .toString
    spark.conf.set(Iter.CheckpointDirKey, dir)
    try {
      val reliableForm = run()
      assert(reliableForm == localForm,
        "reliable-checkpoint cut diverged from the local cut")
      // the reliable form actually checkpointed: files exist under the
      // context's checkpoint dir (minted once, inside `dir`)
      val ckptRoot = spark.sparkContext.getCheckpointDir
      assert(ckptRoot.isDefined && ckptRoot.get.contains("graft_iter_ckpt"),
        s"checkpoint dir not adopted: $ckptRoot")
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "no reliable checkpoint files were written")
    } finally {
      spark.conf.unset(Iter.CheckpointDirKey)
      // NOTE the SparkContext checkpoint dir itself cannot be unset;
      // with the session key removed, Iter.cut ignores it again.
    }
  }

  test("expected components on both engines (sanity of the fixture)") {
    val (minLabel, stars) = run()
    val want = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
                   10L -> 10L, 11L -> 10L, 12L -> 10L,
                   20L -> 20L, 21L -> 20L)
    assert(minLabel == want)
    assert(stars == want)
  }
}
