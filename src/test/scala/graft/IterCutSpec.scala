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

  test("reliable form is identical on the markov matrix-CHAIN shape") {
    // q_attribution_markov chains four iterCut frames (trans → chId →
    // dense → it) — the shape that actually broke in r17's persist
    // conversion (k^depth analysis tree) and the one the r17 verdict
    // asked to pin beyond the CC loop: cuts feeding cuts, lazy, with
    // broadcast diamonds between layers. Results are fully
    // deterministic (SURVEY §2.10: r4-rounded shares over an exact
    // sorted-fold), so the two forms must match EXACTLY.
    def rows() = graft.operators.WindowOps
      .attributionMarkov(spark, TestBase.sf0001)
      .collect().map(_.toSeq).toSeq
    val localForm = rows()
    // reuse the context's minted dir when the CC test already set one
    // (setCheckpointDir is once-per-context); mint a fresh root when
    // this test runs alone
    val dir = spark.sparkContext.getCheckpointDir.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_iter_ckpt").toString)
    spark.conf.set(Iter.CheckpointDirKey, dir)
    try {
      val before = rddDirs(dir)
      val reliableForm = rows()
      assert(reliableForm == localForm,
        "reliable-checkpoint markov chain diverged from the local form")
      assert(localForm.nonEmpty, "markov fixture returned no channels")
      // the chain actually wrote reliable checkpoints: at least one NEW
      // rdd-* checkpoint dir appeared. Compared as a SET of names, not
      // a file count — GraftSession sets cleanCheckpoints=true, so the
      // ContextCleaner may delete EARLIER tests' checkpoint files
      // concurrently and a raw count can fail to increase even though
      // this chain wrote its checkpoints (observed flaky under full-
      // suite load, r18)
      assert((rddDirs(dir) -- before).nonEmpty,
        "no reliable checkpoint files were written by the markov chain")
    } finally spark.conf.unset(Iter.CheckpointDirKey)
  }

  /** Names of rdd-* checkpoint subdirs under `dir` (one per
    * checkpointed RDD — creation proves a reliable write even when the
    * cleaner concurrently removes other entries). */
  private def rddDirs(dir: String): Set[String] = {
    val p =
      if (dir.startsWith("file:"))
        java.nio.file.Paths.get(java.net.URI.create(dir))
      else java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) Set.empty
    else {
      val s = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(q => java.nio.file.Files.isDirectory(q) &&
            q.getFileName.toString.startsWith("rdd-"))
          .map(_.toString).toSet
      } finally s.close()
    }
  }

  private def ckptFiles(dir: String): Long = {
    // sc.getCheckpointDir returns a qualified URI (file:/...), the
    // conf value a bare path — accept both
    val p =
      if (dir.startsWith("file:"))
        java.nio.file.Paths.get(java.net.URI.create(dir))
      else java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      val s = java.nio.file.Files.walk(p)
      try s.filter(q => java.nio.file.Files.isRegularFile(q)).count()
      finally s.close()
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

  /** r19 (r18 verdict ask #4): the `.shared` regime's batch-boundary
    * eviction policy is [[Iter.clearShared]] — pin that it (a) actually
    * empties the session cache and (b) is recompute-SAFE: a shared
    * frame re-collected after eviction is bit-identical, because every
    * shared frame keeps deterministic lineage (the r17 localCheckpoint
    * conversion's invariant). Bench/Verify sessions are one batch by
    * construction and never call it; long-lived multi-batch sessions
    * call it between batches (BASELINE.md §r18.4 records the measured
    * 20.9 MB single-batch footprint this policy bounds). */
  test("clearShared empties the cache and shared frames recompute identically") {
    import spark.implicits._
    val base = (1 to 500).map(i => (i.toLong % 37, i.toLong)).toDF("k", "v")
    val sh = graft.Iter.share(
      base.groupBy(col("k")).agg(sum(col("v")).as("s")))
    val r1 = sh.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(sh.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE, "share() did not persist")
    assert(!spark.sharedState.cacheManager.isEmpty, "cache empty after share")
    graft.Iter.clearShared(spark)
    assert(spark.sharedState.cacheManager.isEmpty,
      "clearShared left cached entries")
    val r2 = sh.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(r1 == r2, "shared frame diverged after batch-boundary eviction")
  }
}
