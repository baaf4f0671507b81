package graft

import org.apache.spark.sql.DataFrame

/** THE lineage cut for iterative and build-once frames (r17, the r16
  * verdict's executor-loss ask).
  *
  * Why a cut at all: iterative algorithms (connected components, BFS,
  * Lloyd refinement, the Markov power pass) nest their own output into
  * the next round's plan — without truncation the logical plan grows
  * exponentially, analysis cost compounds per round, and Spark's
  * ambiguous-self-join detection trips once a frame derives from the
  * relation it joins back to. `persist()` cannot help here: it caches
  * DATA but keeps the PLAN, so the nesting (and the self-join
  * ambiguity) remains. Truncation is the documented Spark idiom for
  * these shapes.
  *
  * Why it is configurable: `localCheckpoint` stores blocks on executor
  * local storage with NO lineage behind them — on a real cluster a
  * lost executor makes the blocks unrecoverable and the query fails
  * (loudly: the batch job can simply be re-run, and every upstream
  * here is deterministic, so a re-run is bit-identical — SURVEY §2.10).
  * A production deployment that cannot accept the re-run sets
  * [[Iter.CheckpointDirKey]] to a shared path (HDFS/object store) and
  * every cut becomes a RELIABLE checkpoint that survives executor
  * loss — the same interval-checkpoint discipline GraphFrames'
  * connected components ships with. The reliable form pays one extra
  * computation of the cut frame (Spark writes checkpoint files in a
  * follow-up pass); the frames cut here are round-sized (vertex sets,
  * codebooks, day rollups), so that price is the fault-tolerance
  * premium, not a plan regression.
  *
  * Local runs (tests, the bench, the verify gate) leave the key unset
  * and keep the fused-job local form — zero behavior change, and
  * IterCutSpec pins that both forms return identical results.
  */
object Iter {
  /** Session conf key: when set (non-empty), cuts become reliable
    * checkpoints rooted at this path. Unset = local checkpoint. */
  val CheckpointDirKey = "graft.iter.checkpoint.dir"

  /** Cut `df`'s lineage: reliable checkpoint when the session sets
    * [[CheckpointDirKey]], local checkpoint otherwise. `eager`
    * materializes now (stats-pinning build frames); lazy cuts fuse
    * materialization into the first consuming job (the convergence-
    * aggregate fusion the CC loop relies on). */
  def cut(df: DataFrame, eager: Boolean): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(CheckpointDirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = s.sparkContext
        // setCheckpointDir mints a fresh UUID subdir per call — set
        // once per context, not per cut
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }

  /** persist() unless an equivalent plan is already cached. Two
    * queries (or two constructions of the same query — the smoke
    * suite's determinism re-run, the bench after verify) often build
    * byte-identical frames; CacheManager already dedups the ENTRY by
    * canonicalized plan, but a second persist() call on it logs
    * "Asked to cache already cached data" — benign, yet it spams every
    * long-lived session's log. Checking `storageLevel` first (the same
    * cache lookup persist performs) keeps the logs clean and the
    * behavior identical. NOT for frames whose caller manages an
    * unpersist lifecycle (the CC loop's edge frames keep plain
    * persist()). */
  def share(df: DataFrame): DataFrame =
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist()
    else df

  /** `df.iterCut(eager)` / `df.shared` sugar so call sites read like
    * the checkpoint they replace. */
  implicit class IterOps(private val df: DataFrame) extends AnyVal {
    def iterCut(eager: Boolean): DataFrame = cut(df, eager)
    def shared: DataFrame = share(df)
  }
}
