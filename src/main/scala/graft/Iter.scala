package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.slf4j.LoggerFactory

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
  * Checkpoint-file GC (r17 ADVICE): reliable checkpoint files are NOT
  * reclaimed by default — `spark.cleaner.referenceTracking
  * .cleanCheckpoints` defaults to false, so every round of an N-round
  * loop would leave its files in the shared store for the life of the
  * application. Two mechanisms close that: [[GraftSession]] sets the
  * cleaner key to true at context build (ContextCleaner then deletes a
  * cut's files as soon as its RDD is garbage-collected, i.e. when the
  * loop reassigns `cur` — the within-session story), and the first
  * [[cut]] that adopts the dir registers an application-end listener
  * that deletes the minted per-context subdir outright (the
  * end-of-session story, and the backstop for sessions built without
  * GraftSession). A deployment that needs checkpoint files to OUTLIVE
  * the application (external recovery) must use its own
  * `sc.setCheckpointDir` + `df.checkpoint()` — these cuts are
  * intra-session lineage truncations, never recovery artifacts.
  *
  * Local runs (tests, the bench, the verify gate) leave the key unset
  * and keep the fused-job local form — zero behavior change, and
  * IterCutSpec pins that both forms return identical results (the CC
  * loop and the markov matrix-chain shape).
  */
object Iter {
  private val log = LoggerFactory.getLogger(getClass)

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
        sc.getCheckpointDir match {
          case None =>
            // setCheckpointDir mints a fresh UUID subdir per call — set
            // once per context, not per cut; GC the minted subdir when
            // the application ends (see the checkpoint-file GC note)
            sc.setCheckpointDir(dir)
            registerCheckpointGc(sc)
          case Some(existing) if !descends(existing, dir, sc) =>
            // something else (user code, another library) set a
            // checkpoint dir first: Spark has no re-set semantics we
            // can safely apply mid-session, so the cut lands there —
            // name both paths so a misrouted checkpoint is diagnosable
            if (warned.add(s"${sc.applicationId}:$existing:$dir"))
              log.warn(
                s"$CheckpointDirKey=$dir is set, but the SparkContext " +
                  s"already has checkpoint dir $existing (set before this " +
                  "cut ran); reliable cuts will be written THERE, and " +
                  "changing the conf mid-session has no effect")
          case _ => ()
        }
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }

  private val warned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Does `child` live under `root` once both are fully qualified?
    * (sc.getCheckpointDir returns a qualified URI — `file:/...` — while
    * the conf value is usually a bare path.) */
  private def descends(child: String, root: String, sc: SparkContext): Boolean =
    try {
      def qual(p: String) = {
        val hp = new Path(p)
        hp.getFileSystem(sc.hadoopConfiguration).makeQualified(hp)
          .toString.stripSuffix("/")
      }
      val c = qual(child)
      val r = qual(root)
      c == r || c.startsWith(r + "/")
    } catch { case _: Exception => false }

  /** Delete the minted per-context checkpoint subdir when the
    * application ends. Registered exactly once, by the cut that called
    * setCheckpointDir (so only a dir WE minted is ever deleted). */
  private def registerCheckpointGc(sc: SparkContext): Unit =
    sc.getCheckpointDir.foreach { minted =>
      val hadoopConf = sc.hadoopConfiguration
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          try {
            val p = new Path(minted)
            p.getFileSystem(hadoopConf).delete(p, true)
          } catch { case ex: Exception =>
            log.warn(s"could not GC checkpoint dir $minted: $ex")
          }
      })
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
    * persist()).
    *
    * LIFECYCLE (r17 ADVICE): shared entries are deliberately never
    * unpersisted by their builders — CacheManager's plan-dedup is what
    * lets consecutive queries reuse one cache entry (measured faster,
    * r17 A/B), and no single caller can know it is the last consumer.
    * The entries are MEMORY_AND_DISK, so memory pressure demotes them
    * to disk and Spark's LRU evicts block-by-block; eviction is SAFE
    * (every shared frame keeps deterministic lineage — that was the
    * point of the r17 localCheckpoint conversion) and costs only
    * recompute. What LRU does NOT bound is the session-lifetime disk
    * footprint of entries that are never touched again: a long-lived
    * session running many distinct queries should call
    * [[clearShared]] between query BATCHES (not between queries —
    * that forfeits the sharing) or whenever executor storage reads
    * over budget. Bench/Verify sessions are one batch by construction
    * and need no eviction (footprint measured r18, BASELINE.md). */
  def share(df: DataFrame): DataFrame =
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist()
    else df

  /** Session-level eviction for the [[share]] regime: drops EVERY
    * cached Dataset entry in the session (shared frames have no owner
    * by design, so the eviction unit is the batch boundary, not the
    * entry). Callers that persist() with their own lifecycle already
    * unpersist in `finally` and lose nothing but cache warmth. */
  def clearShared(s: SparkSession): Unit = s.catalog.clearCache()

  /** `df.iterCut(eager)` / `df.shared` sugar so call sites read like
    * the checkpoint they replace. */
  implicit class IterOps(private val df: DataFrame) extends AnyVal {
    def iterCut(eager: Boolean): DataFrame = cut(df, eager)
    def shared: DataFrame = share(df)
  }
}
