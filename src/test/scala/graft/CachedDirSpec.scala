package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.CachedDir

/** The once-per-source-state materialization cache behind the
  * day-partitioned events copy, the ingest sink fixture, and the
  * IVF/PQ indexes: build-once semantics, staleness on source change,
  * and corpse replacement. */
class CachedDirSpec extends AnyFunSuite {
  import TestBase._

  private def writeSource(dir: String, rows: Seq[Long]): Unit = {
    import spark.implicits._
    rows.toDF("x").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/src.parquet")
  }

  test("materializes once per source state, rebuilds when the source changes") {
    val dir = tmpDir("cachedir_src")
    writeSource(dir, Seq(1L, 2L, 3L))
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def build(): String =
      CachedDir.materialize(spark, dir, "src.parquet", "cachedir_spec") { tmp =>
        builds.incrementAndGet()
        spark.read.parquet(s"$dir/src.parquet")
          .withColumn("y", col("x") * 2).write.parquet(tmp)
      }
    val d1 = build()
    val d2 = build()
    assert(d1 == d2, "same source state must resolve to the same dir")
    assert(builds.get() == 1, s"write ran ${builds.get()} times for one state")
    assert(spark.read.parquet(d1).count() == 3)

    // regenerate the source: fingerprint changes, cache rebuilds, and
    // the stale copy is pruned
    Thread.sleep(1100) // mtime granularity can be 1s on some filesystems
    writeSource(dir, Seq(1L, 2L, 3L, 4L))
    val d3 = build()
    assert(d3 != d1, "changed source must get a fresh fingerprint dir")
    assert(builds.get() == 2)
    assert(spark.read.parquet(d3).count() == 4)
    assert(!Files.exists(Paths.get(d1)),
      s"stale copy $d1 not pruned after $d3 published")
  }

  test("published paths carry the derivation epoch (reader-semantics barrier)") {
    val dir = tmpDir("cachedir_epoch")
    writeSource(dir, Seq(1L, 2L))
    val d1 = CachedDir.materialize(spark, dir, "src.parquet", "cachedir_epoch_spec") {
      tmp => spark.read.parquet(s"$dir/src.parquet").write.parquet(tmp)
    }
    // The source fingerprint detects regenerated DATA but not changed
    // DERIVATION CODE (r9: caches built from current sources with a
    // unit-buggy reader survived the reader fix). The epoch in the
    // path is the code-version barrier; a bump orphans every
    // prior-epoch dir instead of serving it.
    assert(d1.matches("""/tmp/graft_e\d+_cachedir_epoch_spec_.*"""),
      s"published path carries no epoch: $d1")
  }

  test("a corpse dir without _SUCCESS is replaced, not trusted") {
    val dir = tmpDir("cachedir_corpse")
    writeSource(dir, Seq(7L))
    // first build to learn the destination path, then fake a crash:
    // remove _SUCCESS and poison the content
    val dest = CachedDir.materialize(spark, dir, "src.parquet", "cachedir_corpse") {
      tmp => spark.read.parquet(s"$dir/src.parquet").write.parquet(tmp)
    }
    Files.delete(Paths.get(s"$dest/_SUCCESS"))
    val rebuilt = CachedDir.materialize(spark, dir, "src.parquet", "cachedir_corpse") {
      tmp => spark.read.parquet(s"$dir/src.parquet").write.parquet(tmp)
    }
    assert(rebuilt == dest)
    assert(Files.exists(Paths.get(s"$dest/_SUCCESS")),
      "corpse was not replaced with a complete publish")
    assert(spark.read.parquet(rebuilt).count() == 1)
  }
}
