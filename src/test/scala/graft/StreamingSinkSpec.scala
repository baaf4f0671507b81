package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** The streaming-sink exactly-once story (q_upsert_stream): the
  * foreachBatch merge-upsert's final state must be invariant to batch
  * slicing, re-runs, and re-delivered rows — because the merge
  * ([[StreamingOps.latestState]]) is an argmax semilattice, not a
  * blind append. Each property is asserted, not assumed. */
class StreamingSinkSpec extends AnyFunSuite {
  import TestBase._

  /** µs-timestamp events fixture written as several parquet files so
    * maxFilesPerTrigger produces genuinely different batch slicings. */
  private lazy val srcDir: String = {
    val dir = tmpDir("sink_src")
    val rows = Seq(
      // user 1, click: three versions across files — latest (ts 300) wins
      (1L, 100L, 1L, "click", 1.0),
      (4L, 300L, 1L, "click", 3.0),
      (2L, 200L, 1L, "click", 2.0),
      // user 1, purchase: single row
      (3L, 150L, 1L, "purchase", 9.0),
      // user 2: equal-ts tie broken by event_id (7 beats 6)
      (6L, 500L, 2L, "click", 5.0),
      (7L, 500L, 2L, "click", 6.0),
      // user 3: value legitimately null-free single row
      (8L, 700L, 3L, "view", 0.5))
    import TestBase.spark.implicits._
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
              col("user_id"), col("event_type"), col("value"),
              lit("{}").as("props"))
      .repartition(4) // several files → several micro-batches at fpt=1
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def stateSet(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    collectSet(df.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts)"), col("event_id"), col("value")))

  private lazy val batchTruth: Set[Seq[Any]] =
    stateSet(StreamingOps.latestState(
      spark.read.schema(StreamingOps.eventsMicros).parquet(srcDir)))

  test("merge is idempotent, commutative, and absorbs re-delivery") {
    val all = spark.read.schema(StreamingOps.eventsMicros).parquet(srcDir)
      .select(col("user_id"), col("event_type"), col("ts"),
              col("event_id"), col("value")) // the state-column shape
    val a = all.filter(col("event_id") <= 4)
    val b = all.filter(col("event_id") > 4)
    def m(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      StreamingOps.latestState(x.unionByName(y))
    val ab = stateSet(m(StreamingOps.latestState(a), b))
    val ba = stateSet(m(StreamingOps.latestState(b), a))
    assert(ab == ba, "merge is not commutative")
    assert(ab == batchTruth, "merged state != batch truth")
    // re-delivery: merging the same delta twice changes nothing
    val once = StreamingOps.latestState(m(StreamingOps.latestState(a), b))
    val twice = m(once, b)
    assert(stateSet(twice) == ab, "re-delivered delta changed the state")
  }

  test("final sink state is invariant to micro-batch slicing") {
    val fine = StreamingOps.drainUpsert(spark, srcDir, tmpDir("sink_w1"), 1)
    val coarse = StreamingOps.drainUpsert(spark, srcDir, tmpDir("sink_w4"), 4)
    assert(stateSet(fine) == batchTruth,
      "file-at-a-time drain diverged from batch truth")
    assert(stateSet(coarse) == batchTruth,
      "single-batch drain diverged from batch truth")
  }

  test("re-running the drain against the same sink is a no-op") {
    val work = tmpDir("sink_rerun")
    val first = stateSet(StreamingOps.drainUpsert(spark, srcDir, work, 1))
    assert(first == batchTruth)
    // same work dir, checkpoint intact, no new source files: zero
    // batches run and the sink state is byte-for-byte the same version
    val second = stateSet(StreamingOps.drainUpsert(spark, srcDir, work, 1))
    assert(second == first, "re-run mutated the sink state")
  }

  test("equal-timestamp conflict resolves by event_id on every path") {
    val st = StreamingOps.drainUpsert(spark, srcDir, tmpDir("sink_tie"), 2)
      .filter(col("user_id") === 2)
      .collect()
    assert(st.length == 1)
    assert(st(0).getAs[Long]("event_id") == 7L,
      s"tie broken wrong: ${st(0)}")
    assert(st(0).getAs[Double]("value") == 6.0)
  }
}
