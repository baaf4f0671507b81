package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps

/** Multi-batch streaming stress at sf0.1 (r10 verdict item 6).
  *
  * The seven gated streaming queries drain their whole history in ONE
  * availableNow catch-up batch — correct, but it never exercises the
  * property the 100 TB story rests on: with real micro-batch
  * progression, state-store size stays O(watermark horizon × keys),
  * not O(stream length), because the advancing watermark evicts sealed
  * state BETWEEN batches.
  *
  * This spec replays the sf0.1 events as TIME-ORDERED file slices (the
  * production arrival order — a file-per-interval ingest dir), forces
  * one slice per micro-batch with maxFilesPerTrigger=1, and asserts on
  * the session aggregation (the heaviest state shape):
  *  - ≥3 real data-carrying micro-batches ran;
  *  - the emitted sealed sessions EQUAL the batch sessionize truth
  *    (append-mode emission across real batch boundaries — the single
  *    catch-up drain can't distinguish in-batch from cross-batch
  *    merging, this run does);
  *  - peak state rows stay well under the total-session count (state
  *    is evicted as the watermark advances — the O(horizon) claim),
  *    and the final batch leaves only the sentinel's open session.
  */
class StreamingScaleSpec extends AnyFunSuite {
  import TestBase._

  private val sf01 = "/root/testdata/sf0.1"

  /** Write events into `n` TIME-RANGE slices (plus a final sentinel
    * file), one parquet file per slice, modification times in slice
    * order so the file stream source replays them oldest-first. */
  private def timeSlicedSource(d: String, n: Int): String = {
    val srcDir = tmpDir("scale_src")
    val ev = Tables.events(spark, d)
      .select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value"), col("props"))
    val mm = ev.agg(min(expr("unix_micros(ts)")), max(expr("unix_micros(ts)"))).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val width = (hi - lo) / n + 1
    def writeOne(df: DataFrame, i: Int): Unit = {
      val t = tmpDir(s"slice$i")
      df.coalesce(1).write.mode("overwrite").parquet(t)
      val part = new java.io.File(t).listFiles
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head
      val dst = java.nio.file.Paths.get(srcDir, f"slice_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1600000000000L + i * 60000L))
    }
    for (i <- 0 until n) {
      val s = ev.filter(expr("unix_micros(ts)") >= lo + i * width &&
                        expr("unix_micros(ts)") < lo + (i + 1) * width)
      writeOne(s, i)
    }
    // far-future sentinel in its OWN last file: its watermark advance
    // seals every real session in the availableNow follow-up batch
    val sentinel = spark.range(1).select(
      lit(-1L).as("event_id"),
      timestamp_micros(lit(hi + 10L * 86400L * 1000000L)).as("ts"),
      lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
      lit(0.0).as("value"), lit("{}").as("props"))
    writeOne(sentinel, n)
    srcDir
  }

  /** Batch truth at µs precision with session_window's merge rule
    * (split only when gap STRICTLY exceeds 30 min). */
  private def batchSessions(d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    Tables.events(spark, d)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("value"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("us") - col("prev") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"), Fin.r4(sum(col("value"))).as("session_value"))
  }

  test("sf0.1 multi-batch drain: ≥3 micro-batches, sessions == batch, state O(horizon)") {
    assume(new java.io.File(s"$sf01/events.parquet").exists(), s"$sf01 not present")
    val src = timeSlicedSource(sf01, 6)

    val stream = spark.readStream.schema(StreamingOps.eventsMicros)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = StreamingOps.sessionAgg(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("t_scale_sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val prog = q.recentProgress.toSeq

    // 1. real micro-batch progression, not one catch-up batch
    val dataBatches = prog.count(_.numInputRows > 0)
    assert(dataBatches >= 3, s"only $dataBatches data-carrying micro-batches")

    // 2. append-mode output across real batch boundaries == batch truth
    val got = spark.table("t_scale_sessions").filter(col("user_id") >= 0)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_ev"),
           Fin.r4(sum(col("session_value"))).as("val"))
    val want = batchSessions(sf01)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_ev"),
           Fin.r4(sum(col("session_value"))).as("val"))
    assert(collectSet(got) == collectSet(want),
      "multi-batch streaming sessions diverge from batch sessionize")

    // 3. state stays bounded by the horizon, not the stream: the peak
    // is ~one slice's sessions (+boundary carryover), far below the
    // total session count a single catch-up batch would hold at once;
    // and after the sentinel's eviction batch only its own open
    // session remains.
    val stateRows = prog.flatMap(_.stateOperators.map(_.numRowsTotal))
    assert(stateRows.nonEmpty, "no state operator metrics reported")
    val peak = stateRows.max
    val totalSessions = batchSessions(sf01).count()
    assert(peak < totalSessions * 6 / 10,
      s"peak state $peak vs $totalSessions total sessions — eviction not happening")
    val finalRows = prog.last.stateOperators.map(_.numRowsTotal).sum
    assert(finalRows <= 2,
      s"final state has $finalRows rows — sealed sessions not evicted")
  }

  test("sf0.1 multi-batch custom-state sessionizer: O(active users) state, batch parity") {
    assume(new java.io.File(s"$sf01/events.parquet").exists(), s"$sf01 not present")
    val src = timeSlicedSource(sf01, 5)

    val stream = spark.readStream.schema(StreamingOps.eventsMicros)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = StreamingOps.sealedSessions(spark, stream).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("t_scale_fmgws")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val prog = q.recentProgress.toSeq
    assert(prog.count(_.numInputRows > 0) >= 3)

    // append-mode sealed sessions across real batch boundaries == batch
    // truth on the order-invariant columns (value parity is covered at
    // suite tolerance in StreamingSpec — fold order within a batch is
    // not contractual)
    val got = spark.table("t_scale_fmgws").filter(col("user_id") >= 0)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_ev"))
    val want = batchSessions(sf01)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_ev"))
    assert(collectSet(got) == collectSet(want),
      "multi-batch custom-state sessions diverge from batch sessionize")

    // the hand-managed state is ONE record per OPEN session — bounded by
    // the user population (the sharpest horizon bound of all the gated
    // shapes), and far below the total session count a catch-up batch
    // accumulates
    val stateRows = prog.flatMap(_.stateOperators.map(_.numRowsTotal))
    val peak = stateRows.max
    val users = Tables.events(spark, sf01).select(col("user_id")).distinct().count()
    val totalSessions = batchSessions(sf01).count()
    assert(peak <= users + 1,
      s"peak custom state $peak exceeds open-session bound (${users + 1})")
    assert(peak < totalSessions / 2,
      s"peak custom state $peak not horizon-bounded vs $totalSessions sessions")
  }
}
