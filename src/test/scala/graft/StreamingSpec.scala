package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps

/** Streaming == batch equivalence + watermark semantics (SURVEY.md §5.4).
  * Drives Structured Streaming over per-slice parquet dirs with an
  * availableNow-style synchronous drain into a memory sink.
  */
class StreamingSpec extends AnyFunSuite {
  import TestBase._

  /** Write the sf0.001 events (µs form) into n parquet slices. */
  private def sliceEvents(n: Int): String = {
    val dir = tmpDir("stream_src")
    val ev = Tables.events(spark, sf0001)
    ev.withColumn("slice", (col("event_id") % n).cast("int"))
      .repartition(col("slice"))
      .write.mode("overwrite").partitionBy("slice").parquet(dir)
    dir
  }

  private def runToMemory(out: DataFrame, name: String,
                          mode: String): DataFrame = {
    val q = out.writeStream.outputMode(mode)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("streaming tumbling window == batch aggregation") {
    val src = sliceEvents(4)
    val stream = StreamingOps.readEventStream(spark, src)
      .drop("slice")
    val got = runToMemory(StreamingOps.tumblingCounts(stream),
      "t_tumbling", "complete")
    val want = Tables.events(spark, sf0001)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("val"))
    assert(collectSet(got) == collectSet(want))
  }

  test("streaming 6h window counts == batch epoch-aligned buckets") {
    val src = sliceEvents(4)
    val stream = StreamingOps.readEventStream(spark, src).drop("slice")
    val got = runToMemory(StreamingOps.windowTypeCounts(stream),
      "t_topkwin", "complete")
    val want = Tables.events(spark, sf0001)
      .groupBy((expr("unix_timestamp(ts) DIV 21600") * 21600).as("win_sec"),
               col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(collectSet(got) == collectSet(want))
    // windows are 6h epoch-aligned: every start divides 21600
    assert(got.collect().forall(_.getLong(0) % 21600 == 0))
  }

  test("gated sliding stream == batch sliding windows (every event in 2 windows)") {
    val got = StreamingOps.slidingStreamGated(spark, sf0001)
    val want = graft.operators.WindowOps.windowSliding(spark, sf0001)
    assert(collectSet(got) == collectSet(want))
    // multi-assignment: total window rows ≈ 2× the event count
    val events = Tables.events(spark, sf0001).count()
    val winSum = got.agg(sum(col("n"))).head().getLong(0)
    assert(winSum == 2 * events, s"each event lands in exactly 2 windows")
  }

  test("gated bot rate alarm == batch per-(user, minute) threshold screen") {
    val got = StreamingOps.botStreamGated(spark, sf0001)
    val want = Tables.events(spark, sf0001)
      .groupBy(col("user_id"),
               expr("unix_micros(date_trunc('minute', ts))").as("minute_us"))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") >= 2)
    assert(collectSet(got) == collectSet(want))
    // alarms only ever fire on SEALED counts: minute starts are exact
    // minute multiples and every count satisfies the threshold
    val rows = got.collect()
    assert(rows.forall(_.getLong(1) % 60000000L == 0))
    assert(rows.forall(_.getLong(2) >= 2L))
    // the flagged user set matches the batch bot screen
    val batchUsers = graft.operators.WindowOps.botFilter(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == batchUsers)
  }

  test("gated left-outer interval join == batch left join incl. final-hour nulls") {
    val got = StreamingOps.outerJoinStreamGated(spark, sf0001)
    val ev = Tables.events(spark, sf0001)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), expr("unix_micros(ts)").as("c_us"),
              col("event_id").as("cid"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), expr("unix_micros(ts)").as("p_us"),
              col("event_id").as("pid"), col("value"))
    val want = p.join(c,
        col("p_user") === col("c_user") && col("c_us") <= col("p_us") &&
        col("c_us") >= col("p_us") - 3600000000L, "left")
      .select(col("pid").as("purchase_id"),
        coalesce(col("cid"), lit(-1L)).as("click_id"),
        col("p_user").as("user_id"), col("p_us"),
        coalesce(col("c_us"), lit(-1L)).as("c_us"), col("value"))
    assert(collectSet(got) == collectSet(want))
    // the failure mode this pins: a watermark stalled at max(real)−1h
    // (sentinel filtered before the watermark node) silently drops the
    // unmatched purchases in the final hour — every purchase must emit
    assert(got.count() >= p.count(),
      "left-outer must emit at least one row per purchase")
  }

  test("streaming session_window == batch sessionize (session count + event totals)") {
    val src = sliceEvents(3)
    val stream = StreamingOps.readEventStream(spark, src).drop("slice")
    val got = runToMemory(StreamingOps.sessionAgg(stream), "t_sessions", "complete")
    val batch = graft.operators.WindowOps.sessionize(spark, sf0001)
    // same number of sessions per user and same total event count
    val gotPerUser = got.groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
      sum(col("n_events")).as("n_ev"))
    val wantPerUser = batch.groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
      sum(col("n_events")).as("n_ev"))
    assert(collectSet(gotPerUser) == collectSet(wantPerUser))
  }

  test("mapGroupsWithState user profiles converge to the batch aggregate") {
    val src = sliceEvents(4)
    val stream = StreamingOps.readEventStream(spark, src).drop("slice")
    val updates = StreamingOps.userProfileState(spark, stream).toDF()
    runToMemory(updates, "t_profiles", "update")
    // latest update per user == batch profile, on ALL profile fields.
    // "latest" = the update with max n_events (monotonic); max over the
    // struct orders by it, so this stays correct even with negative
    // event values where total_value is non-monotonic.
    val got = spark.table("t_profiles")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("total_value"), col("last_seen_sec"))).as("p"))
      .select(col("user_id"), col("p.n_events").as("n_events"),
              round(col("p.total_value"), 4).as("total_value"),
              col("p.last_seen_sec").as("last_seen_sec"))
    val want = Tables.events(spark, sf0001)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 4).as("total_value"),
           max(unix_timestamp(col("ts"))).as("last_seen_sec"))
    assert(collectSet(got) == collectSet(want))
  }

  test("flatMapGroupsWithState seals sessions identical to batch sessionize") {
    // single-slice source: in-batch gap splitting must seal every
    // session except each user's LAST; the final watermark-advancing
    // batch of AvailableNow may ALSO seal last sessions idle past the
    // horizon via EventTimeTimeout. Contract: everything emitted is an
    // exact batch-sessionize row, and every non-last session is emitted.
    val dir = tmpDir("seal_src")
    Tables.events(spark, sf0001)
      .write.mode("overwrite").parquet(dir)
    val stream = StreamingOps.readEventStream(spark, dir)
    val sealedDf = StreamingOps.sealedSessions(spark, stream).toDF()
      .withColumn("session_value", round(col("session_value"), 4))
    runToMemory(sealedDf, "t_sealed", "append")
    val batch = graft.operators.WindowOps.sessionize(spark, sf0001)
    val lastSid = batch.groupBy("user_id")
      .agg(max(col("sid")).as("sid")).withColumn("open", lit(true))
    val all = batch.select(col("user_id"), col("start_sec"), col("end_sec"),
                           col("n_events"), col("session_value"))
    val nonLast = batch.join(lastSid, Seq("user_id", "sid"), "left")
      .filter(col("open").isNull)
      .select(col("user_id"), col("start_sec"), col("end_sec"),
              col("n_events"), col("session_value"))
    val got = collectSet(spark.table("t_sealed"))
    assert(got.nonEmpty, "no sessions sealed — fixture too sparse")
    assert(got.subsetOf(collectSet(all)),
      "emitted a session that batch sessionize does not contain")
    assert(collectSet(nonLast).subsetOf(got),
      "an in-batch-sealed session was not emitted")
  }

  test("stream-stream interval join == batch range join") {
    val src = sliceEvents(3)
    // two independent file-source streams over the same slices — the
    // general two-stream shape (a self-joined single stream also works)
    val clicks = StreamingOps.readEventStream(spark, src).drop("slice")
    val purchases = StreamingOps.readEventStream(spark, src).drop("slice")
    val got = runToMemory(
      StreamingOps.clickPurchaseJoin(clicks, purchases), "t_ssjoin", "append")
    val ev = Tables.events(spark, sf0001)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
              col("event_id").as("click_id"))
    val want = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
              col("event_id").as("purchase_id"), col("value"))
      .join(c, col("p_user") === col("c_user") &&
               col("c_ts") <= col("p_ts") &&
               col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
              col("p_ts"), col("c_ts"), col("value"))
    assert(got.count() > 0, "interval join matched nothing — fixture too sparse")
    assert(collectSet(got) == collectSet(want))
  }

  test("dropDuplicatesWithinWatermark removes replayed events") {
    val dir = tmpDir("dup_src")
    val t0 = 1700000000L
    val rows = Seq(
      Row(1L, new java.sql.Timestamp(t0 * 1000L), 1L, "view", 1.0, "{}"),
      Row(1L, new java.sql.Timestamp(t0 * 1000L), 1L, "view", 1.0, "{}"), // replay
      Row(2L, new java.sql.Timestamp((t0 + 60) * 1000L), 1L, "click", 2.0, "{}")
    )
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        StreamingOps.eventsMicros)
      .write.mode("overwrite").parquet(dir)
    val stream = StreamingOps.readEventStream(spark, dir)
    val got = runToMemory(StreamingOps.dedupedStream(stream), "t_dedup", "append")
    assert(got.count() == 2, "replayed event_id must be dropped")
  }

  test("availableNow + checkpoint: a resumed drain ingests only files added since") {
    // the reference's high-water-mark sync, Spark-native: the checkpoint
    // remembers which source files each batch committed, so re-running
    // the SAME query over the SAME dir re-reads nothing — only files
    // that appeared since the last drain flow through. This is the
    // contract q_sessionize_stream's cached source relies on.
    val base = tmpDir("resume")
    val (src, cp, out) = (s"$base/src", s"$base/cp", s"$base/out")
    def eventsDf(ids: Seq[Long]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(ids.map(i =>
          Row(i, java.sql.Timestamp.from(
                java.time.Instant.ofEpochSecond(1700000000L + i)),
              1L, "view", 1.0, "{}")), 1),
        StreamingOps.eventsMicros)
    def drain(): Unit = {
      val q = StreamingOps.readEventStream(spark, src)
        .select(col("event_id"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .format("parquet").option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    eventsDf(Seq(1L, 2L, 3L)).write.parquet(src)
    drain()
    assert(spark.read.parquet(out).count() == 3)
    eventsDf(Seq(4L, 5L)).write.mode("append").parquet(src)
    drain()
    // batch-1 files are still in src; exactly-once means ids 1-3 do NOT
    // reappear — each id lands exactly once across both drains
    val got = spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 5L), s"got $got")
  }

  test("late data beyond the watermark is dropped from append-mode aggregation") {
    val dir = tmpDir("late_src")
    val t0 = 1700000000L // batch 1: events up to t0+3h, watermark → t0+2h
    val b1 = Seq(
      Row(1L, new java.sql.Timestamp(t0 * 1000L), 1L, "view", 1.0, "{}"),
      Row(2L, new java.sql.Timestamp((t0 + 3 * 3600) * 1000L), 1L, "view", 1.0, "{}"))
    // batch 2: an event 2 days EARLIER than the watermark — must be dropped
    val b2 = Seq(
      Row(3L, new java.sql.Timestamp((t0 - 2 * 86400) * 1000L), 1L, "view", 9.0, "{}"))
    def write(rows: Seq[Row], f: String): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        StreamingOps.eventsMicros).write.mode("append").parquet(dir)
    write(b1, "b1")
    val agg = StreamingOps.tumblingCounts(
      StreamingOps.readEventStream(spark, dir))
    // single long-lived query: watermark from micro-batch 1 (t0+3h - 1h)
    // must drop the far-late event arriving in micro-batch 2
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("t_late").start()
    q.processAllAvailable()
    write(b2, "b2")
    q.processAllAvailable()
    q.stop()
    val lateRows = spark.table("t_late").filter(col("val") === 9.0).count()
    assert(lateRows == 0, "late event beyond watermark must be dropped")
  }

  test("gated token-bucket limiter: planted burst drains, 10-min gap refills") {
    val dir = tmpDir("ratelimit_fx")
    val t0 = 1700000000L
    // user 1: 8-event 1 Hz burst (cap 5 admits e1-e5, drops e6-e8),
    // then one event 600 s later (10-token refill capped at 5 → admit)
    // → 6 admitted / 3 dropped; user 2: singleton → 1/0
    writeEvents(dir,
      (0 to 7).map(i => eventRow(i.toLong + 1, t0 + i, 1, "view", 1.0)) ++
      Seq(eventRow(9L, t0 + 600, 1, "view", 1.0),
          eventRow(10L, t0, 2, "view", 1.0)))
    val out = StreamingOps.ratelimitStreamGated(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(1L -> ((6L, 3L, 9L)), 2L -> ((1L, 0L, 1L))),
           s"got $out")
  }

  test("gated token-bucket limiter conserves events on real data") {
    val got = StreamingOps.ratelimitStreamGated(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val want = Tables.events(spark, sf0001).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "admitted + dropped must partition every event")
  }
}
