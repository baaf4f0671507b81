package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IngestOps, ReportOps}
import graft.operators.ReportOps.{Metric, ReportSpec}

/** The reference's two user surfaces rebuilt on Spark: incremental
  * high-water-mark ingest with idempotent re-loads, and declarative
  * dimension/metric reports. */
class IngestReportSpec extends AnyFunSuite {
  import TestBase._

  test("incremental append: overlap re-load is idempotent, new rows land once") {
    val sink = tmpDir("ingest_sink") + "/sink"
    val ev = Tables.events(spark, sf0001)
    val keys = Seq("event_id", "user_id", "event_type")

    // initial load: first half of the month
    val b1 = ev.filter(col("ts") < lit("2024-01-15").cast("timestamp"))
    val n1 = IngestOps.incrementalAppend(spark, b1, sink, "ts", keys)
    assert(n1 == b1.count())

    // second batch OVERLAPS (Jan 10 – 31): only post-hwm rows append
    val b2 = ev.filter(col("ts") >= lit("2024-01-10").cast("timestamp"))
    val n2 = IngestOps.incrementalAppend(spark, b2, sink, "ts", keys)
    val total = spark.read.parquet(sink).count()
    assert(total == ev.count(), s"sink=$total events=${ev.count()}")
    assert(n1 + n2 == ev.count())

    // exact re-load of the same batch: nothing appended (idempotent)
    val n3 = IngestOps.incrementalAppend(spark, b2, sink, "ts", keys)
    assert(n3 == 0, s"re-load appended $n3 rows")
    assert(spark.read.parquet(sink).select("row_id").distinct().count() == ev.count())
  }

  test("q_ingest_incremental summarizes exactly the not-yet-loaded tail") {
    val got = IngestOps.ingestIncremental(spark, sf0001)
    // the sink holds everything before the cutoff, so the appended batch
    // must be exactly the events at/after it — computed independently
    val want = Tables.events(spark, sf0001)
      .filter(col("ts") >= lit(IngestOps.SinkCutoff).cast("timestamp"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_appended"),
           round(sum(col("value")), 4).as("val_appended"),
           unix_timestamp(min(col("ts"))).as("first_sec"),
           unix_timestamp(max(col("ts"))).as("last_sec"))
    assert(collectSet(got) == collectSet(want))
    assert(got.count() > 0, "incremental round found no backlog")
    // idempotency seam: a sink already containing everything yields an
    // empty fresh set
    val all = Tables.events(spark, sf0001)
      .withColumn("row_id", IngestOps.rowId(Seq("event_id")))
    assert(IngestOps.freshRows(all, all, "ts", 3600L).isEmpty)
  }

  test("upsertSnapshot: delta replaces, base keeps, null delta values overwrite") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("k", "g", "v")
    val delta = Seq((2L, "a", 99.0), (4L, "b", 40.0))
      .toDF("k", "g", "v")
      // null delta value must still overwrite (ON DUPLICATE KEY UPDATE
      // writes the new row verbatim, null included)
      .union(Seq((3L, "b")).toDF("k", "g")
        .withColumn("v", org.apache.spark.sql.functions.lit(null).cast("double")))
    val got = IngestOps.upsertSnapshot(base, delta, Seq("k", "g"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((if (r.isNullAt(2)) None else Some(r.getDouble(2))), r.getString(3)))
      .toMap
    assert(got == Map(
      (1L, "a") -> ((Some(10.0), "kept")),
      (2L, "a") -> ((Some(99.0), "updated")),
      (3L, "b") -> ((None, "updated")),
      (4L, "b") -> ((Some(40.0), "inserted"))), s"got $got")
  }

  test("scd2 history compresses runs and leaves the current interval open") {
    val dir = tmpDir("scd2_fix")
    writeEvents(dir, Seq(
      // user 1: view, view (compressed), click, view again (new segment)
      eventRow(1, 100, 1L, "view", 1.0),
      eventRow(2, 200, 1L, "view", 1.0),
      eventRow(3, 300, 1L, "click", 1.0),
      eventRow(4, 400, 1L, "view", 1.0),
      // user 2: a single state — one open interval
      eventRow(5, 150, 2L, "purchase", 1.0)))
    val got = IngestOps.scd2History(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(4)) ->
        ((r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap
    assert(got == Map(
      (1L, 1) -> (("view", 100L, Some(300L))),
      (1L, 2) -> (("click", 300L, Some(400L))),
      (1L, 3) -> (("view", 400L, None)),
      (2L, 1) -> (("purchase", 150L, None))), s"got $got")
  }

  test("declarative report equals the handwritten aggregation") {
    val ev = Tables.events(spark, sf0001)
    val spec = ReportSpec(
      dimensions = Seq("event_type"),
      metrics = Seq(Metric("count", "event_id", "hits"),
                    Metric("sum", "value", "total_value"),
                    Metric("count_distinct", "user_id", "users")),
      dateCol = "ts", startDate = "2024-01-05", endDate = "2024-01-20")
    val got = ReportOps.run(ev, spec)
    val want = ev
      .filter(col("ts") >= lit("2024-01-05").cast("timestamp") &&
              col("ts") < lit("2024-01-20").cast("timestamp"))
      .groupBy(date_trunc("day", col("ts")).cast("date").as("period"), col("event_type"))
      .agg(count(col("event_id")).as("hits"),
           round(sum(col("value")), 4).as("total_value"),
           countDistinct(col("user_id")).as("users"))
    assert(collectSet(got) == collectSet(want))
    assert(got.count() > 0)
  }

  test("report without date bucket and with monthly bucket") {
    val ev = Tables.events(spark, sf0001)
    val flat = ReportOps.run(ev, ReportSpec(Seq("event_type"),
      Seq(Metric("avg", "value", "avg_value")), "ts",
      "2024-01-01", "2024-02-01", dateBucket = None))
    assert(flat.columns.toSeq == Seq("event_type", "avg_value"))
    assert(flat.count() == 5)
    val monthly = ReportOps.run(ev, ReportSpec(Seq(),
      Seq(Metric("count", "event_id", "hits")), "ts",
      "2024-01-01", "2024-02-01", dateBucket = Some("month")))
    assert(monthly.count() == 1)
  }

  test("funnel counts only strictly-ordered step sequences") {
    val dir = tmpDir("funnel_fix")
    val day = 86400L
    writeEvents(dir, Seq(
      // user 1: view -> click -> purchase, fully ordered: reaches step 3
      eventRow(1, day * 1, 1L, "view", 1.0),
      eventRow(2, day * 2, 1L, "click", 1.0),
      eventRow(3, day * 3, 1L, "purchase", 1.0),
      // user 2: click BEFORE its first view: stalls at step 1
      eventRow(4, day * 2, 2L, "click", 1.0),
      eventRow(5, day * 3, 2L, "view", 1.0),
      // user 3: view -> click, no purchase: reaches step 2
      eventRow(6, day * 1, 3L, "view", 1.0),
      eventRow(7, day * 2, 3L, "click", 1.0),
      // user 4: purchase BEFORE the click: reaches step 2 only
      eventRow(8, day * 1, 4L, "view", 1.0),
      eventRow(9, day * 2, 4L, "purchase", 1.0),
      eventRow(10, day * 3, 4L, "click", 1.0)))
    val got = ReportOps.funnel(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(1 -> ((4L, 1.0)), 2 -> ((3L, 0.75)), 3 -> ((1L, 0.25))),
      s"got $got")
  }

  test("funnel runs fused: no per-step blocking jobs") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      ReportOps.funnel(spark, sf0001).collect()
      // onJobStart fires synchronously enough for a count (the listener
      // bus is async, but every job STARTED before collect() returned)
      Thread.sleep(500)
      val jobs = counter.get()
      info(s"funnel ran $jobs jobs")
      // measured on this fixture (AQE splits stages into jobs): lazy
      // step checkpoints = 10 jobs, eager = 13 (one extra blocking job
      // per step). The bound sits between the two so a regression back
      // to per-step blocking fails while AQE stage-count noise doesn't.
      assert(jobs <= 11, s"funnel ran $jobs jobs - per-step blocking is back")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("funnel on a corpus with no entry events yields zero counts, not 0/0") {
    val dir = tmpDir("funnel_empty")
    val day = 86400L
    // clicks and purchases exist, but no views: every step must be 0
    writeEvents(dir, Seq(
      eventRow(1, day, 1L, "click", 1.0),
      eventRow(2, day * 2, 1L, "purchase", 1.0)))
    val got = ReportOps.funnel(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(1 -> ((0L, 0.0)), 2 -> ((0L, 0.0)), 3 -> ((0L, 0.0))),
      s"got $got")
  }

  test("cohort retention cells count distinct users at each day offset") {
    val dir = tmpDir("cohort_fix")
    val day = 86400L
    val d0 = 19723L * day // 2024-01-01 in epoch days * sec
    writeEvents(dir, Seq(
      // user 1 first seen day 0, returns day 1 (twice — still one cell
      // hit) and day 3; user 2 first seen day 1 only
      eventRow(1, d0, 1L, "view", 1.0),
      eventRow(2, d0 + day, 1L, "click", 1.0),
      eventRow(3, d0 + day + 3600, 1L, "view", 1.0),
      eventRow(4, d0 + 3 * day, 1L, "view", 1.0),
      eventRow(5, d0 + day, 2L, "view", 1.0)))
    val got = ReportOps.cohortRetention(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01", 0) -> 1L, ("2024-01-01", 1) -> 1L, ("2024-01-01", 3) -> 1L,
      ("2024-01-02", 0) -> 1L), s"got $got")
  }

  test("session metrics: bounce rate and averages from hand-built sessions") {
    val dir = tmpDir("sess_metrics")
    val d0 = 19723L * 86400L // 2024-01-01
    writeEvents(dir, Seq(
      // user 1: two events 10s apart -> one 2-event session, duration 10
      eventRow(1, d0 + 100, 1L, "view", 1.0),
      eventRow(2, d0 + 110, 1L, "click", 1.0),
      // user 2: one event -> a bounce (duration 0)
      eventRow(3, d0 + 500, 2L, "view", 1.0)))
    val got = graft.operators.WindowOps.sessionMetrics(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getDate(0).toString == "2024-01-01")
    assert(r.getLong(1) == 2L, s"n_sessions: $r")
    assert(r.getDouble(2) == 0.5, s"bounce_rate: $r")
    assert(r.getDouble(3) == 5.0, s"avg_duration_sec: $r")
    assert(r.getDouble(4) == 1.5, s"avg_events: $r")
  }

  test("session paths: landing/exit per session, equal-ts ties break on event_id") {
    val dir = tmpDir("sess_paths")
    val d0 = 19723L * 86400L // 2024-01-01
    writeEvents(dir, Seq(
      // user 1, session 1: view -> click; then a >30min gap opens
      // session 2: purchase -> view
      eventRow(1, d0 + 100, 1L, "view", 1.0),
      eventRow(2, d0 + 200, 1L, "click", 1.0),
      eventRow(3, d0 + 5000, 1L, "purchase", 1.0),
      eventRow(4, d0 + 5100, 1L, "view", 1.0),
      // user 2: a bounce — landing and exit are the same event
      eventRow(5, d0 + 100, 2L, "view", 1.0),
      // user 3: two events at the SAME ts — event_id must break the tie
      eventRow(10, d0 + 100, 3L, "click", 1.0),
      eventRow(11, d0 + 100, 3L, "purchase", 1.0)))
    val got = graft.operators.WindowOps.sessionPaths(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("click", "purchase") -> 1L,
      ("purchase", "view") -> 1L,
      ("view", "click") -> 1L,
      ("view", "view") -> 1L), s"got $got")
  }

  test("exit rate: sessions containing vs sessions ending on each type") {
    val dir = tmpDir("exit_rate")
    val d0 = 19723L * 86400L
    writeEvents(dir, Seq(
      // user 1, one session: view -> click -> view. view appears once
      // (presence is per-session) and is the exit; click is not.
      eventRow(1, d0 + 100, 1L, "view", 1.0),
      eventRow(2, d0 + 200, 1L, "click", 1.0),
      eventRow(3, d0 + 300, 1L, "view", 1.0),
      // user 2, one session ending on click
      eventRow(4, d0 + 100, 2L, "view", 1.0),
      eventRow(5, d0 + 200, 2L, "click", 1.0)))
    val got = graft.operators.WindowOps.exitRate(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      "click" -> ((2L, 1L, 0.5)),
      "view" -> ((2L, 1L, 0.5))), s"got $got")
  }

  test("shard export: deterministic, partitioning-invariant, covers all docs") {
    val a = graft.operators.CurationOps.shardExport(spark, sf0001)
    val b = graft.operators.CurationOps.shardExport(spark, sf0001)
    assert(collectSet(a) == collectSet(b))
    val rows = a.collect()
    // every doc lands in exactly one shard; key ranges nest inside
    // the shard's residue class
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sf0001).count())
    rows.foreach { r =>
      assert(r.getLong(3) % 16 == r.getLong(0), s"key_min residue: $r")
      assert(r.getLong(4) % 16 == r.getLong(0), s"key_max residue: $r")
      assert(r.getLong(3) <= r.getLong(4), s"range order: $r")
    }
  }

  test("new vs returning: first-ever day is new, repeat days return once") {
    val dir = tmpDir("new_ret")
    val day = 86400L
    val d0 = 19723L * day // 2024-01-01
    writeEvents(dir, Seq(
      // user 1: day 0 (twice — one active day) and day 1
      eventRow(1, d0 + 100, 1L, "view", 1.0),
      eventRow(2, d0 + 200, 1L, "click", 1.0),
      eventRow(3, d0 + day + 100, 1L, "view", 1.0),
      // user 2: first seen day 1 only
      eventRow(4, d0 + day + 100, 2L, "view", 1.0)))
    val got = ReportOps.newVsReturning(spark, dir).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      "2024-01-01" -> ((1L, 1L, 0L)),
      "2024-01-02" -> ((2L, 1L, 1L))), s"got $got")
  }

  test("null profile counts rows, nulls, and distincts per column in one pass") {
    val dir = tmpDir("prof_nulls")
    val d0 = 19723L * 86400L
    writeEvents(dir, Seq(
      Row(1L, d0 + 100, 1L, "view", 1.0, """{"k": 1}"""),
      Row(2L, d0 + 200, 1L, "click", 2.0, null),
      Row(3L, d0 + 300, 2L, "view", null, """{"k": 1}"""),
      Row(4L, d0 + 400, 2L, "view", 1.0, """{"k": 2}""")))
    val got = graft.operators.ReportShapeOps.profileNulls(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      "event_type" -> ((4L, 0L, 2L)),
      "props" -> ((4L, 1L, 2L)),
      "user_id" -> ((4L, 0L, 2L)),
      "value" -> ((4L, 1L, 2L))), s"got $got")
  }

  test("incremental report refresh equals the full recompute") {
    val got = graft.operators.IngestOps.aggIncremental(spark, sf0001)
    val want = Tables.events(spark, sf0001)
      .groupBy(org.apache.spark.sql.functions.to_date(col("ts")).as("day"),
               col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(round(col("value") * 100).cast("long")).as("c"))
      .select(col("day"), col("event_type"), col("n_events"),
              (col("c").cast("double") / 100.0).as("total_value"),
              (expr("(20000 * c + 100 * n_events) DIV (200 * n_events)")
                .cast("double") / lit(10000.0)).as("avg_value"))
    assert(collectSet(got) == collectSet(want))
    // the standing report must genuinely predate the cutoff: every
    // history day strictly below it, every delta-only day at/after it
    val hist = spark.read.parquet(
      graft.operators.IngestOps.historyReportDir(spark, sf0001))
    val cutDay = java.sql.Date.valueOf("2024-01-21")
    assert(hist.filter(col("day") >= lit(cutDay)).count() == 0)
  }

  test("unknown aggregation is rejected") {
    val ev = Tables.events(spark, sf0001)
    assertThrows[IllegalArgumentException] {
      ReportOps.run(ev, ReportSpec(Seq("event_type"),
        Seq(Metric("median", "value", "m")), "ts", "2024-01-01", "2024-02-01"))
    }
  }
}
