package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.TimestampType
import org.apache.spark.sql.functions._

/** Guards the events timestamp-unit contract that broke round 9: the
  * driver regenerated testdata from INT64-ns to TIMESTAMP(MICROS) and the
  * suite's synthetic ns-only fixtures could not see it (`sbt test` stayed
  * green while 46 driver queries failed).
  *
  * Two layers of defense:
  *  1. TestDataFormatSpec (below) reads the REAL driver data, so any
  *     future physical-format drift the reader mishandles fails the suite;
  *  2. this spec pins both supported encodings (ns legacy, µs current)
  *     byte-equal through [[Tables.events]] and through a ts-sensitive
  *     operator (sessionize), so the legacy branch cannot rot silently.
  */
class TsEncodingSpec extends AnyFunSuite {
  import TestBase._

  private val fixture = Seq(
    eventRow(1L, 0L, 1L, "view", 1.0),
    eventRow(2L, 60L, 1L, "click", 2.0),
    eventRow(3L, 60L + 2000L, 1L, "view", 3.0), // >30min gap: new session
    eventRow(4L, 7 * 86400L + 30L, 2L, "purchase", 4.0),
    eventRow(5L, 29 * 86400L, 2L, "view", 5.0))

  test("µs and ns encodings read identically through Tables.events") {
    val dirUs = tmpDir("tsenc_us"); val dirNs = tmpDir("tsenc_ns")
    writeEvents(dirUs, fixture, unit = "us")
    writeEvents(dirNs, fixture, unit = "ns")
    val us = Tables.events(spark, dirUs)
    val ns = Tables.events(spark, dirNs)
    assert(us.schema("ts").dataType == TimestampType)
    assert(ns.schema("ts").dataType == TimestampType)
    assert(us.schema == ns.schema)
    assert(collectSet(us) == collectSet(ns))
    // the values are the seconds the fixture declared, not ÷1000 of them
    val micros = us.select(expr("unix_micros(ts)")).collect().map(_.getLong(0)).sorted
    assert(micros.toSeq == fixture.map(_.getLong(1) * 1000000L).sorted)
  }

  // The exact-boundary semantics (gap == threshold) must hold under BOTH
  // physical encodings — a unit-conversion off-by-one would move events
  // across the boundary. OperatorEdgeSpec covers the µs default; the loop
  // here keeps the legacy ns branch behaviorally identical, not just
  // value-identical.
  for (unit <- Seq("us", "ns")) {
    test(s"sessionize 1800s boundary under $unit encoding") {
      val dir = tmpDir(s"tsenc_gap_$unit")
      val t0 = 1700000000L
      writeEvents(dir, Seq(
        eventRow(1, t0, 1, "view", 1.0),
        eventRow(2, t0 + 1800, 1, "view", 2.0),        // == gap: same session
        eventRow(3, t0 + 1800 + 1801, 1, "view", 3.0)), // > gap: new session
        unit = unit)
      val sess = graft.operators.WindowOps.sessionize(spark, dir)
        .collect().map(r => (r.getLong(1), r.getLong(4))).sorted
      assert(sess.toSeq == Seq((1L, 2L), (2L, 1L)), s"[$unit] got ${sess.toSeq}")
    }

    test(s"funnel_window 24h boundary under $unit encoding") {
      val dir = tmpDir(s"tsenc_fw_$unit")
      val t0 = 1700000000L
      writeEvents(dir, Seq(
        eventRow(1, t0, 1, "view", 1.0),
        eventRow(2, t0 + 86400, 1, "click", 1.0),  // exactly 24 h: counts
        eventRow(3, t0, 2, "view", 1.0),
        eventRow(4, t0 + 86401, 2, "click", 1.0)), // 1 s over: out
        unit = unit)
      val out = graft.operators.ReportOps.funnelWindow(spark, dir).collect()
        .map(r => r.getInt(0) -> r.getLong(2)).toMap
      assert(out == Map(1 -> 2L, 2 -> 1L, 3 -> 0L), s"[$unit] got $out")
    }

    test(s"pattern_match 1h boundary under $unit encoding") {
      val dir = tmpDir(s"tsenc_pm_$unit")
      val t0 = 1700000000L
      writeEvents(dir, Seq(
        eventRow(1, t0, 1, "view", 0.0),
        eventRow(2, t0 + 3600, 1, "purchase", 1.0),  // inclusive: clean
        eventRow(3, t0, 2, "view", 0.0),
        eventRow(4, t0 + 3601, 2, "purchase", 1.0)), // 1 s over: no_view
        unit = unit)
      val r = graft.operators.WindowOps.patternMatch(spark, dir).collect().head
      assert((r.getLong(1), r.getLong(2), r.getLong(4)) == ((2L, 1L, 1L)),
        s"[$unit] got ${r.toSeq}")
    }

    test(s"debounce 5s boundary under $unit encoding") {
      val dir = tmpDir(s"tsenc_deb_$unit")
      writeEvents(dir, Seq(
        eventRow(1L, 1000L, 1L, "view", 1.0),
        eventRow(2L, 1005L, 1L, "view", 1.0),  // gap == 5 -> dropped
        eventRow(3L, 1011L, 1L, "view", 1.0)), // gap == 6 -> kept
        unit = unit)
      val out = graft.operators.CurationOps.debounce(spark, dir).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(out("view") == ((2L, 1L)), s"[$unit] got $out")
    }
  }

  // The detector must FAIL LOUDLY on encodings it cannot decode —
  // INT96 was never a driver format, and silently taking the ns-Long
  // branch on it would surface as a confusing downstream conversion
  // error (r10 ADVICE). Strictness is the guard against format drift.
  test("INT96 ts encoding is rejected at the detector, not downstream") {
    val dir = tmpDir("tsenc_int96")
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      writeTable(dir, "events", Schemas.events, fixture.map(r =>
        Row(r.getLong(0),
          java.sql.Timestamp.from(
            java.time.Instant.ofEpochSecond(r.getLong(1))),
          r.get(2), r.get(3), r.get(4), r.get(5))))
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    val e = intercept[IllegalArgumentException] {
      Tables.events(spark, dir).count()
    }
    assert(e.getMessage.contains("unsupported ts encoding"), e.getMessage)
  }

  // A partially regenerated directory (µs parts next to ns parts) must
  // be a loud failure, not a silent misread of whichever parts don't
  // match the sampled footer (r10 ADVICE).
  test("mixed µs/ns parts in one directory are rejected") {
    val dirUs = tmpDir("tsenc_mix_us"); val dirNs = tmpDir("tsenc_mix_ns")
    writeEvents(dirUs, fixture, unit = "us")
    writeEvents(dirNs, fixture, unit = "ns")
    val mixed = new java.io.File(s"$dirUs/events.parquet")
    val nsParts = new java.io.File(s"$dirNs/events.parquet").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    // copy an ns part in under a name that sorts LAST so the first/last
    // probe sees both encodings
    java.nio.file.Files.copy(nsParts.head.toPath,
      new java.io.File(mixed, "zzz-mixed-ns-part.parquet").toPath)
    val e = intercept[IllegalArgumentException] {
      Tables.events(spark, s"$dirUs").count()
    }
    assert(e.getMessage.contains("mixed ts encodings"), e.getMessage)
  }

  test("sessionize agrees across encodings (ts-sensitive operator)") {
    val dirUs = tmpDir("tsenc_sess_us"); val dirNs = tmpDir("tsenc_sess_ns")
    writeEvents(dirUs, fixture, unit = "us")
    writeEvents(dirNs, fixture, unit = "ns")
    val us = graft.operators.WindowOps.sessionize(spark, dirUs)
    val ns = graft.operators.WindowOps.sessionize(spark, dirNs)
    assert(collectSet(us) == collectSet(ns))
    // 4 sessions: user 1 split by the >30min gap, user 2's two lone days
    assert(us.count() == 4, us.collect().mkString("; "))
  }
}

/** Reads the REAL driver-generated parquet (no synthetic fixtures) and
  * asserts the data-shape invariants every ts-dependent query relies on.
  * This spec MUST fail when driver data and Tables.events disagree about
  * the timestamp unit — on the r9 bug (µs data ÷ 1000) the 30-day corpus
  * collapsed to ~43 minutes, which the span assertion below catches. */
class TestDataFormatSpec extends AnyFunSuite {
  import TestBase._

  test("driver events data spans weeks, not minutes, through Tables.events") {
    assume(new java.io.File(sf0001).isDirectory, s"$sf0001 not present")
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType == TimestampType)
    val r = ev.agg(
      min("ts").as("lo"), max("ts").as("hi"),
      countDistinct(to_date(col("ts"))).as("days"),
      countDistinct(col("event_type")).as("types")).head()
    val spanDays = (r.getTimestamp(1).getTime - r.getTimestamp(0).getTime) / 86400000.0
    assert(spanDays >= 7.0, s"events span $spanDays days — timestamp unit bug?")
    assert(r.getLong(2) >= 7L, s"only ${r.getLong(2)} distinct calendar days")
    assert(r.getLong(3) >= 2L, s"only ${r.getLong(3)} event types")
    // events are 2024-era, not 1970-adjacent (a ÷1000 lands in 1970)
    assert(r.getTimestamp(0).toInstant.isAfter(
      java.time.Instant.parse("2000-01-01T00:00:00Z")),
      s"min ts ${r.getTimestamp(0)} is epoch-adjacent — unit regression")
  }

  test("driver fact tables read with sane shapes (contract smoke)") {
    assume(new java.io.File(sf0001).isDirectory, s"$sf0001 not present")
    val li = Tables.lineitem(spark, sf0001)
      .agg(count(lit(1)), min(year(col("l_shipdate"))),
           max(year(col("l_shipdate")))).head()
    assert(li.getLong(0) > 1000L, "lineitem implausibly small")
    assert(li.getInt(1) >= 1990 && li.getInt(2) <= 2010,
      s"l_shipdate years ${li.getInt(1)}-${li.getInt(2)} outside the TPC-H-ish band")
    val o = Tables.orders(spark, sf0001)
      .agg(count(lit(1)), min(year(col("o_orderdate")))).head()
    assert(o.getLong(0) > 100L && o.getInt(1) >= 1990,
      s"orders shape drifted: n=${o.getLong(0)} minYear=${o.getInt(1)}")
    val docs = Tables.documents(spark, sf0001)
      .agg(count(lit(1)), countDistinct(col("lang"))).head()
    assert(docs.getLong(0) > 10L && docs.getLong(1) >= 2L,
      s"documents shape drifted: n=${docs.getLong(0)} langs=${docs.getLong(1)}")
    val emb = Tables.embeddings(spark, sf0001)
      .select(size(col("embedding")).as("d")).agg(min("d"), max("d")).head()
    assert(emb.getInt(0) == 64 && emb.getInt(1) == 64,
      s"embedding dim drifted: ${emb.getInt(0)}-${emb.getInt(1)} (expected 64)")
  }
}
