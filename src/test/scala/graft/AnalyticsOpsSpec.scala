package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CurationOps, GraphOps, ReportOps, RetrievalOps, TimeSeriesOps, WindowOps}

/** Semantics of the r6 analytics operators: TF-IDF / BM25 retrieval,
  * gap-fill / anomaly / A-B time-series, train-split, Markov
  * transitions, PageRank. Plan-shape guards come from PlanGuardSpec
  * (which iterates every SparkEntry query); these tests pin the math on
  * hand-built fixtures. */
class AnalyticsOpsSpec extends AnyFunSuite {
  import TestBase._

  test("tfidf: corpus-unique term beats common terms; ties break on min token") {
    val dir = tmpDir("tfidf")
    writeTable(dir, "documents", documentsSchema, Seq(
      Row(1L, "common common zebra", "en", "s0", 19L),
      Row(2L, "common common common", "en", "s0", 20L),
      Row(3L, "common apple banana", "en", "s0", 19L)
    ))
    val out = RetrievalOps.tfidf(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "zebra")        // df=1 term dominates tf=2 common term
    assert(out(2L) == "common")       // only term present
    assert(out(3L) == "apple")        // apple/banana tie on score -> min token
  }

  test("bm25: more query-term occurrences rank higher; no-hit docs absent") {
    val dir = tmpDir("bm25")
    writeTable(dir, "documents", documentsSchema, Seq(
      Row(1L, "dup dup dup pad pad pad pad pad", "en", "s0", 30L),
      Row(2L, "dup pad pad pad pad pad pad pad", "en", "s0", 30L),
      Row(3L, "pad pad pad pad pad pad pad pad", "en", "s0", 30L)
    ))
    val rows = RetrievalOps.bm25(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // ranked, doc 3 absent
    assert(rows(0).getDouble(1) > rows(1).getDouble(1))
  }

  test("gap_fill: missing hour appears with n=0 and forward-filled average") {
    val dir = tmpDir("gapfill")
    // view events in hours 0 and 2 (epoch-aligned); hour 1 is a gap.
    writeEvents(dir, Seq(
      eventRow(1L, 0L, 1L, "view", 10.0),
      eventRow(2L, 7200L, 1L, "view", 30.0)
    ))
    val out = TimeSeriesOps.gapFill(spark, dir).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), Option(r.get(3)), r.getDouble(4))).toMap
    assert(out.keySet == Set(0L, 3600L, 7200L))
    assert(out(3600L) == ((0L, None, 10.0))) // gap: zero events, carried avg
    assert(out(7200L)._1 == 1L && out(7200L)._3 == 30.0)
  }

  test("forecast_daily: 7-day horizon carries each weekday's historical mean") {
    val dir = tmpDir("forecast")
    // two Mondays (1970-01-05, -01-12) with revenue 10 and 30 -> Monday
    // mean 20; one Tuesday (1970-01-06) with 8 -> Tuesday mean 8.
    // History ends 1970-01-12, so the horizon is 01-13 .. 01-19.
    writeEvents(dir, Seq(
      eventRow(1L, 4L * 86400L, 1L, "view", 10.0),
      eventRow(2L, 11L * 86400L, 1L, "view", 30.0),
      eventRow(3L, 5L * 86400L, 1L, "view", 8.0)))
    val out = TimeSeriesOps.forecastDaily(spark, dir).collect()
      .map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    // horizon covers only weekdays with history: Mon 01-19 and Tue 01-13
    assert(out == Map("1970-01-19" -> 20.0, "1970-01-13" -> 8.0), s"got $out")
  }

  test("anomaly: an outlier day is flagged, normal days are not") {
    val dir = tmpDir("anom")
    // 5 days with 2 events each, 1 day with 12 -> |z| > 1.5 only there.
    val rows = (0 until 5).flatMap { day =>
      Seq(eventRow(day * 10L, day * 86400L, 1L, "view", 1.0),
          eventRow(day * 10L + 1, day * 86400L + 60, 1L, "view", 1.0))
    } ++ (0 until 12).map(i =>
      eventRow(100L + i, 5 * 86400L + i * 60, 1L, "view", 1.0))
    writeEvents(dir, rows)
    val out = TimeSeriesOps.anomaly(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(out(12L) == 1)
    assert(out(2L) == 0)
  }

  test("autocorr: alternating daily volume gives negative lag-1, positive lag-2") {
    val dir = tmpDir("acorr")
    // 8 days alternating 1 and 3 events/day
    val rows = (0 until 8).flatMap { day =>
      val n = if (day % 2 == 0) 1 else 3
      (0 until n).map(i =>
        eventRow(day * 10L + i, day * 86400L + i * 60, 1L, "view", 1.0))
    }
    writeEvents(dir, rows)
    val out = TimeSeriesOps.autocorr(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1) == ((7L, -1.0)), s"lag-1 of a perfect alternation: $out")
    assert(out(2) == ((6L, 1.0)), s"lag-2 of a perfect alternation: $out")
  }

  test("winsorize: clamped mean is self-consistent and damps the outlier") {
    val out = graft.operators.ReportShapeOps.winsorize(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p05, p95) = (r.getDouble(2), r.getDouble(3))
      val (raw, win) = (r.getDouble(4), r.getDouble(5))
      assert(p05 <= p95)
      // the winsorized mean must live inside the clamp interval; the raw
      // mean need not
      assert(win >= p05 - 1e-9 && win <= p95 + 1e-9,
        s"winsorized mean outside clamp: $r")
    }
  }

  test("schema_drift: a column going null only in the fresh period is flagged") {
    val dir = tmpDir("drift")
    val cutSec = java.sql.Timestamp.valueOf("2024-01-21 00:00:00").getTime / 1000
    val rows =
      (0 until 4).map(i => eventRow(i.toLong, cutSec - 86400 + i * 60, 1L, "view", 1.0)) ++
      (0 until 4).map(i => Row(100L + i, cutSec + 3600 + i * 60,
                               1L, "view", 1.0, null)) // props null post-cutoff
    writeEvents(dir, rows)
    val out = graft.operators.ReportShapeOps.schemaDrift(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5)))).toMap
    assert(out("props") == ((0L, 4L, 1.0)), s"props drift not caught: $out")
    assert(out("value") == ((0L, 0L, 0.0)))
  }

  test("join_salted equals the plain join (salting is result-invisible)") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.SkewOps.joinSalted(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    val c = Tables.customer(spark, sf0001)
    val want = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(round(sum(col("o_totalprice")), 4).as("revenue"),
           count(lit(1)).as("n_orders"))
    assert(collectSet(got) == collectSet(want))
  }

  test("ab_test: arm counts exact; degenerate p yields NULL z") {
    val dir = tmpDir("ab")
    // Every user converts instantly -> p = 1 -> z must be NULL, not a crash.
    writeEvents(dir, Seq(
      eventRow(1L, 0L, 1L, "purchase", 1.0),
      eventRow(2L, 0L, 2L, "purchase", 1.0)
    ))
    val r = TimeSeriesOps.abTest(spark, dir).collect().head
    assert(r.getLong(0) + r.getLong(3) == 2L) // n_a + n_b = users
    assert(r.getLong(1) + r.getLong(4) == 2L) // all converted
    assert(r.isNullAt(7), "z must be NULL when p*(1-p) == 0")
  }

  test("ab_test: late purchase (>24h after first event) does not convert") {
    val dir = tmpDir("ab2")
    writeEvents(dir, Seq(
      eventRow(1L, 0L, 1L, "view", 1.0),
      eventRow(2L, 100000L, 1L, "purchase", 1.0) // 27.8h later
    ))
    val r = TimeSeriesOps.abTest(spark, dir).collect().head
    assert(r.getLong(1) + r.getLong(4) == 0L, "late purchase must not count")
    // single user -> one arm is empty: its rate must be NULL, not a crash
    assert(r.isNullAt(2) || r.isNullAt(5), "empty arm rate must be NULL")
  }

  test("split_train: partitions the corpus, deterministic across runs") {
    val a = CurationOps.splitTrain(spark, sf0001).collect()
    val b = CurationOps.splitTrain(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq)
    val n = a.map(_.getLong(1)).sum
    val total = Tables.documents(spark, sf0001).count()
    assert(n == total, s"splits must partition: $n != $total")
    assert(a.map(_.getString(0)).toSet == Set("train", "val", "test"))
  }

  test("markov: transitions stay inside sessions and probabilities sum to 1 per row") {
    val dir = tmpDir("markov")
    // user 1: view->click within one session; a >30min gap then view->purchase.
    writeEvents(dir, Seq(
      eventRow(1L, 0L, 1L, "view", 1.0),
      eventRow(2L, 60L, 1L, "click", 1.0),
      eventRow(3L, 60L + 2000L, 1L, "view", 1.0), // new session
      eventRow(4L, 60L + 2060L, 1L, "purchase", 1.0)
    ))
    val out = TimeSeriesFixtures.asMap(WindowOps.markovTransitions(spark, dir))
    // Both transitions leave 'view' (n=2 total), so each has p = 0.5; a
    // click->view pair across the session gap must NOT appear.
    assert(out == Map(("view", "click") -> (1L, 0.5), ("view", "purchase") -> (1L, 0.5)),
      s"got $out")
  }

  test("markov: probabilities per cur_type sum to 1 on real data") {
    val rows = WindowOps.markovTransitions(spark, sf0001).collect()
    rows.groupBy(_.getString(0)).foreach { case (cur, rs) =>
      val p = rs.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 0.01, s"$cur transition mass $p")
    }
  }

  test("pagerank: sink nation of a star trade graph ranks highest; base rank holds") {
    val dir = tmpDir("pr")
    writeTable(dir, "nation", Schemas.nation,
      (0 to 2).map(i => Row(i, s"N$i", 0)))
    writeTable(dir, "customer", Schemas.customer,
      (0 to 2).map(i => Row(i.toLong, s"C$i", i, 0.0, "SEG")))
    writeTable(dir, "supplier", Schemas.supplier,
      (0 to 2).map(i => Row(i.toLong, s"S$i", i, 0.0)))
    // customers in nations 0 and 1 each buy once from a supplier in nation 2.
    writeTable(dir, "orders", Schemas.orders, Seq(
      Row(1L, 0L, "O", 1.0, java.sql.Timestamp.valueOf("1995-01-01 00:00:00"), "1"),
      Row(2L, 1L, "O", 1.0, java.sql.Timestamp.valueOf("1995-01-02 00:00:00"), "1")))
    writeTable(dir, "lineitem", Schemas.lineitem, Seq(
      Row(1L, 1L, 2L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
          java.sql.Timestamp.valueOf("1995-02-01 00:00:00")),
      Row(2L, 1L, 2L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
          java.sql.Timestamp.valueOf("1995-02-02 00:00:00"))))
    val pr = GraphOps.pageRank(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(pr(2) > pr(0) && pr(2) > pr(1), s"sink must rank highest: $pr")
    assert(pr(0) >= 0.15 / 3 - 1e-9) // sourceless node keeps the base rank
    assert(pr.values.sum <= 1.0 + 1e-6) // dangling mass only leaks, never grows
  }

  test("attribution: revenue lands on the landing type of the purchase's session") {
    val dir = tmpDir("attr")
    writeEvents(dir, Seq(
      eventRow(1L, 0L, 1L, "view", 5.0),        // session 1 lands on view
      eventRow(2L, 60L, 1L, "purchase", 40.0),
      eventRow(3L, 60L + 2000L, 1L, "click", 1.0), // session 2 lands on click
      eventRow(4L, 60L + 2060L, 1L, "purchase", 60.0)
    ))
    val out = WindowOps.attribution(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map("view" -> (1L, 1L, 40.0), "click" -> (1L, 1L, 60.0)), s"got $out")
  }

  test("rfm: quartiles partition users; monotone in the underlying value") {
    val rows = ReportOps.rfm(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // quartile must be monotone in recency: sort by recency, r_q never decreases
    val byRec = rows.sortBy(r => (r.getInt(1), r.getLong(0)))
    assert(byRec.sliding(2).forall(p => p(0).getInt(4) <= p(1).getInt(4)))
    val byFreq = rows.sortBy(r => (r.getLong(2), r.getLong(0)))
    assert(byFreq.sliding(2).forall(p => p(0).getInt(5) <= p(1).getInt(5)))
    assert(rows.map(_.getInt(4)).distinct.sorted.forall(Set(1, 2, 3, 4)))
  }

  test("pagerank: all 25 nations ranked on real data, mass bounded") {
    val pr = GraphOps.pageRank(spark, sf0001).collect()
    assert(pr.length == 25)
    val s = pr.map(_.getDouble(2)).sum
    assert(s > 0.5 && s <= 1.0 + 1e-6, s"total rank mass $s")
  }

  test("seasonality: integer dow/hour axes match known calendar cells") {
    val dir = tmpDir("seas")
    // 1970-01-01 (epoch day 0) was a THURSDAY (dow_iso 4); hour from UTC secs
    writeEvents(dir, Seq(
      eventRow(1L, 0L, 1L, "view", 1.0),                 // Thu 00:00
      eventRow(2L, 3600L, 1L, "view", 2.0),              // Thu 01:00
      eventRow(3L, 4 * 86400L, 1L, "view", 4.0),         // Mon (day 4) 00:00
      eventRow(4L, 4 * 86400L + 30L, 1L, "view", 6.0)))  // same cell
    val out = graft.operators.TimeSeriesOps.seasonality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out == Map(
      (4L, 0L) -> ((1L, 1.0)), (4L, 1L) -> ((1L, 2.0)),
      (1L, 0L) -> ((2L, 10.0))), s"got $out")
  }

  test("changepoint: cusum peaks at the level shift and ends at zero") {
    val dir = tmpDir("cpt")
    // 4 days at 1 event/day then 4 days at 3/day: mean 2, cusum walks
    // -1,-2,-3,-4 then +1 steps back to 0 — the shift day is the trough
    val rows = (0 until 8).flatMap { day =>
      val n = if (day < 4) 1 else 3
      (0 until n).map(i =>
        eventRow(day * 10L + i, day * 86400L + i * 60, 1L, "view", 1.0))
    }
    writeEvents(dir, rows)
    val out = graft.operators.TimeSeriesOps.changepoint(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(3L) == -4.0, s"trough at the shift boundary: $out")
    assert(out(7L) == 0.0, s"cusum must telescope to zero: $out")
    assert(out.values.min == -4.0 && out.values.max == 0.0, s"got $out")
  }

  test("cuped: perfectly correlated pre/post collapses adjusted diff to zero") {
    val dir = tmpDir("cuped")
    // pre period: days 0-4; post: days 5-9 (midpoint splits them).
    // Each user spends c pre and EXACTLY c post → cov=var, θ=1, and the
    // adjusted diff (Y−θX) is identically zero even though the naive
    // arm diff is not.
    val spends = Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 4L -> 60.0)
    val rows = spends.toSeq.flatMap { case (u, c) => Seq(
      eventRow(u * 10L, 0L + u * 60L, u, "view", c),
      eventRow(u * 10L + 1, 9L * 86400L + u * 60L, u, "view", c)) }
    writeEvents(dir, rows)
    val r = graft.operators.TimeSeriesOps.cuped(spark, dir).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 1.0, s"theta: $r")        // cov/var = 1
    assert(r.getDouble(4) != 0.0, s"naive diff: $r")   // arms differ
    assert(r.getDouble(5) == 0.0, s"cuped diff: $r")   // fully explained
  }

  test("landing_bounce: keyed on entry type; single-event sessions bounce") {
    val dir = tmpDir("lbounce")
    writeEvents(dir, Seq(
      // user 1: view→click session (entry view, no bounce)
      eventRow(1L, 1000L, 1L, "view", 1.0),
      eventRow(2L, 1060L, 1L, "click", 1.0),
      // user 1, second session: lone view (entry view, bounce)
      eventRow(3L, 1000L + 5000L, 1L, "view", 1.0),
      // user 2: lone click (entry click, bounce)
      eventRow(4L, 2000L, 2L, "click", 1.0)))
    val out = graft.operators.WindowOps.landingBounce(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out == Map(
      "view" -> ((2L, 1L, 0.5)), "click" -> ((1L, 1L, 1.0))), s"got $out")
  }

  test("containment: embedded paragraph scores 1.0 one way, small the other") {
    val dir = tmpDir("containment")
    // doc 0 = a short paragraph; doc 1 = a much larger doc CONTAINING it
    // verbatim: containment(0 in 1) = 1.0 while Jaccard is small
    val para = "quick brown fox jumps over the lazy dog tonight"
    val filler = (0 until 40).map(i => s"filler${i}x filler${i}y").mkString(" ")
    val rows = Seq(
      org.apache.spark.sql.Row(0L, para, "en", "s0", para.length.toLong),
      org.apache.spark.sql.Row(1L, s"$filler $para", "en", "s0",
        (filler.length + para.length + 1).toLong),
      org.apache.spark.sql.Row(2L, "unrelated words entirely different topic",
        "en", "s0", 40L))
    writeTable(dir, "documents", documentsSchema, rows)
    val out = graft.operators.LlmOps.containment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(5), r.getDouble(6)))).toMap
    val (c12, c21) = out((0L, 1L))
    assert(c12 == 1.0, s"paragraph fully contained: $out")
    assert(c21 < 0.5, s"but the big doc is not contained in it: $out")
    assert(!out.contains((0L, 2L)) && !out.contains((1L, 2L)),
      s"no shared grams, no pair: $out")
  }

  test("ndcg: perfect ranking scores 1.0; no relevant neighbors scores 0") {
    val dir = tmpDir("ndcg")
    // label 7: a tight cluster along axis 0 (queries 0,1 + neighbors
    // 10,11) — cosine ranks same-label vectors on top → ndcg 1.0.
    // label 9: vec 2 is the ONLY one of its label → n_rel=0 → ndcg 0.
    def vec(axis: Int, mag: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == axis) mag else 0.001f)
    val rows = Seq(
      org.apache.spark.sql.Row(0L, vec(0, 1.0f), 7),
      org.apache.spark.sql.Row(1L, vec(0, 0.9f), 7),
      org.apache.spark.sql.Row(2L, vec(40, 1.0f), 9),
      org.apache.spark.sql.Row(10L, vec(0, 0.8f), 7),
      org.apache.spark.sql.Row(11L, vec(0, 0.7f), 7),
      org.apache.spark.sql.Row(12L, vec(20, 1.0f), 8),
      org.apache.spark.sql.Row(13L, vec(21, 1.0f), 8))
    writeTable(dir, "embeddings", embeddingsSchema, rows)
    val out = graft.operators.RetrievalOps.ndcg(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(out(0L) == ((3L, 1.0)), s"axis-aligned cluster ranks perfectly: $out")
    assert(out(1L) == ((3L, 1.0)), s"got $out")
    assert(out(2L) == ((0L, 0.0)), s"lone label has ndcg 0: $out")
  }

  test("subquery_correlated: every returned customer beats their nation avg") {
    val out = graft.operators.RelationalOps.subqueryCorrelated(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(2) > r.getDouble(3) - 1e-9,
        s"spend must exceed the nation average: $r")
    }
  }

  test("srm: arms partition the users and chi2 matches the closed form") {
    val r = graft.operators.TimeSeriesOps.srm(spark, sf0001).collect().head
    val (na, nb, chi2, flag) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    val users = Tables.events(spark, sf0001)
      .select(col("user_id")).distinct().count()
    assert(na + nb == users, s"arms must partition: $r vs $users users")
    val want = BigDecimal(((na - nb) * (na - nb)).toDouble / (na + nb))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(chi2 == want, s"chi2 formula: $r")
    assert(flag == (if (chi2 > 3.8415) 1 else 0), s"flag vs chi2: $r")
  }

  test("quantize_embed: the max lane always saturates; mse bounded by a half-step") {
    val out = graft.operators.LlmOps.quantizeEmbed(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (scale, nSat, mse) = (r.getDouble(1), r.getLong(2), r.getDouble(3))
      assert(scale > 0, s"positive scale: $r")
      assert(nSat >= 1, s"the max-|v| lane quantizes to ±127: $r")
      // per-lane error ≤ half a quantization step (0.5/scale); mse ≤ step²/4
      val bound = 0.25 / (scale * scale) + 1e-9
      assert(mse <= bound + 1e-4, s"mse $mse exceeds half-step bound $bound: $r")
    }
  }

  test("graph_jaccard: scores in (0,1], consistent with the union formula") {
    val out = graft.operators.GraphOps.graphJaccard(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (u, w, common, du, dw, j) = (r.getInt(0), r.getInt(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(u < w, s"canonical pair order: $r")
      assert(common >= 1 && common <= math.min(du, dw), s"common bounded: $r")
      val want = BigDecimal(common.toDouble / (du + dw - common))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(j == want, s"jaccard formula: $r")
      assert(j > 0 && j <= 1.0, s"range: $r")
    }
  }

  test("matryoshka: identical prefix geometry gives recall 1.0") {
    val dir = tmpDir("mrl")
    // vectors vary ONLY inside the first 16 dims → the 16-dim ranking
    // must equal the full ranking exactly (recall 1.0 for every query)
    def vec(axis: Int, mag: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == axis && i < 16) mag else 0.001f)
    val rows = (0L until 16L).map(i =>
      org.apache.spark.sql.Row(i, vec((i % 8).toInt, 1.0f - 0.05f * i), 1))
    writeTable(dir, "embeddings", embeddingsSchema, rows)
    val out = graft.operators.RetrievalOps.matryoshka(spark, dir).collect()
    assert(out.length == 10)
    out.foreach(r => assert(r.getDouble(2) == 1.0,
      s"prefix-only geometry must preserve the ranking: $r"))
  }

  test("freshness: hwm type has lag 0; a day-stale type is flagged") {
    val dir = tmpDir("fresh")
    writeEvents(dir, Seq(
      eventRow(1L, 10L * 86400L, 1L, "view", 1.0),          // the high-water mark
      eventRow(2L, 10L * 86400L - 86400L, 1L, "click", 1.0), // exactly 24h: not stale
      eventRow(3L, 10L * 86400L - 86401L, 1L, "purchase", 1.0))) // 1s over: stale
    val out = graft.operators.IngestOps.freshness(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getInt(4)))).toMap
    assert(out == Map("view" -> ((0L, 0)), "click" -> ((86400L, 0)),
                      "purchase" -> ((86401L, 1))), s"got $out")
  }

  test("bucket_skew: loads average to 1 and cover the corpus") {
    val out = graft.operators.LayoutOps.bucketSkew(spark, sf0001).collect()
    val total = Tables.events(spark, sf0001).count()
    assert(out.map(_.getLong(1)).sum == total, "buckets cover every row")
    out.foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(0) < 32)
      assert(r.getDouble(2) > 0.0)
    }
    // Σ load_b = 32·Σn_b/total = 32 exactly (up to the per-bucket r4)
    val loadSum = out.map(_.getDouble(2)).sum
    assert(math.abs(loadSum - 32.0) < 0.01, s"loads sum to 32, got $loadSum")
  }

  test("ks_test: disjoint arm distributions reach D=1; identical arms reach 0") {
    val dir = tmpDir("ks")
    // odd users (arm 1) spend 10; even users (arm 0) spend 1000 —
    // disjoint supports → D = 1.0 (but tiny n keeps it under crit)
    val rows = (1L to 8L).map(u =>
      eventRow(u, 1000L + u, u, "purchase", if (u % 2 == 1) 10.0 else 1000.0))
    writeEvents(dir, rows)
    val r = graft.operators.TimeSeriesOps.ksTest(spark, dir).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 1.0, s"disjoint supports give D=1: $r")
    assert(r.getInt(4) == (if (r.getDouble(2) > r.getDouble(3)) 1 else 0))

    val dir2 = tmpDir("ks2")
    // identical per-user spend in both arms → D = 0
    val rows2 = (1L to 8L).map(u =>
      eventRow(u, 1000L + u, u, "purchase", 50.0))
    writeEvents(dir2, rows2)
    val r2 = graft.operators.TimeSeriesOps.ksTest(spark, dir2).collect().head
    assert(r2.getDouble(2) == 0.0, s"identical distributions give D=0: $r2")
    assert(r2.getInt(4) == 0)
  }

  test("gini: equal spends give 0; a monopolist approaches (n-1)/n") {
    def orderRow(ok: Long, cust: Long, price: Double): Row =
      Row(ok, cust, "F", price,
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(86400L)), "1-URGENT")
    val dirEq = tmpDir("gini_eq")
    writeTable(dirEq, "orders", Schemas.orders,
      (1L to 5L).map(i => orderRow(i, i, 100.0)))
    val eq = graft.operators.ReportOps.gini(spark, dirEq).collect().head
    assert(eq.getDouble(2) == 0.0, s"perfect equality: $eq")

    val dirMono = tmpDir("gini_mono")
    // 4 customers at ~0 spend, one with everything: G → (n−1)/n = 0.8
    writeTable(dirMono, "orders", Schemas.orders,
      (1L to 4L).map(i => orderRow(i, i, 0.01)) :+ orderRow(5L, 5L, 10000.0))
    val mono = graft.operators.ReportOps.gini(spark, dirMono).collect().head
    assert(mono.getDouble(2) > 0.79 && mono.getDouble(2) <= 0.8,
      s"monopolist approaches 0.8: $mono")
  }

  test("benford: observed frequencies sum to 1; expectation is log10(1+1/d)") {
    val out = graft.operators.ReportShapeOps.benford(spark, sf0001).collect()
    assert(out.nonEmpty && out.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 9))
    val obsSum = out.map(_.getDouble(2)).sum
    assert(math.abs(obsSum - 1.0) < 0.001, s"frequencies sum to 1: $obsSum")
    out.foreach { r =>
      val want = BigDecimal(math.log10(1.0 + 1.0 / r.getInt(0)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == want, s"benford expectation: $r")
    }
  }

  test("cume_dist: tie-stable positions; top spender has cd=1, pr=1") {
    val out = graft.operators.ReportShapeOps.cumeDist(spark, sf0001).collect()
    assert(out.nonEmpty)
    val bySeg = out.groupBy(_.getString(1))
    bySeg.foreach { case (seg, rows) =>
      val cds = rows.map(_.getDouble(3))
      assert(cds.max == 1.0, s"[$seg] max cume_dist must be 1")
      assert(cds.min > 0.0, s"[$seg] cume_dist is strictly positive")
      val prs = rows.map(_.getDouble(4))
      assert(prs.forall(p => p >= 0.0 && p <= 1.0), s"[$seg] pr out of range")
      // cd and pr must order identically with spend
      val sorted = rows.sortBy(_.getDouble(2))
      assert(sorted.map(_.getDouble(3)).toSeq ==
        sorted.map(_.getDouble(3)).toSeq.sorted, s"[$seg] cd not monotone")
    }
  }

  test("graph_components: two planted strong blocs + a weak bridge split correctly") {
    val dir = tmpDir("gcc")
    writeTable(dir, "nation", Schemas.nation,
      (0 to 4).map(i => Row(i, s"N$i", 0)))
    writeTable(dir, "customer", Schemas.customer,
      (0 to 4).map(i => Row(i.toLong, s"C$i", i, 0.0, "SEG")))
    writeTable(dir, "supplier", Schemas.supplier,
      (0 to 4).map(i => Row(i.toLong, s"S$i", i, 0.0)))
    val ts = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    // heavy 0↔1 and 2↔3 trade (10 lineitems each way) over six weight-1
    // background bridges; nation 4 isolated. Σw = 46 over 10 edges →
    // the ≥2×mean cutoff (w ≥ 9.2) keeps exactly the four 10-weight
    // edges → components {0,1}, {2,3}, {4}.
    val flows = Seq((0L, 1L, 10), (1L, 0L, 10), (2L, 3L, 10), (3L, 2L, 10),
                    (1L, 2L, 1), (2L, 1L, 1), (0L, 3L, 1), (3L, 0L, 1),
                    (0L, 2L, 1), (2L, 0L, 1))
    var oid = 0L
    val (orows, lrows) = flows.flatMap { case (cn, sn, w) =>
      (1 to w).map { _ =>
        oid += 1
        (Row(oid, cn, "O", 1.0, ts, "1"),
         Row(oid, 1L, sn, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts))
      }
    }.unzip
    writeTable(dir, "orders", Schemas.orders, orows)
    writeTable(dir, "lineitem", Schemas.lineitem, lrows)
    val out = GraphOps.components(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getInt(2), r.getLong(3)))).toMap
    assert(out == Map(0 -> ((0, 2L)), 1 -> ((0, 2L)),
                      2 -> ((2, 2L)), 3 -> ((2, 2L)), 4 -> ((4, 1L))),
      s"got $out")
  }

  test("graph_components on real data: labels are component minima and sizes consistent") {
    val rows = GraphOps.components(spark, sf0001).collect()
    assert(rows.length == 25)
    val byComp = rows.groupBy(_.getInt(2))
    byComp.foreach { case (comp, members) =>
      assert(members.map(_.getInt(0)).min == comp,
        s"component label must be its minimum member: $comp")
      members.foreach(m => assert(m.getLong(3) == members.length.toLong))
    }
    assert(rows.map(_.getLong(3)).map(_.toInt).sum ==
      byComp.values.map(m => m.length * m.length).sum) // Σ per-member size
  }

  test("mrr: planted rank-1 neighbor scores 1; lone label scores 0") {
    val dir = tmpDir("mrr")
    def vec(axis: Int, mag: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == axis) mag else 0.001f)
    // query 0: nearest neighbor (vec 10) shares label 7 → rr = 1.
    // query 1: same-label vec sits at rank 2 behind an off-label twin
    //   on the same axis → rr = 0.5.
    // query 2: only vector of label 9 → rr = 0.
    val rows = Seq(
      Row(0L, vec(0, 1.0f), 7),
      Row(1L, vec(1, 1.0f), 5),
      Row(2L, vec(40, 1.0f), 9),
      Row(10L, vec(0, 0.9f), 7),
      Row(11L, vec(1, 0.95f), 6), // rank-1 for query 1, wrong label
      Row(12L, vec(1, 0.9f), 5))
    writeTable(dir, "embeddings", embeddingsSchema, rows)
    val out = RetrievalOps.mrr(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(0L -> 1.0, 1L -> 0.5, 2L -> 0.0), s"got $out")
    val mrr = RetrievalOps.mrr(spark, dir).collect().head.getDouble(2)
    assert(math.abs(mrr - 0.5) < 1e-9, s"panel mrr: $mrr")
  }

  test("abc_pareto: exact integer class boundaries (80/95) with custkey tiebreak") {
    val dir = tmpDir("abc")
    def o(k: Long, cust: Long, cents: Long) =
      Row(k, cust, "O", cents / 100.0,
          java.sql.Timestamp.valueOf("1995-01-01 00:00:00"), "1")
    // spends 80/15/5 cents → cums 80, 95, 100: both class boundaries land
    // EXACTLY on the 80%/95% lines — pins the ≤ (inclusive) integer rule.
    writeTable(dir, "orders", Schemas.orders, Seq(
      o(1L, 1L, 80L), o(2L, 2L, 15L), o(3L, 3L, 5L)))
    val out = ReportOps.abcPareto(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(out == Map("A" -> ((1L, 0.8)), "B" -> ((1L, 0.15)),
                      "C" -> ((1L, 0.05))), s"got $out")
  }

  test("event_dwell: gap attributed to the type being left; last event drops") {
    val dir = tmpDir("dwell")
    writeEvents(dir, Seq(
      eventRow(1L, 100L, 1L, "a", 0.0),
      eventRow(2L, 110L, 1L, "b", 0.0),
      eventRow(3L, 130L, 1L, "a", 0.0),   // user 1's last event → drops
      eventRow(4L, 500L, 2L, "b", 0.0)))  // user 2's only event → drops
    val out = WindowOps.eventDwell(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq(("a", 1L, 10.0), ("b", 1L, 20.0)), s"got $out")
  }

  test("top_movers: per-week rank is by |delta| with name tiebreak") {
    val dir = tmpDir("movers")
    val mon = 1704067200L // 2024-01-01, a Monday
    def burst(tsBase: Long, n: Int, typ: String, id0: Long) =
      (0 until n).map(i => eventRow(id0 + i, tsBase + i, 1L, typ, 0.0))
    writeEvents(dir,
      burst(mon, 10, "x", 100L) ++ burst(mon + 604800, 13, "x", 200L) ++
        burst(mon + 2 * 604800, 13, "x", 300L) ++
        burst(mon, 5, "y", 400L) ++ burst(mon + 604800, 4, "y", 500L) ++
        burst(mon + 2 * 604800, 8, "y", 600L))
    val out = TimeSeriesOps.topMovers(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getString(2),
                 r.getLong(5))).toSeq
    assert(out == Seq(
      ("2024-01-08", 1, "x", 3L), ("2024-01-08", 2, "y", -1L),
      ("2024-01-15", 1, "y", 4L), ("2024-01-15", 2, "x", 0L)), s"got $out")
  }

  test("quarantine: one row per violated gate; clean docs absent") {
    val dir = tmpDir("quar")
    val diverse = (1 to 40).map(i => s"w$i").mkString(" ")  // ttr = 1.0
    val repet = (("dup " * 39) + "x").trim                  // ttr = 2/40
    writeTable(dir, "documents", documentsSchema, Seq(
      Row(1L, diverse, "en", "s0", 300L),   // clean
      Row(2L, diverse, "en", "s0", 100L),   // too_short
      Row(3L, diverse, "de", "s0", 300L),   // lang_not_target
      Row(4L, repet, "en", "s0", 300L),     // low_diversity
      Row(5L, repet, "zh", "s0", 100L)))    // all three
    val out = CurationOps.quarantine(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set(
      (2L, "too_short"), (3L, "lang_not_target"), (4L, "low_diversity"),
      (5L, "too_short"), (5L, "lang_not_target"), (5L, "low_diversity")),
      s"got $out")
  }

  test("graph_2hop: strong 2-hop reco surfaces the missing direct tie") {
    val dir = tmpDir("twohop")
    writeTable(dir, "customer", Schemas.customer,
      (0 to 2).map(i => Row(i.toLong, s"C$i", i, 0.0, "SEG")))
    writeTable(dir, "supplier", Schemas.supplier,
      (0 to 2).map(i => Row(i.toLong, s"S$i", i, 0.0)))
    // weights: 0→1 and 1→2 are strong (w·|E| ≥ 2·Σw: 9·6 ≥ 2·22); the
    // four w=1 edges dilute the mean and stay weak. Expected reco:
    // (0, 2) via 1 — reachable in 2 strong hops, no strong direct tie.
    val edges = Seq((0L, 1L, 9), (1L, 2L, 9), (0L, 2L, 1),
                    (1L, 0L, 1), (2L, 0L, 1), (2L, 1L, 1))
    writeTable(dir, "orders", Schemas.orders,
      edges.zipWithIndex.map { case ((src, _, _), i) =>
        Row(i.toLong, src, "O", 1.0,
            java.sql.Timestamp.valueOf("1995-01-01 00:00:00"), "1") })
    writeTable(dir, "lineitem", Schemas.lineitem,
      edges.zipWithIndex.flatMap { case ((_, dst, w), i) =>
        (1 to w).map(ln =>
          Row(i.toLong, 1L, dst, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
              java.sql.Timestamp.valueOf("1995-02-01 00:00:00"))) })
    val out = GraphOps.twoHop(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((0, 2, 1L, 9L)), s"got $out")
  }

  /** Shared planted-graph writer for the r13 graph trio: nations 0..n-1,
    * customer/supplier i in nation i, one order+w lineitems per directed
    * edge (cn → sn, weight w). */
  private def writeTradeGraph(dir: String, n: Int,
                              edges: Seq[(Long, Long, Int)]): Unit = {
    writeTable(dir, "nation", Schemas.nation,
      (0 until n).map(i => Row(i, s"N$i", 0)))
    writeTable(dir, "customer", Schemas.customer,
      (0 until n).map(i => Row(i.toLong, s"C$i", i, 0.0, "SEG")))
    writeTable(dir, "supplier", Schemas.supplier,
      (0 until n).map(i => Row(i.toLong, s"S$i", i, 0.0)))
    val ts = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    writeTable(dir, "orders", Schemas.orders,
      edges.zipWithIndex.map { case ((src, _, _), i) =>
        Row(i.toLong, src, "O", 1.0, ts, "1") })
    writeTable(dir, "lineitem", Schemas.lineitem,
      edges.zipWithIndex.flatMap { case ((_, dst, w), i) =>
        (1 to w).map(ln =>
          Row(i.toLong, 1L, dst, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", ts)) })
  }

  test("hits: hand-computed two-iteration hub/authority scores") {
    val dir = tmpDir("hits")
    // a1(1)=1, a1(2)=3; h1(0)=2·3+1·1=7, h1(1)=1·3=3;
    // a2(1)=1·7=7, a2(2)=2·7+1·3=17 → hub 1, 3/7, 0; auth 0, 7/17, 1.
    writeTradeGraph(dir, 3, Seq((0L, 2L, 2), (1L, 2L, 1), (0L, 1L, 1)))
    val out = GraphOps.hits(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out == Map(0 -> ((1.0, 0.0)), 1 -> ((0.4286, 0.4118)),
                      2 -> ((0.0, 1.0))), s"got $out")
  }

  test("graph_reciprocity: returned tie counts; 0-out nations report NULL rate") {
    val dir = tmpDir("recip")
    // Σw=33 over 9 edges → strong needs w·9 ≥ 66 → the three w=9 edges:
    // 0→1, 1→0 (mutual) and 2→3 (one-way); nation 4 isolated.
    writeTradeGraph(dir, 5, Seq(
      (0L, 1L, 9), (1L, 0L, 9), (2L, 3L, 9),
      (3L, 2L, 1), (0L, 2L, 1), (2L, 0L, 1),
      (1L, 3L, 1), (3L, 1L, 1), (0L, 3L, 1)))
    val out = GraphOps.reciprocity(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
                 Option(r.get(4)).map(_.asInstanceOf[Double]))).toSeq
    assert(out == Seq(
      (0, 1L, 1L, Some(1.0)), (1, 1L, 1L, Some(1.0)),
      (2, 1L, 0L, Some(0.0)), (3, 0L, 0L, None), (4, 0L, 0L, None)),
      s"got $out")
  }

  test("rsi: monotone-up series hits 100 exactly after 14 deltas; warm-up NULL") {
    val dir = tmpDir("rsi")
    // 16 days, +1.00 revenue per day → all 15 deltas are gains; the
    // 14-delta window first fills on the 14th delta row
    writeTable(dir, "orders", Schemas.orders, (1 to 16).map { i =>
      Row(i.toLong, 1L, "O", 10.0 + i,
          java.sql.Timestamp.valueOf(f"1995-01-$i%02d 00:00:00"), "1")
    })
    val out = TimeSeriesOps.rsi(spark, dir).collect()
      .map(r => (r.getDouble(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(out.length == 15)
    assert(out.forall(_._1 == 1.0), s"got ${out.toSeq}")
    assert(out.take(13).forall(_._2.isEmpty), "warm-up rows must be NULL")
    assert(out.drop(13).forall(_._2.contains(100.0)), s"got ${out.toSeq}")
  }

  test("sax: low-then-high step series reads bbbbcccc") {
    val dir = tmpDir("sax")
    // 16 days: 1 event/day then 3/day → n=16, Σx=32, Σx²=80; each
    // 2-day segment: low z = (16·2−2·32)/(2·√((16·80−32²)·16)) = −0.25,
    // high z = +0.25 — inside (−0.6745, 0) and [0, 0.6745) → b / c
    var id = 0L
    writeEvents(dir, (0 until 16).flatMap { day =>
      (1 to (if (day < 8) 1 else 3)).map { _ =>
        id += 1; eventRow(id, day * 86400L + 10, 1L, "view", 0.0)
      }
    })
    val out = TimeSeriesOps.sax(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(out.map(_._4).mkString == "bbbbcccc", s"got ${out.toSeq}")
    assert(out.forall(_._2 == 2L))
    assert(out.take(4).forall(_._3 == -0.25) && out.drop(4).forall(_._3 == 0.25),
      s"got ${out.toSeq}")
  }

  test("price_index: matched-parts unit-value index; base month pins 100") {
    val dir = tmpDir("pidx")
    val ts1 = java.sql.Timestamp.valueOf("1995-01-05 00:00:00")
    val ts2 = java.sql.Timestamp.valueOf("1995-02-05 00:00:00")
    writeTable(dir, "orders", Schemas.orders, Seq(
      Row(1L, 1L, "O", 1.0, ts1, "1"), Row(2L, 1L, "O", 1.0, ts2, "1")))
    def li(ok: Long, pk: Long, qty: Double, ext: Double) =
      Row(ok, pk, 1L, 1, qty, ext, 0.0, 0.0, "N", "O", ts1)
    // base month: p1 qty2 @200c, p2 qty1 @100c; month 2: p1 qty1 @150c,
    // p2 qty2 @300c → index₂ = 100·(450·3)/(3·300) = 150
    writeTable(dir, "lineitem", Schemas.lineitem, Seq(
      li(1L, 1L, 2.0, 2.0), li(1L, 2L, 1.0, 1.0),
      li(2L, 1L, 1.0, 1.5), li(2L, 2L, 2.0, 3.0)))
    val out = ReportOps.priceIndex(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq(("1995-01-01", 2L, 100.0), ("1995-02-01", 2L, 150.0)),
      s"got $out")
  }

  test("fk_audit: one planted orphan per edge") {
    val dir = tmpDir("fka")
    val ts = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    writeTable(dir, "customer", Schemas.customer,
      Seq(Row(1L, "C1", 0, 0.0, "SEG")))
    writeTable(dir, "part", Schemas.part,
      Seq(Row(1L, "P1", "B", "T", 1, 1.0)))
    writeTable(dir, "supplier", Schemas.supplier, Seq(Row(1L, "S1", 0, 0.0)))
    writeTable(dir, "orders", Schemas.orders, Seq(
      Row(1L, 1L, "O", 1.0, ts, "1"), Row(2L, 99L, "O", 1.0, ts, "1")))
    writeTable(dir, "lineitem", Schemas.lineitem, Seq(
      Row(1L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts),
      Row(77L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts),
      Row(1L, 88L, 1L, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", ts),
      Row(1L, 1L, 66L, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", ts)))
    writeTable(dir, "documents", documentsSchema,
      Seq(Row(1L, "t", "en", "s0", 1L)))
    writeTable(dir, "embeddings", embeddingsSchema, Seq(
      Row(1L, Seq.tabulate(64)(_ => 0.1f), 0),
      Row(2L, Seq.tabulate(64)(_ => 0.1f), 0)))
    val out = graft.operators.ReportShapeOps.fkAudit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
                                    r.getDouble(3)))).toMap
    assert(out == Map(
      "embeddings.vec_id->documents" -> ((2L, 1L, 0.5)),
      "lineitem.l_orderkey->orders" -> ((4L, 1L, 0.25)),
      "lineitem.l_partkey->part" -> ((4L, 1L, 0.25)),
      "lineitem.l_suppkey->supplier" -> ((4L, 1L, 0.25)),
      "orders.o_custkey->customer" -> ((2L, 1L, 0.5))), s"got $out")
  }

  test("simhash_hamming_hist: identical docs pair at distance 0; blocking scopes sources") {
    val dir = tmpDir("shh")
    // d1 = d2 (same lang/source) → one pair, hamming 0; d3 lives in a
    // DIFFERENT source, so blocking keeps it out of every bucket d1/d2
    // occupy → the histogram is exactly one pair at 0, zeros elsewhere
    val t = "spark shuffles the hashed tokens into banded buckets"
    writeTable(dir, "documents", documentsSchema, Seq(
      Row(1L, t, "en", "s0", t.length.toLong),
      Row(2L, t, "en", "s0", t.length.toLong),
      Row(3L, "entirely different words live here", "en", "s1", 34L)))
    val out = graft.operators.LlmOps.simhashHammingHist(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out.size == 33)
    assert(out(0) == 1L, s"got $out")
    assert(out.filterKeys(_ > 0).values.forall(_ == 0L), s"got $out")
  }

  test("source_terms: weirdness ranks the source-exclusive token first") {
    val dir = tmpDir("sterm")
    val s0 = ("alpha " * 5 + "common " * 5).trim
    val s1 = ("beta " * 5 + "common " * 5).trim
    writeTable(dir, "documents", documentsSchema, Seq(
      Row(1L, s0, "en", "s0", s0.length.toLong),
      Row(2L, s1, "en", "s1", s1.length.toLong)))
    val out = graft.operators.LlmOps.sourceTerms(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3),
                 r.getDouble(4))).toSeq
    // weirdness: exclusive tok = (5·20)/(10·5) = 2.0; common = 1.0
    assert(out == Seq(
      ("s0", 1, "alpha", 5L, 2.0), ("s0", 2, "common", 5L, 1.0),
      ("s1", 1, "beta", 5L, 2.0), ("s1", 2, "common", 5L, 1.0)), s"got $out")
  }

  test("dedup_eval: identical pair is candidate, truth and TP; perfect operating point") {
    val dir = tmpDir("deval")
    val t = "spark shuffles the hashed tokens into banded buckets"
    writeTable(dir, "documents", documentsSchema, Seq(
      Row(1L, t, "en", "s0", t.length.toLong),
      Row(2L, t, "en", "s0", t.length.toLong),
      Row(3L, "entirely different words live over here now", "en", "s1", 43L)))
    val out = graft.operators.LlmOps.dedupEval(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4)) == ((1L, 1L, 1L, 1.0, 1.0)),
      s"got $r")
  }

  test("k_anonymity: planted class sizes cross each k threshold exactly") {
    val dir = tmpDir("kanon")
    // classes: (0,A)×1, (0,B)×3, (1,A)×10 → 14 rows
    val rows = Seq.fill(1)((0, "A")) ++ Seq.fill(3)((0, "B")) ++
      Seq.fill(10)((1, "A"))
    writeTable(dir, "customer", Schemas.customer,
      rows.zipWithIndex.map { case ((n, seg), i) =>
        Row(i.toLong, s"C$i", n, 0.0, seg) })
    val out = graft.operators.CurationOps.kAnonymity(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq((2, 1L, 1L, 0.0714), (5, 2L, 4L, 0.2857),
                      (10, 2L, 4L, 0.2857), (20, 3L, 14L, 1.0)), s"got $out")
  }

  test("ratio_metric: hand-computed delta-method SE; n=1 arm reports NULL se") {
    val dir = tmpDir("ratio")
    // md5-parity arms: users 1,3 → A; user 2 → B.
    // A: (x,y) = (1,4),(2,2) → R=0.5, Σd² = 5−2·0.5·8+0.25·20 = 2,
    //    se = √(2·2/1)/6 = 0.3333;  B: single user, 0 purchases.
    var id = 0L
    def ev(u: Long, typ: String) = { id += 1; eventRow(id, id * 10, u, typ, 0.0) }
    writeEvents(dir, Seq(
      ev(1L, "purchase"), ev(1L, "view"), ev(1L, "view"), ev(1L, "view"),
      ev(3L, "purchase"), ev(3L, "purchase"),
      ev(2L, "view"), ev(2L, "view"), ev(2L, "view")))
    val out = TimeSeriesOps.ratioMetric(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 Option(r.get(4)).map(_.asInstanceOf[Double]),
                 Option(r.get(5)).map(_.asInstanceOf[Double]))).toSeq
    assert(out == Seq(
      ("A", 2L, 3L, 6L, Some(0.5), Some(0.3333)),
      ("B", 1L, 0L, 3L, Some(0.0), None)), s"got $out")
  }

  test("holt_winters: three-step hand fold pins level, trend, seasonal slots") {
    val dir = tmpDir("hw")
    // cents 100, 200, 300 on consecutive days; dyadic halvings:
    // rn2 (slot 2): L=150, b=25, s2=25; rn3 (slot 3): L=237.5,
    // b=56.25, s3=31.25; forecast slot (3+1)%7=4 → 293.75
    writeTable(dir, "orders", Schemas.orders, (1 to 3).map { i =>
      Row(i.toLong, 1L, "O", i.toDouble,
          java.sql.Timestamp.valueOf(f"1995-01-0$i 00:00:00"), "1")
    })
    val out = TimeSeriesOps.holtWinters(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2)) ==
      ((3L, 2.375, 0.5625)), s"got $r")
    assert((r.getDouble(5), r.getDouble(6)) == ((0.25, 0.3125)), s"got $r")
    assert(Seq(3, 4, 7, 8, 9).map(r.getDouble) == Seq(0.0, 0.0, 0.0, 0.0, 0.0),
      s"got $r")
    assert(r.getDouble(10) == 2.9375, s"got $r")
  }

  test("embed_drift: planted centroid shift is exact; one-sided label is NULL") {
    val dir = tmpDir("edrift")
    def vec(mag: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == 0) mag else 0.0f)
    // ids 1,2 land in half 1 (2·id < 1+5), 3,4,5 in half 2; label 0
    // centroids 2.0 vs 6.0 on lane 0 → drift 4; label 1 has no
    // first-half vectors → NULL drift
    writeTable(dir, "embeddings", embeddingsSchema, Seq(
      Row(1L, vec(1.0f), 0), Row(2L, vec(3.0f), 0),
      Row(3L, vec(5.0f), 0), Row(4L, vec(7.0f), 0),
      Row(5L, vec(9.0f), 1)))
    val out = graft.operators.LlmOps.embedDrift(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
                 Option(r.get(3)).map(_.asInstanceOf[Double]))).toSeq
    assert(out == Seq((0, 2L, 2L, Some(4.0)), (1, 0L, 1L, None)), s"got $out")
  }

  test("attribution_markov: hand-built chain pins P, removal effects and shares") {
    val dir = tmpDir("markov")
    // journeys: u1 a→CONV, u2 b→CONV, u3 a→NULL, u4 direct CONV.
    // START: a ½, b ¼, CONV ¼; a: CONV ½, NULL ½; b: CONV 1.
    // P = ¼ + ½·½ + ¼ = 0.75; remove a → 0.5; remove b → 0.5;
    // RE = 1 − 0.5/0.75 = ⅓ each → shares 0.5/0.5.
    writeEvents(dir, Seq(
      eventRow(1L, 100L, 1L, "a", 0.0), eventRow(2L, 200L, 1L, "purchase", 0.0),
      eventRow(3L, 100L, 2L, "b", 0.0), eventRow(4L, 200L, 2L, "purchase", 0.0),
      eventRow(5L, 100L, 3L, "a", 0.0),
      eventRow(6L, 100L, 4L, "purchase", 0.0)))
    val out = WindowOps.attributionMarkov(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
                 r.getDouble(3), r.getDouble(4))).toSeq
    assert(out == Seq(
      ("a", 0.75, 0.5, 0.3333, 0.5),
      ("b", 0.75, 0.5, 0.3333, 0.5)), s"got $out")
  }

  test("key_skew: hot key share and skew ratio are exact") {
    val dir = tmpDir("kskew")
    val ts = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    // custkey 1 owns 5 of 9 orders → max_share 5/9, skew 5·5/9
    writeTable(dir, "orders", Schemas.orders,
      (1 to 9).map(i => Row(i.toLong, if (i <= 5) 1L else i.toLong - 3,
                            "O", 1.0, ts, "1")))
    writeTable(dir, "lineitem", Schemas.lineitem, Seq(
      Row(1L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts)))
    writeEvents(dir, Seq(eventRow(1L, 100L, 7L, "view", 0.0)))
    val out = graft.operators.LayoutOps.keySkew(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(out("orders.o_custkey") == ((9L, 5L, 5L, 0.5556, 1.0, 2.7778)),
      s"got $out")
    assert(out("lineitem.l_orderkey") == ((1L, 1L, 1L, 1.0, 1.0, 1.0)))
    assert(out("lineitem.l_suppkey") == ((1L, 1L, 1L, 1.0, 1.0, 1.0)))
    assert(out("events.user_id") == ((1L, 1L, 1L, 1.0, 1.0, 1.0)))
  }

  test("assortativity: planted star graph gives exactly -1") {
    val dir = tmpDir("assort")
    // strong cutoff keeps 0→1 and 0→2 (w·6 ≥ 2·22 ⇔ w ≥ 7.33) → an
    // undirected 2-star; hub degree 2 always pairs with leaf degree 1
    // at both ends → Pearson r over end-degrees is exactly −1.
    writeTradeGraph(dir, 3, Seq(
      (0L, 1L, 9), (0L, 2L, 9),
      (1L, 0L, 1), (1L, 2L, 1), (2L, 0L, 1), (2L, 1L, 1)))
    val out = GraphOps.assortativity(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 4L, s"got ${out.head}")
    assert(out.head.getDouble(1) == -1.0, s"got ${out.head}")
  }

  test("local_clustering: planted triangle + pendant gives exact coefficients") {
    val dir = tmpDir("lcc")
    // strong cutoff keeps the four w=9 edges (9·10 ≥ 2·42): an
    // undirected triangle 0-1-2 plus pendant 2-3. Node 0/1: both
    // neighbors connected → lcc 1; node 2: one of three pairs closed
    // → 1/3; node 3: deg 1 → NULL.
    writeTradeGraph(dir, 4, Seq(
      (0L, 1L, 9), (1L, 2L, 9), (0L, 2L, 9), (2L, 3L, 9),
      (1L, 0L, 1), (2L, 1L, 1), (2L, 0L, 1),
      (3L, 2L, 1), (3L, 0L, 1), (3L, 1L, 1)))
    val out = GraphOps.localClustering(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getLong(3),
                 Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(out(0) == ((2L, 1L, Some(1.0))), s"got $out")
    assert(out(1) == ((2L, 1L, Some(1.0))), s"got $out")
    assert(out(2) == ((3L, 1L, Some(0.3333))), s"got $out")
    assert(out(3) == ((1L, 0L, None)), s"pendant must be NULL: $out")
  }

  test("adamic_adar: path graph scores the open pair 1/ln(2)") {
    val dir = tmpDir("aa")
    // strong = path 0-1-2 (w=9 clears 9·5 ≥ 2·21); the only
    // non-adjacent pair (0,2) shares neighbor 1 with degree 2
    writeTradeGraph(dir, 3, Seq(
      (0L, 1L, 9), (1L, 2L, 9),
      (1L, 0L, 1), (2L, 1L, 1), (2L, 0L, 1)))
    val out = GraphOps.adamicAdar(spark, dir).collect()
    assert(out.length == 1)
    assert((out.head.getInt(0), out.head.getInt(1), out.head.getLong(2),
            out.head.getDouble(3)) == ((0, 2, 1L, 1.4427)), s"got ${out.toSeq}")
  }

  test("graph_bfs: chain hops from the tie-broken strongest exporter") {
    val dir = tmpDir("bfs")
    // strong = 0→1→2; out-weight ties at 9 → smallest key 0 is source
    writeTradeGraph(dir, 3, Seq(
      (0L, 1L, 9), (1L, 2L, 9),
      (1L, 0L, 1), (2L, 1L, 1), (2L, 0L, 1)))
    val out = GraphOps.graphBfs(spark, dir).collect()
      .map(r => r.getInt(0) -> ((Option(r.get(2)).map(_.asInstanceOf[Int]),
                                 r.getBoolean(3)))).toMap
    assert(out == Map(0 -> ((Some(0), true)), 1 -> ((Some(1), false)),
                      2 -> ((Some(2), false))), s"got $out")
  }

  test("k_core: triangle survives the 2-core peel, pendant falls at layer 1") {
    val dir = tmpDir("kcore")
    writeTradeGraph(dir, 4, Seq(
      (0L, 1L, 9), (1L, 2L, 9), (0L, 2L, 9), (2L, 3L, 9),
      (1L, 0L, 1), (2L, 1L, 1), (2L, 0L, 1),
      (3L, 2L, 1), (3L, 0L, 1), (3L, 1L, 1)))
    val out = GraphOps.kCore(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getBoolean(2),
                 Option(r.get(3)).map(_.asInstanceOf[Int])))).toMap
    assert(out == Map(0 -> ((true, None)), 1 -> ((true, None)),
                      2 -> ((true, None)), 3 -> ((false, Some(1)))),
      s"got $out")
  }

  test("zscore_scale: per-group z and min-max; degenerate group yields NULLs") {
    val dir = tmpDir("zscore")
    writeTable(dir, "documents", documentsSchema, Seq(
      Row(1L, "t", "en", "s0", 10L), Row(2L, "t", "en", "s0", 20L),
      Row(3L, "t", "en", "s0", 30L),
      Row(4L, "t", "de", "s0", 99L)))  // singleton group: zero var/range
    val out = graft.operators.EvalOps.zscoreScale(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    // n=3, Σx=60, Σx²=1400 → z = (3x−60)/√600; mm spans [0, 1] exactly
    assert(out(1L)._2.contains(0.0) && out(2L)._2.contains(0.5) &&
           out(3L)._2.contains(1.0), s"got $out")
    assert(out(1L)._1.exists(z => math.abs(z + 1.2247) < 1e-4), s"got $out")
    assert(out(2L)._1.contains(0.0), s"got $out")
    assert(out(4L) == ((None, None)), s"degenerate group must be NULL: $out")
  }

  test("compaction_plan: prefix-sum binning hits ceil(total/8) targets") {
    val dir = tmpDir("compact")
    // 8 sources × 3 bytes → total 24, target 3 → shard i lands in bin i
    writeTable(dir, "documents", documentsSchema,
      (0 to 7).map(i => Row(i.toLong, "t", "en", s"s$i", 3L)))
    val out = graft.operators.LayoutOps.compactionPlan(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == (0 to 7).map(i => (s"s$i", 3L, 3L * i, i.toLong)),
      s"got ${out.toSeq}")
  }

  test("holt_linear: hand-computed two-day recurrence") {
    val dir = tmpDir("holt")
    def o(k: Long, price: Double, day: String) =
      Row(k, 1L, "O", price, java.sql.Timestamp.valueOf(s"$day 00:00:00"), "1")
    // cents 100 then 200: l₂ = ½·200 + ½·100 = 150, b₂ = ½·50 = 25
    writeTable(dir, "orders", Schemas.orders, Seq(
      o(1L, 1.0, "1995-01-01"), o(2L, 2.0, "1995-01-02")))
    val r = TimeSeriesOps.holtLinear(spark, dir).collect().head
    assert((r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
            r.getDouble(4)) == (("1", 2L, 1.5, 0.25, 3.25)), s"got $r")
  }

  test("burstiness: Fano factor over hand-built daily counts") {
    val dir = tmpDir("fano")
    // type a: day-1 count 1, day-2 count 3 → mean 2, var 1, fano 0.5
    writeEvents(dir, Seq(
      eventRow(1L, 1000L, 1L, "a", 0.0),
      eventRow(2L, 87400L, 1L, "a", 0.0),
      eventRow(3L, 87401L, 2L, "a", 0.0),
      eventRow(4L, 87402L, 3L, "a", 0.0)))
    val r = TimeSeriesOps.burstiness(spark, dir).collect().head
    assert((r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
            r.getDouble(4)) == (("a", 2L, 2.0, 1.0, 0.5)), s"got $r")
  }

  test("user_entropy: uniform two-type user = ln 2; single-type user = 0") {
    val dir = tmpDir("entropy")
    writeEvents(dir, Seq(
      eventRow(1L, 100L, 1L, "a", 0.0), eventRow(2L, 101L, 1L, "a", 0.0),
      eventRow(3L, 102L, 1L, "b", 0.0), eventRow(4L, 103L, 1L, "b", 0.0),
      eventRow(5L, 104L, 2L, "a", 0.0), eventRow(6L, 105L, 2L, "a", 0.0)))
    val out = WindowOps.userEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
                                  r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 2L, 0.6931)), s"got $out") // round(ln 2, 4)
    assert(out(2L) == ((2L, 1L, 0.0)), s"got $out")
  }

  test("heaps_law: beta in (0,1) and final vocab agrees with novelty_decay") {
    val h = graft.operators.LlmOps.heapsLaw(spark, sf0001).collect().head
    val (n, vocabFinal, beta, k) =
      (h.getLong(0), h.getLong(2), h.getDouble(3), h.getDouble(4))
    assert(n == 10L, s"epochs: $n")
    assert(beta > 0.0 && beta < 1.0, s"beta out of Heaps range: $beta")
    assert(k > 0.0, s"k must be positive: $k")
    val nd = graft.operators.LlmOps.noveltyDecay(spark, sf0001).collect()
    assert(nd.last.getLong(4) == vocabFinal,
      s"vocab_final ${vocabFinal} != novelty_decay cum ${nd.last.getLong(4)}")
  }

  test("sample_balanced: every class capped at the smallest class size") {
    val dir = tmpDir("balanced")
    writeTable(dir, "documents", documentsSchema,
      Seq(Row(1L, "t", "en", "s0", 10L), Row(2L, "t", "en", "s0", 10L),
          Row(3L, "t", "en", "s0", 10L), Row(4L, "t", "de", "s0", 10L)))
    val out = CurationOps.sampleBalanced(spark, dir).collect()
    assert(out.length == 2, s"got ${out.toSeq}")
    assert(out.map(_.getString(0)).toSet == Set("en", "de"), s"got ${out.toSeq}")
    assert(out.forall(r => r.getLong(1) == 1L && r.getLong(4) == 1L),
      s"got ${out.toSeq}")
  }

  test("join_asof_tol: in-tolerance click matches, stale and absent null out") {
    val dir = tmpDir("asoftol")
    writeEvents(dir, Seq(
      eventRow(10L, 100L, 1L, "click", 0.0),
      eventRow(11L, 200L, 1L, "purchase", 0.0),   // gap 100 s → matched
      eventRow(12L, 4100L, 1L, "purchase", 0.0),  // gap 3900 s → stale
      eventRow(13L, 500L, 2L, "purchase", 0.0)))  // no prior click
    val out = graft.operators.JoinOps.joinAsofTol(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(out == Map(
      11L -> ((Some(10L), Some(100000000L))),
      12L -> ((None, None)),
      13L -> ((None, None))), s"got $out")
  }

  test("ann_recall: per-query recall@3 in [0,1], macro average above the floor") {
    val rows = graft.operators.LlmOps.annRecall(spark, sf0001).collect()
    assert(rows.length == 10, s"10 query points expected: ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(1) == 3L, s"n_exact must be 3: $r")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"recall range: $r")
    }
    val avg = rows.map(_.getDouble(3)).sum / rows.length
    assert(avg >= 0.6, s"macro recall@3 $avg below the AnnRecallSpec floor")
  }

  test("ship_lag: hand-built lags give exact mean and late rate") {
    val dir = tmpDir("shiplag")
    def o(k: Long, day: String) =
      Row(k, 1L, "O", 1.0, java.sql.Timestamp.valueOf(s"$day 00:00:00"), "1")
    def l(k: Long, ship: String) =
      Row(k, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
          java.sql.Timestamp.valueOf(s"$ship 00:00:00"))
    writeTable(dir, "orders", Schemas.orders,
      Seq(o(1L, "1995-03-01"), o(2L, "1995-03-10")))
    // lags: 10 days and 40 days → mean 25.0, late rate 0.5
    writeTable(dir, "lineitem", Schemas.lineitem,
      Seq(l(1L, "1995-03-11"), l(2L, "1995-04-19")))
    val r = ReportOps.shipLag(spark, dir).collect().head
    assert((r.getDate(0).toString, r.getLong(1), r.getDouble(2),
            r.getLong(3), r.getDouble(4)) ==
           (("1995-03-01", 2L, 25.0, 1L, 0.5)), s"got $r")
  }

  test("purchase_interval: two known gaps give exact mean and median") {
    val dir = tmpDir("ipt")
    writeEvents(dir, Seq(
      eventRow(1L, 0L, 1L, "purchase", 0.0),
      eventRow(2L, 86400L, 1L, "purchase", 0.0),        // gap 1 day
      eventRow(3L, 86400L * 4, 1L, "purchase", 0.0),    // gap 3 days
      eventRow(4L, 50L, 2L, "click", 0.0)))             // not a purchase
    val r = TimeSeriesOps.purchaseInterval(spark, dir).collect().head
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2)) ==
           ((2L, 2.0, 2.0)), s"got $r")
  }

  test("seasonal_decompose: a constant series decomposes to zero seasonal and residual") {
    val dir = tmpDir("decomp")
    // 14 consecutive days, 1.00 revenue each → 8 full-frame days, all
    // with trend = 1.0, seasonal = 0, residual = 0
    writeTable(dir, "orders", Schemas.orders,
      (0 until 14).map { i =>
        Row(i.toLong, 1L, "O", 1.0,
            java.sql.Timestamp.valueOf(f"1995-03-${i + 1}%02d 00:00:00"), "1")
      })
    val rows = TimeSeriesOps.seasonalDecompose(spark, dir).collect()
    assert(rows.length == 8, s"full-frame days: ${rows.length}")
    rows.foreach { r =>
      assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0 &&
             r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0, s"got $r")
    }
  }

  test("cohort_ltv: cumulative per-member revenue over weeks since signup") {
    val dir = tmpDir("cltv")
    val mon = 1704067200L // 2024-01-01, a Monday
    // cohort of 2 users signing up week 0: week-0 spend 1.00 + 3.00,
    // week-1 spend 2.00 (user 1 only) → cum/user: 2.00 then 3.00
    writeEvents(dir, Seq(
      eventRow(1L, mon, 1L, "purchase", 1.0),
      eventRow(2L, mon + 60, 2L, "purchase", 3.0),
      eventRow(3L, mon + 604800, 1L, "purchase", 2.0)))
    val out = TimeSeriesFixturesLtv.rows(ReportOps.cohortLtv(spark, dir))
    assert(out == Seq(
      ("2024-01-01", 0L, 2L, 4.0, 2.0),
      ("2024-01-01", 1L, 2L, 2.0, 3.0)), s"got $out")
  }

  test("stickiness: DAU/MAU from hand-built activity") {
    val dir = tmpDir("sticky")
    val mar1 = 794016000L // 1995-03-01
    // March: day-1 users {1,2}, day-2 user {1} → avg DAU 1.5, MAU 2,
    // stickiness 0.75; user 1's double event on day 1 must not double-count
    writeEvents(dir, Seq(
      eventRow(1L, mar1, 1L, "view", 0.0),
      eventRow(2L, mar1 + 10, 1L, "view", 0.0),
      eventRow(3L, mar1 + 20, 2L, "view", 0.0),
      eventRow(4L, mar1 + 86400, 1L, "view", 0.0)))
    val r = ReportOps.stickiness(spark, dir).collect().head
    assert((r.getDate(0).toString, r.getLong(1), r.getDouble(2),
            r.getLong(3), r.getDouble(4)) ==
           (("1995-03-01", 2L, 1.5, 2L, 0.75)), s"got $r")
  }
}

/** Row extractor for the cohort-LTV curve shape. */
object TimeSeriesFixturesLtv {
  def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long, Double, Double)] =
    df.collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
                           r.getDouble(3), r.getDouble(4))).toSeq
}

/** Small helpers shared by the r6 tests. */
object TimeSeriesFixtures {
  def asMap(df: org.apache.spark.sql.DataFrame): Map[(String, String), (Long, Double)] =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
}
