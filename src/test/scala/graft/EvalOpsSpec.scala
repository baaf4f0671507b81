package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EvalOps, RelationalOps, ReportOps, CurationOps}

/** Semantic invariants of the r11 eval/relational batch — each checked
  * against independently-derived truths on the real sf0.001 driver data
  * (the hash gate proves oracle equality; these prove the MATH means
  * what the scaladoc claims). */
class EvalOpsSpec extends AnyFunSuite {
  import TestBase._

  test("calibration: bins partition all users and ECE is the mass-weighted gap sum") {
    val rows = EvalOps.calibration(spark, sf0001).collect()
    val nUsers = Tables.events(spark, sf0001)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nUsers)
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 9))
    // ECE column is constant and equals sum(n_b/N * gap_b) within
    // rounding slack (each gap is r4'd independently of the exact ECE)
    val ece = rows.map(_.getDouble(5)).distinct
    assert(ece.length == 1)
    val recomputed = rows.map(r => r.getLong(1).toDouble / nUsers * r.getDouble(4)).sum
    assert(math.abs(ece.head - recomputed) < 1e-3,
      s"ece ${ece.head} vs weighted gaps $recomputed")
  }

  test("pr curve: recall monotone as the threshold falls; endpoints correct") {
    val rows = EvalOps.prCurve(spark, sf0001).collect()
      .sortBy(-_.getLong(0)) // descending threshold = ascending coverage
    val recalls = rows.map(_.getDouble(4))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
    assert(math.abs(recalls.last - 1.0) < 1e-9,
      "lowest threshold must cover every positive")
    val tps = rows.map(_.getLong(1))
    assert(tps.zip(tps.tail).forall { case (a, b) => a <= b })
  }

  test("cohens kappa: confusion cells partition documents; kappa within [-1, 1]") {
    val r = EvalOps.cohensKappa(spark, sf0001).collect().head
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3) == nDocs)
    val kappa = r.getDouble(6)
    assert(kappa >= -1.0 && kappa <= 1.0)
    // po ∈ [0,1], pe ∈ (0,1)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    assert(r.getDouble(5) > 0.0 && r.getDouble(5) < 1.0)
  }

  test("item cf: top-3 per brand, cosine in (0,1], co-occurrence symmetric") {
    val rows = EvalOps.itemCf(spark, sf0001).collect()
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 3))
    assert(rows.forall(r => r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))
    // within a brand, ranks order by (cosine desc, neighbor)
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val byRank = g.sortBy(_.getInt(1)).map(r => (r.getDouble(4), r.getString(2)))
      byRank.zip(byRank.tail).foreach { case ((c1, n1), (c2, n2)) =>
        assert(c1 > c2 || (c1 == c2 && n1 < n2)) }
    }
  }

  test("skyline: result is exactly the non-dominated part set") {
    val parts = Tables.part(spark, sf0001)
      .select(col("p_partkey"),
              round(col("p_retailprice") * 100).cast("long").as("pc"),
              col("p_size")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    def dominated(p: (Long, Long, Int)) = parts.exists(q =>
      q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3))
    val want = parts.filterNot(dominated).map(_._1).toSet
    val got = RelationalOps.skyline(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("mix shift: effects decompose the period delta exactly") {
    val rows = ReportOps.mixShift(spark, sf0001).collect()
    // recompute unrounded: delta = R2 - R1 must equal sum of effects
    val (n1s, n2s) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    val r1 = rows.map(r => r.getLong(1) * r.getDouble(5)).sum / n1s
    val r2 = rows.map(r => r.getLong(2) * r.getDouble(6)).sum / n2s
    val effects = rows.map(r => r.getDouble(7) + r.getDouble(8)).sum
    assert(math.abs((r2 - r1) - effects) < 1e-2,
      s"delta ${r2 - r1} vs effect sum $effects")
  }

  test("time-weighted avg matches a hand-computed step-function integral") {
    import graft.operators.TimeSeriesOps
    val got = TimeSeriesOps.timeWeightedAvg(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"),
              unix_timestamp(col("ts")).as("sec"),
              expr("cast(round(value*100) as bigint)").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val s = rows.sortBy(r => (r._3, r._2))
      val ivs = s.zip(s.tail).map { case (a, b) => (a._4, b._3 - a._3) }
      val (wsum, tsum) = (ivs.map(i => i._1 * i._2).sum, ivs.map(_._2).sum)
      val (n, tot, twa) = got(t)
      assert(n == ivs.length && tot == tsum)
      assert(math.abs(twa - math.rint(wsum.toDouble / tsum / 100.0 * 1e4) / 1e4) < 1e-9)
    }
  }

  test("target encoding shrinks every cell toward the global mean") {
    val rows = EvalOps.targetEncoding(spark, sf0001).collect()
    val globalish = {
      // unrounded global mean from the raw cells
      val o = Tables.orders(spark, sf0001)
        .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
        .agg(sum(expr("cast(round(o_totalprice*100) as bigint)")).as("s"),
             count(lit(1)).as("n")).collect().head
      o.getLong(0).toDouble / o.getLong(1) / 100.0
    }
    rows.foreach { r =>
      val (raw, enc, shrink) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      val lo = math.min(raw, globalish) - 1e-3
      val hi = math.max(raw, globalish) + 1e-3
      assert(enc >= lo && enc <= hi, s"encoding $enc outside [$lo, $hi]")
      assert(shrink > 0.0 && shrink < 1.0)
    }
  }

  test("embed profile: 64 lanes, full coverage, consistent bounds") {
    import graft.operators.LlmOps
    val rows = LlmOps.embedProfile(spark, sf0001).collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == (0 until 64))
    val nVec = Tables.embeddings(spark, sf0001).count()
    rows.foreach { r =>
      assert(r.getLong(1) == nVec)
      assert(r.getDouble(3) >= -1e-9, "variance must be non-negative")
      assert(r.getLong(4) <= r.getLong(5))
      val meanMicro = r.getDouble(2) * 1e6
      assert(meanMicro >= r.getLong(4) - 1 && meanMicro <= r.getLong(5) + 1)
    }
  }

  test("growth accounting: splits partition actives; churn conserves users") {
    val rows = ReportOps.growthAccounting(spark, sf0001).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    rows.foreach { case (wk, act, nw, ret, res, _) =>
      assert(act == nw + ret + res, s"$wk: $act != $nw+$ret+$res") }
    // conservation week to week: active(w) - retained(w+1) = churned(w+1)
    rows.zip(rows.tail).foreach { case ((_, act, _, _, _, _),
                                        (wk2, _, _, ret2, _, ch2)) =>
      assert(act - ret2 == ch2, s"$wk2: ${act - ret2} != $ch2") }
    // total new across all weeks = total distinct users
    val users = Tables.events(spark, sf0001)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_._3).sum == users)
  }

  test("audience overlap: exact Jaccard on hand-collected user sets") {
    val sets = Tables.events(spark, sf0001)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .groupBy(_.getString(0)).map { case (t, g) => t -> g.map(_.getLong(1)).toSet }
    val rows = ReportOps.audienceOverlap(spark, sf0001).collect()
    assert(rows.length == sets.size * (sets.size - 1) / 2)
    rows.foreach { r =>
      val (a, b) = (sets(r.getString(0)), sets(r.getString(1)))
      assert(r.getLong(2) == a.size && r.getLong(3) == b.size)
      assert(r.getLong(4) == (a & b).size)
      val j = (a & b).size.toDouble / (a | b).size
      assert(math.abs(r.getDouble(5) - math.rint(j * 1e4) / 1e4) < 1e-9)
    }
  }

  test("stats histogram: equi-depth buckets cover all orders with ordered bounds") {
    val rows = graft.operators.ReportShapeOps.statsHistogram(spark, sf0001)
      .collect().sortBy(_.getInt(0))
    val n = Tables.orders(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == n)
    assert(rows.map(_.getLong(1)).max - rows.map(_.getLong(1)).min <= 1,
      "equi-depth buckets differ by at most one row")
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getDouble(4) <= b.getDouble(3) + 1e-9,
        "bucket value ranges must be non-overlapping and ordered") }
  }

  test("sql surface: literal-SQL pricing equals the DataFrame flagship") {
    val sql = RelationalOps.sqlPricing(spark, sf0001)
    val df = RelationalOps.aggPricing(spark, sf0001)
    assert(collectSet(sql) == collectSet(df))
  }

  test("anova: sums of squares decompose and eta2 is their ratio") {
    import graft.operators.TimeSeriesOps
    val r = TimeSeriesOps.anova(spark, sf0001).collect().head
    val (ssb, ssw, f, eta2) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(ssb >= 0 && ssw > 0 && f >= 0)
    assert(eta2 >= 0 && eta2 < 1)
    assert(math.abs(eta2 - ssb / (ssb + ssw)) < 1e-3)
    // independent recompute of F from the rounded parts
    val k = r.getLong(0); val n = r.getLong(1)
    assert(math.abs(f - (ssb / (k - 1)) / (ssw / (n - k))) < 1e-2 * f + 1e-6)
  }

  test("backtest: exactly the final 7 days scored; forecast uses train only") {
    import graft.operators.TimeSeriesOps
    val rows = TimeSeriesOps.backtestMape(spark, sf0001).collect()
    assert(rows.length == 7)
    val daily = Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(expr("cast(round(value*100) as bigint)")).as("cents"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val d0 = daily.keys.max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    rows.foreach { r =>
      val day = r.getDate(0).toLocalDate
      assert(day.isAfter(d0.minusDays(7)))
      // forecast = weekday mean over train days only
      val train = daily.filter(!_._1.isAfter(d0.minusDays(7)))
        .filter(_._1.getDayOfWeek == day.getDayOfWeek)
      val want = train.values.sum.toDouble / train.size / 100.0
      assert(math.abs(r.getDouble(2) - math.rint(want * 1e4) / 1e4) < 1e-9)
    }
  }

  test("cusum: closed form equals the literal recursion") {
    import graft.operators.TimeSeriesOps
    val rows = TimeSeriesOps.cusum(spark, sf0001).collect()
      .sortBy(_.getDate(0).getTime)
    val daily = Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(expr("cast(round(value*100) as bigint)")).as("cents"))
      .collect().sortBy(_.getDate(0).getTime).map(_.getLong(1))
    val n = daily.length; val total = daily.sum
    var sHi = 0L; var sLo = 0L
    rows.zip(daily).foreach { case (r, cents) =>
      val dev = cents * n - total
      sHi = math.max(0L, sHi + dev)
      sLo = math.max(0L, sLo - dev)
      assert(math.abs(r.getDouble(2) - math.rint(sHi.toDouble / n / 100.0 * 1e4) / 1e4) < 1e-9)
      assert(math.abs(r.getDouble(3) - math.rint(sLo.toDouble / n / 100.0 * 1e4) / 1e4) < 1e-9)
      assert(r.getInt(4) == (if (sHi > total) 1 else 0))
    }
  }

  test("concurrency: per-day peaks match a brute-force interval count") {
    import graft.operators.WindowOps
    val got = WindowOps.concurrency(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // brute force from the sessionize query itself
    val sess = WindowOps.sessionize(spark, sf0001).collect()
      .map(r => (r.getLong(2), r.getLong(3))) // start_sec, end_sec
    val starts = sess.map(_._1)
    got.foreach { case (day, peak) =>
      // candidate peak times: session starts within the day
      val cands = starts.filter(t => t / 86400 == day)
      val brute = if (cands.isEmpty) 0L
        else cands.map(t => sess.count { case (s, e) => s <= t && t <= e }.toLong).max
      assert(peak == brute, s"day $day: sweep $peak vs brute $brute")
    }
  }

  test("disorder audit: lateness matches a sequential arrival replay") {
    import graft.operators.WindowOps
    val got = WindowOps.disorderAudit(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    ev.groupBy(_._1).foreach { case (t, g) =>
      var runmax = Long.MinValue; var nLate = 0L; var maxLate = 0L
      g.sortBy(_._2).foreach { case (_, _, sec) =>
        if (runmax > sec) { nLate += 1; maxLate = math.max(maxLate, runmax - sec) }
        runmax = math.max(runmax, sec)
      }
      assert(got(t) == ((g.length.toLong, nLate, maxLate)), s"type $t")
    }
  }

  test("mutual info: table MI is non-negative and bounded by min marginal entropy") {
    import graft.operators.TimeSeriesOps
    val rows = TimeSeriesOps.mutualInfo(spark, sf0001).collect()
    val mi = rows.map(_.getDouble(5)).distinct
    assert(mi.length == 1)
    assert(mi.head >= -1e-4, "MI must be non-negative")
    // recompute MI from the cells independently
    val cells = rows.map(r => ((r.getInt(0), r.getString(1)), r.getLong(2)))
    val tot = cells.map(_._2).sum.toDouble
    val rowM = cells.groupBy(_._1._1).map { case (k, g) => k -> g.map(_._2).sum }
    val colM = cells.groupBy(_._1._2).map { case (k, g) => k -> g.map(_._2).sum }
    val want = cells.map { case ((w, t), n) =>
      n / tot * math.log(n * tot / (rowM(w).toDouble * colM(t)))
    }.sum
    assert(math.abs(mi.head - want) < 1e-3)
  }

  test("rolling corr: values in [-1,1]; day-14 value equals a direct Pearson") {
    import graft.operators.TimeSeriesOps
    val rows = TimeSeriesOps.rollingCorr(spark, sf0001).collect()
      .sortBy(_.getDate(0).getTime)
    rows.foreach { r =>
      if (!r.isNullAt(3))
        assert(r.getDouble(3) >= -1.0 - 1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
    }
    if (rows.length >= 14) {
      val first14 = rows.take(14).map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
      val n = 14.0
      val (sx, sy) = (first14.map(_._1).sum, first14.map(_._2).sum)
      val sxx = first14.map(p => p._1 * p._1).sum
      val syy = first14.map(p => p._2 * p._2).sum
      val sxy = first14.map(p => p._1 * p._2).sum
      val want = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(math.abs(rows(13).getDouble(3) - want) < 1e-3)
    }
  }

  test("shard manifest: digests the sorted id list and covers every doc") {
    val rows = CurationOps.shardManifest(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_.getLong(1)).sum == docs.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byShard = docs.groupBy { case (id, _) =>
      val h = md5hex(id.toString).substring(0, 8)
      java.lang.Long.parseLong(h, 16) % 16
    }
    rows.foreach { r =>
      val ids = byShard(r.getLong(0)).map(_._1).sorted
      assert(r.getString(3) == md5hex(ids.mkString(",")),
        s"shard ${r.getLong(0)} manifest mismatch")
    }
  }

  test("centrality: BFS distances equal Floyd-Warshall on the collected graph") {
    import graft.operators.GraphOps
    val got = GraphOps.centrality(spark, sf0001).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // brute force from the same edge definition
    val e = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sf0001), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey"), col("s_nationkey")).distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).filter(p => p._1 != p._2)
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val inf = Int.MaxValue / 4
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val dm = Array.fill(n, n)(inf)
    nodes.indices.foreach(i => dm(i)(i) = 0)
    e.foreach { case (a, b) => dm(idx(a))(idx(b)) = 1; dm(idx(b))(idx(a)) = 1 }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (dm(i)(k) + dm(k)(j) < dm(i)(j)) dm(i)(j) = dm(i)(k) + dm(k)(j)
    nodes.zipWithIndex.foreach { case (u, i) =>
      val ds = (0 until n).filter(j => j != i && dm(i)(j) < inf).map(j => dm(i)(j))
      if (ds.nonEmpty)
        assert(got(u) == ((ds.length.toLong, ds.max.toLong)), s"node $u")
    }
  }

  test("rank corr: pair counts complete; tau and rho agree with direct recompute") {
    val r = EvalOps.rankCorr(spark, sf0001).collect().head
    val (k, c, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(c + d == k * (k - 1) / 2)
    val tau = r.getDouble(3)
    assert(tau >= -1.0 && tau <= 1.0)
    assert(math.abs(tau - (c - d).toDouble / (c + d)) < 1e-3)
    assert(r.getDouble(4) >= -1.0 && r.getDouble(4) <= 1.0)
  }

  test("novelty decay: novel grams sum to the corpus vocabulary; cum matches") {
    import graft.operators.LlmOps
    val rows = LlmOps.noveltyDecay(spark, sf0001).collect().sortBy(_.getInt(0))
    val vocab = Tables.documents(spark, sf0001).select(col("text")).collect()
      .flatMap { r =>
        val t = r.getString(0).split(" ")
        if (t.length < 3) Seq.empty
        else t.sliding(3).map(_.mkString(" ")).toSeq.distinct
      }.distinct.length
    assert(rows.map(_.getLong(3)).sum == vocab.toLong)
    assert(rows.last.getLong(4) == vocab.toLong)
    var cum = 0L
    rows.foreach { r => cum += r.getLong(3); assert(r.getLong(4) == cum) }
  }

  test("shapley attribution equals a brute-force powerset computation") {
    import graft.operators.WindowOps
    val got = WindowOps.attributionShapley(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val users = Tables.events(spark, sf0001).groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
           max(when(col("event_type") === "error", 1L).otherwise(0L)).as("e"),
           max(when(col("event_type") === "signup", 1L).otherwise(0L)).as("g"),
           max(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
           max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .collect()
      .map(r => ((r.getLong(1) + 2 * r.getLong(2) + 4 * r.getLong(3) +
                  8 * r.getLong(4)).toInt, r.getLong(5)))
    val byMask = users.groupBy(_._1)
      .map { case (m, g) => m -> (g.length.toLong, g.map(_._2).sum) }
    def v(m: Int): Double =
      byMask.get(m).map { case (n, c) => c.toDouble / n }.getOrElse(0.0)
    val w = Map(0 -> 6.0, 1 -> 2.0, 2 -> 2.0, 3 -> 6.0)
    val chans = Seq(1 -> "click", 2 -> "error", 4 -> "signup", 8 -> "view")
    chans.foreach { case (bit, name) =>
      val phi = (0 until 16).filter(m => (m & bit) == 0)
        .map(m => w(Integer.bitCount(m)) * (v(m | bit) - v(m))).sum / 24.0
      assert(math.abs(got(name) - phi) < 1e-3, s"$name: ${got(name)} vs $phi")
    }
  }

  test("coverage cells: full spine surfaces zero-doc cells; shares sum to 1") {
    val rows = CurationOps.coverageCells(spark, sf0001).collect()
    val langs = Tables.documents(spark, sf0001)
      .select(col("lang")).distinct().count()
    val sources = Tables.documents(spark, sf0001)
      .select(col("source")).distinct().count()
    assert(rows.length == langs * sources)
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    rows.foreach { r =>
      assert((r.getInt(4) == 1) == (r.getLong(2) == 0L)) }
  }

  test("sample pps: every language draws exactly k=5 with multiplicity") {
    val rows = CurationOps.samplePps(spark, sf0001).collect()
    val perLang = rows.groupBy(_.getString(0))
      .map { case (l, g) => l -> g.map(_.getLong(3)).sum }
    assert(perLang.values.forall(_ == 5L), s"per-lang draws: $perLang")
    // PPS property: a selected doc's weight spans at least its
    // multiplicity-1 full steps
    val langW = Tables.documents(spark, sf0001)
      .groupBy(col("lang")).agg(sum(col("n_chars")).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.filter(_.getLong(3) > 1).foreach { r =>
      val step = langW(r.getString(0)) / 5
      assert(r.getLong(2) > (r.getLong(3) - 1) * step)
    }
  }
}
