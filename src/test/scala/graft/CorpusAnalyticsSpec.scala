package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent recomputation checks for the r12 widening queries:
  * each operator's headline number is re-derived in plain Scala from
  * collected data, so a Spark-side expression bug cannot hide behind
  * an oracle that mirrors the same mistake. */
class CorpusAnalyticsSpec extends AnyFunSuite {
  import TestBase._

  test("zipf: slope matches a Scala OLS over the same top-100 ranks") {
    val row = operators.LlmOps.zipf(spark, sf0001).collect().head
    val (nRanks, zipfS) = (row.getLong(0), row.getDouble(3))
    // independent recompute: frequencies via Spark collect, OLS in Scala
    val tf = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val top = tf.sortBy { case (t, f) => (-f, t) }.take(100)
    val pts = top.zipWithIndex.map { case ((_, f), i) =>
      (math.log((i + 1).toDouble), math.log(f.toDouble)) }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(nRanks == pts.length)
    assert(math.abs(zipfS - (-slope)) < 1e-3,
      s"query slope $zipfS vs scala ${-slope}")
    assert(zipfS > 0, "token frequencies must decay with rank")
  }

  test("vocab_overlap: full pair spine; one pair's jaccard recomputed exactly") {
    val rows = operators.LlmOps.vocabOverlap(spark, sf0001).collect()
    val nSources = Tables.documents(spark, sf0001)
      .select(countDistinct(col("source"))).head().getLong(0).toInt
    assert(rows.length == nSources * (nSources - 1) / 2,
      "every source pair must surface, including zero-overlap ones")
    rows.foreach { r =>
      val j = r.getDouble(5)
      assert(j >= 0.0 && j <= 1.0)
    }
    // exact recompute of the first pair
    val r0 = rows.head
    val (a, b) = (r0.getString(0), r0.getString(1))
    def vocab(src: String): Set[String] = Tables.documents(spark, sf0001)
      .filter(col("source") === src)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct().collect().map(_.getString(0)).toSet
    val (va, vb) = (vocab(a), vocab(b))
    assert(r0.getLong(2) == va.size && r0.getLong(3) == vb.size)
    assert(r0.getLong(4) == (va & vb).size)
  }

  test("embed_outliers: top-20, non-increasing, worst distance recomputed") {
    val rows = operators.LlmOps.embedOutliers(spark, sf0001).collect()
    assert(rows.length == 20)
    val d2s = rows.map(_.getDouble(2))
    assert(d2s.zip(d2s.tail).forall { case (x, y) => x >= y },
      "outliers must be ranked by distance descending")
    // recompute the worst vector's distance in scala (same 1e-6
    // quantization and lane-order fold)
    val worst = rows.head
    val (vid, lbl) = (worst.getLong(0), worst.getInt(1))
    val em = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"),
              col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val mine = em.filter(_._2 == lbl)
    def q(x: Double): Double = math.round(x * 1e6).toDouble / 1e6
    val cent = (0 until 64).map { i =>
      mine.map(v => math.round(v._3(i) * 1e6)).sum.toDouble / mine.length / 1e6
    }
    val v = em.find(_._1 == vid).get._3
    val d2 = (0 until 64).map(i => (q(v(i)) - cent(i)) * (q(v(i)) - cent(i)))
      .foldLeft(0.0)(_ + _)
    assert(math.abs(worst.getDouble(2) - d2) < 1e-3,
      s"query d2 ${worst.getDouble(2)} vs scala $d2")
  }

  test("lead_lag_corr: 7 lags, bounded, lag-0 matches a Scala Pearson") {
    val rows = operators.TimeSeriesOps.leadLagCorr(spark, sf0001).collect()
    assert(rows.map(_.getInt(0)).toSeq == (-3 to 3).toSeq)
    rows.foreach { r =>
      if (!r.isNullAt(2)) assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
    val daily = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
           sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
    val n = daily.length
    val (mx, my) = (daily.map(_._1).sum / n, daily.map(_._2).sum / n)
    val cov = daily.map(p => (p._1 - mx) * (p._2 - my)).sum
    val sdx = math.sqrt(daily.map(p => (p._1 - mx) * (p._1 - mx)).sum)
    val sdy = math.sqrt(daily.map(p => (p._2 - my) * (p._2 - my)).sum)
    val r0 = rows.find(_.getInt(0) == 0).get.getDouble(2)
    assert(math.abs(r0 - cov / (sdx * sdy)) < 1e-3,
      s"lag-0 corr $r0 vs scala ${cov / (sdx * sdy)}")
  }

  test("diff_in_diff: cells partition the purchases; did recombines the means") {
    val r = operators.TimeSeriesOps.diffInDiff(spark, sf0001).collect().head
    val nTotal = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3) == nTotal,
      "the four cells must partition the purchase set")
    val did = (r.getDouble(7) - r.getDouble(6)) - (r.getDouble(5) - r.getDouble(4))
    // did is computed from UNROUNDED means, so it can differ from the
    // recombination of the four rounded means by at most 4 half-ulps
    assert(math.abs(r.getDouble(8) - did) <= 2e-4,
      s"did ${r.getDouble(8)} vs rounded-means recombination $did")
  }

  test("promo_share: share recombines from the two exact revenue columns") {
    val rows = operators.ReportOps.promoShare(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (promo, total, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(share >= 0.0 && share <= 100.0)
      assert(promo <= total + 1e-9)
      // rounded-parts recombination within rounding slack
      assert(math.abs(share - 100.0 * promo / total) < 0.02,
        s"share $share vs ${100.0 * promo / total}")
    }
  }

  test("returns_report: 20 rows, descending, every row beats the 21st") {
    val rows = operators.ReportOps.returnsReport(spark, sf0001).collect()
    assert(rows.length == 20)
    val revs = rows.map(_.getDouble(3))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    // the cut is genuinely the top: the worst shown beats the best hidden
    val all = Tables.lineitem(spark, sf0001)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)") *
               (lit(100L) - expr("cast(round(l_discount * 100) as bigint)")))
             .as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val shown = rows.map(_.getLong(0)).toSet
    val hiddenMax = all.filterNot(p => shown(p._1)).map(_._2).max
    val shownMin = all.filter(p => shown(p._1)).map(_._2).min
    assert(shownMin >= hiddenMax)
  }

  test("priority_late: late counts bounded by totals; totals cover all orders") {
    val rows = operators.ReportOps.priorityLate(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val nOrders = Tables.orders(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nOrders)
  }

  test("session_duration_hist: session count conserved across buckets") {
    val rows = operators.WindowOps.sessionDurationHist(spark, sf0001).collect()
    val nSessions = operators.WindowOps.sessionize(spark, sf0001).count()
    assert(rows.map(_.getLong(2)).sum == nSessions,
      "histogram must partition the session set")
    rows.foreach(r => assert(r.getLong(1) == r.getLong(0) * 300))
  }

  test("robust_scale: median doc scales to ~0; one doc recomputed in Scala") {
    val rows = operators.EvalOps.robustScale(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // recompute one language's quantiles in scala and check a doc
    val lang = rows.head.getString(1)
    val lens = Tables.documents(spark, sf0001).filter(col("lang") === lang)
      .select(col("n_chars")).collect().map(_.getLong(0)).sorted
    def q(p: Double): Double = {
      val pos = p * (lens.length - 1)
      val (lo, hi) = (pos.toInt, math.min(pos.toInt + 1, lens.length - 1))
      lens(lo) + (pos - lo) * (lens(hi) - lens(lo))
    }
    val (q25, med, q75) = (q(0.25), q(0.5), q(0.75))
    val r0 = rows.filter(_.getString(1) == lang).head
    val expect = (r0.getLong(2) - med) / (q75 - q25)
    assert(math.abs(r0.getDouble(5) - expect) < 1e-3,
      s"rs ${r0.getDouble(5)} vs scala $expect")
  }

  test("token_length: shares sum to 1 within each language") {
    val rows = operators.LlmOps.tokenLength(spark, sf0001).collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 0.01, s"$lang shares sum to $s")
    }
    rows.foreach(r => assert(r.getInt(1) > 0 && r.getLong(2) > 0))
  }

  test("first_repeat_aov: first count = customers with orders; totals conserve") {
    val r = operators.ReportOps.firstRepeatAov(spark, sf0001).collect().head
    val nCust = Tables.orders(spark, sf0001)
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    val nOrders = Tables.orders(spark, sf0001).count()
    assert(r.getLong(0) == nCust)
    assert(r.getLong(0) + r.getLong(1) == nOrders)
    val ratio = r.getDouble(2) / r.getDouble(3)
    assert(math.abs(r.getDouble(4) - ratio) < 2e-3)
  }

  test("regional_revenue: shares sum to 100 over the region's nations") {
    val rows = operators.ReportOps.regionalRevenue(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val s = rows.map(_.getDouble(2)).sum
    assert(math.abs(s - 100.0) < 0.01, s"shares sum to $s")
  }

  test("quality_by_source: shares sum to 1 per source; bands agree with the scored formula") {
    val rows = operators.LlmOps.qualityBySource(spark, sf0001).collect()
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 0.01, s"$src shares sum to $s")
    }
    // band membership cross-checked against the float formula on one doc
    val d0 = Tables.documents(spark, sf0001)
      .select(col("source"), split(col("text"), " ").as("ts")).limit(1)
      .select(col("source"), size(col("ts")).as("t"),
              size(array_distinct(col("ts"))).as("u"))
      .collect().head
    val (t, u) = (d0.getInt(1).toLong, d0.getInt(2).toLong)
    val q = u.toDouble / math.max(t, 50L)
    val band = if (q >= 0.75) "a_ge75" else if (q >= 0.5) "b_50_75"
               else if (q >= 0.25) "c_25_50" else "d_lt25"
    assert(rows.exists(r => r.getString(0) == d0.getString(0) &&
                            r.getString(1) == band && r.getLong(2) > 0))
  }

  test("price_elasticity: one brand's slope matches a Scala OLS over its cells") {
    val rows = operators.ReportOps.priceElasticity(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val brand = rows.head.getString(0)
    val cells = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") === brand)
      .groupBy(expr("cast(round(p_retailprice * 100) as bigint)").as("pc"))
      .agg(sum(expr("cast(round(l_quantity) as bigint)")).as("q"))
      .collect().map(r => (math.log(r.getLong(0).toDouble),
                           math.log(r.getLong(1).toDouble)))
    val n = cells.length.toDouble
    val (sx, sy) = (cells.map(_._1).sum, cells.map(_._2).sum)
    val sxx = cells.map(c => c._1 * c._1).sum
    val sxy = cells.map(c => c._1 * c._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(rows.head.getDouble(2) - slope) < 1e-3,
      s"elasticity ${rows.head.getDouble(2)} vs scala $slope")
  }

  test("order_size_hist: orders conserved and shares sum to 1") {
    val rows = operators.ReportOps.orderSizeHist(spark, sf0001).collect()
    val nOrders = Tables.lineitem(spark, sf0001)
      .select(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == nOrders)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 0.01)
  }

  test("retention_curve: monotone in N is NOT required, but bounds and base are") {
    val rows = operators.ReportOps.retentionCurve(spark, sf0001).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 3, 7, 14))
    val nUsers = Tables.events(spark, sf0001)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    rows.foreach { r =>
      assert(r.getLong(1) == nUsers)
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // independent recompute of day-1 retention
    val ud = Tables.events(spark, sf0001)
      .select(col("user_id"),
              expr("CAST(unix_timestamp(ts) DIV 86400 AS INT)").as("dn"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).toSet).toMap
    val d1 = ud.count { case (_, days) => days(days.min + 1) }
    assert(rows.find(_.getInt(0) == 1).get.getLong(2) == d1)
  }

  test("return_rate: returners bounded by actives; one day recomputed") {
    val rows = operators.ReportOps.returnRate(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val ud = Tables.events(spark, sf0001)
      .select(col("user_id"),
              expr("CAST(unix_timestamp(ts) DIV 86400 AS INT)").as("dn"))
      .distinct().collect().map(r => (r.getLong(0), r.getInt(1)))
    val byUser = ud.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val day0 = rows.head.getInt(0)
    val expect = ud.filter(_._2 == day0).count { case (u, d) =>
      (1 to 7).exists(k => byUser(u)(d + k)) }
    assert(rows.head.getLong(2) == expect)
  }

  test("vocab_coverage: monotone in k and consistent with the zipf total") {
    val rows = operators.LlmOps.vocabCoverage(spark, sf0001).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(100, 1000, 10000))
    val covs = rows.map(_.getDouble(3))
    assert(covs.zip(covs.tail).forall { case (a, b) => a <= b + 1e-9 },
      "coverage must be monotone in k")
    covs.foreach(c => assert(c > 0.0 && c <= 1.0))
    // total token mass agrees with q_zipf's
    val zipfTotal = operators.LlmOps.zipf(spark, sf0001).collect()
      .head.getLong(2)
    assert(rows.head.getLong(2) == zipfTotal)
  }

  test("session_cooc: pair counts bounded by the smaller side; lift recomputed once") {
    val rows = operators.WindowOps.sessionCooc(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)),
        "a pair cannot co-occur more often than either side occurs")
    }
    val nSess = operators.WindowOps.sessionize(spark, sf0001).count()
    val r0 = rows.head
    val lift = r0.getLong(4).toDouble * nSess / (r0.getLong(2) * r0.getLong(3))
    assert(math.abs(r0.getDouble(5) - lift) < 1e-3)
  }

  test("user_concentration: tiers nest and shares are monotone") {
    val rows = operators.ReportOps.userConcentration(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 10L, 50L))
    val (tops, shares) = (rows.map(_.getLong(2)), rows.map(_.getDouble(4)))
    assert(tops.zip(tops.tail).forall { case (a, b) => a <= b })
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b + 1e-9 })
    // sorted descending: the top tier's mean beats the overall mean,
    // so its share must be at least its user fraction
    rows.foreach { r =>
      assert(r.getDouble(4) >= r.getLong(2).toDouble / r.getLong(1) - 1e-9)
    }
  }

  test("dead_stock: dead + traded partition the catalog") {
    val rows = operators.ReportOps.deadStock(spark, sf0001).collect()
    val nParts = Tables.part(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nParts)
    val nTraded = Tables.lineitem(spark, sf0001)
      .select(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(rows.map(r => r.getLong(1) - r.getLong(2)).sum == nTraded)
  }

  test("weighted_median: recomputed from sorted cells; half the volume sits below") {
    val rows = operators.ReportOps.weightedMedian(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val flag = r.getString(0)
      val cells = Tables.lineitem(spark, sf0001)
        .filter(col("l_returnflag") === flag)
        .join(Tables.part(spark, sf0001), col("l_partkey") === col("p_partkey"))
        .groupBy(expr("cast(round(p_retailprice * 100) as bigint)").as("pc"))
        .agg(sum(expr("cast(round(l_quantity) as bigint)")).as("w"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
      val tot = cells.map(_._2).sum
      var cum = 0L
      val med = cells.find { case (_, w) => cum += w; 2 * cum >= tot }.get._1
      assert(r.getLong(1) == tot)
      assert(math.abs(r.getDouble(2) - med / 100.0) < 1e-3,
        s"$flag: ${r.getDouble(2)} vs scala ${med / 100.0}")
    }
  }

  test("cart_abandonment: abandoned bounded by intent; intent bounded by sessions") {
    val rows = operators.WindowOps.cartAbandonment(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val nSessions = operators.WindowOps.sessionize(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum <= nSessions)
  }

  test("brand_share_trend: shares sum to 100 within every month") {
    val rows = operators.ReportOps.brandShareTrend(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getDate(0).toString).foreach { case (m, rs) =>
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 100.0) < 0.1, s"$m shares sum to $s")
    }
  }

  test("repeat_purchase_rate: buyers partition by segment; repeat bounded") {
    val rows = operators.ReportOps.repeatPurchaseRate(spark, sf0001).collect()
    val nBuyers = Tables.orders(spark, sf0001)
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == nBuyers)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("jaccard_bands: pair mass conserved vs the raw pair stream; bands valid") {
    val rows = operators.LlmOps.jaccardBands(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) <= 10))
    // total pairs across bands == the candidate pair stream's size
    val nPairs = operators.LlmOps
      .ngramPairStats(spark, sf0001, operators.LlmOps.NgramMaxDf).count()
    assert(rows.map(_.getLong(1)).sum == nPairs)
  }

  test("boilerplate_prefix: boiler docs bounded; docs conserved per source") {
    val rows = operators.LlmOps.boilerplatePrefix(spark, sf0001).collect()
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("token_drift: psi recomputed in Scala over the same top-200 frame") {
    val r = operators.LlmOps.tokenDrift(spark, sf0001).collect().head
    assert(r.getLong(0) <= 200 && r.getLong(1) <= r.getLong(0))
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
    val ids = docs.map(_.getLong(0))
    val (mn, mx) = (ids.min, ids.max)
    def toks(t: String) = t.split(" ").filter(_.nonEmpty)
    val half = docs.map(d => (if (2 * d.getLong(0) < mn + mx) 1 else 2,
                              toks(d.getString(1))))
    val tf = scala.collection.mutable.Map[String, (Long, Long)]()
    for ((h, ts) <- half; t <- ts) {
      val (a, b) = tf.getOrElse(t, (0L, 0L))
      tf(t) = if (h == 1) (a + 1, b) else (a, b + 1)
    }
    val (t1, t2) = (tf.values.map(_._1).sum.toDouble,
                    tf.values.map(_._2).sum.toDouble)
    val top = tf.toSeq.sortBy { case (t, (a, b)) => (-(a + b), t) }.take(200)
    val psi = top.collect { case (_, (f1, f2)) if f1 > 0 && f2 > 0 =>
      (f1 / t1 - f2 / t2) * math.log((f1 / t1) / (f2 / t2)) }.sum
    assert(math.abs(r.getDouble(2) - psi) < 1e-3,
      s"psi ${r.getDouble(2)} vs scala $psi")
    assert(r.getDouble(2) >= 0.0, "PSI is non-negative by construction")
  }

  test("top_supplier: the winner's exact revenue is the true maximum") {
    val rows = operators.ReportOps.topSupplier(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byS = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("l_suppkey"),
        (expr("cast(round(l_extendedprice * 100) as bigint)") *
         (lit(100L) - expr("cast(round(l_discount * 100) as bigint)")))
          .as("e"))
      .groupBy("l_suppkey").agg(sum("e").as("rev"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mx = byS.values.max
    val winners = byS.filter(_._2 == mx).keys.toSet
    assert(rows.map(_.getLong(0)).toSet == winners,
      "the reported supplier set must be exactly the exact-max tie set")
    assert(math.abs(rows.head.getDouble(2) - mx / 1e4) < 1e-3)
  }
}
