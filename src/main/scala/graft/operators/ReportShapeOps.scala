package graft.operators

import graft.{Fin, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Report-shaping operators: pivot/unpivot (the wide↔long reshapes every
  * BI layer over GA-style data needs), percentiles, ntile/first/last
  * windows, and statistical aggregates (SURVEY.md §2 additions, r1).
  */
object ReportShapeOps {
  import Fin._

  /** Event types pinned for the pivot — an explicit value list keeps the
    * output schema static (no extra distinct-scan, deterministic column
    * order; at 100 TB an implicit pivot would scan once just to discover
    * columns). */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q_pivot — wide per-user report: one column per event_type. Users
    * without a type get NULL (sum over empty set), matching the oracle's
    * ELSE-less CASE. */
  def pivotEvents(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    ord(
      e.groupBy(col("user_id"))
        .pivot("event_type", EventTypes)
        .agg(r4(sum(col("value")))),
      col("user_id"))
  }

  /** q_unpivot — long form of a per-flag summary via stack() (the
    * Generator-based melt). */
  def unpivotSummary(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val wide = li.groupBy(col("l_returnflag"))
      .agg(r4(sum(col("l_quantity"))).as("sum_qty"),
           r4(sum(col("l_extendedprice"))).as("sum_price"),
           r4(avg(col("l_discount"))).as("avg_disc"))
    ord(
      wide.select(col("l_returnflag"),
        expr("stack(3, 'sum_qty', sum_qty, 'sum_price', sum_price, 'avg_disc', avg_disc) AS (metric, value)")),
      col("l_returnflag"), col("metric"))
  }

  /** q_percentile — exact interpolated percentiles per group (median +
    * p90). NOTE at 100 TB the exact form needs a full sort per group;
    * approx_percentile is the scale path (same API shape). */
  def percentiles(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    ord(
      li.groupBy(col("l_returnflag"))
        .agg(r4(expr("percentile(l_extendedprice, 0.5)")).as("median_price"),
             r4(expr("percentile(l_extendedprice, 0.9)")).as("p90_price")),
      col("l_returnflag"))
  }

  /** q_percentile_approx — the 100 TB path for q_percentile: a mergeable
    * quantile sketch (approx_percentile, Greenwald-Khanna style) instead
    * of the per-group full sort the exact form needs. Non-oracle (sketch
    * internals are engine-specific); the suite asserts the result within
    * 1% of the exact percentiles (pattern of q_agg_approx_distinct). */
  def percentilesApprox(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    ord(
      li.groupBy(col("l_returnflag"))
        .agg(r4(expr("approx_percentile(l_extendedprice, 0.5, 10000)")).as("median_price"),
             r4(expr("approx_percentile(l_extendedprice, 0.9, 10000)")).as("p90_price")),
      col("l_returnflag"))
  }

  /** q_ntile_first_last — quartile assignment + per-partition first/last
    * (full frame for last_value — the default frame would be a bug). */
  def ntileFirstLast(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ord(
      o.select(col("o_orderkey"), col("o_custkey"),
               ntile(4).over(w).as("quartile"),
               first(col("o_orderkey")).over(full).as("first_ok"),
               last(col("o_orderkey")).over(full).as("last_ok")),
      col("o_orderkey"))
  }

  /** q_cume_dist — distribution-position windows (cume_dist +
    * percent_rank) over customer lifetime spend within each market
    * segment: "what fraction of my segment does this customer out-spend".
    * Spend is summed as exact integer cents, and the window ORDER BY is
    * the cents value alone — cume_dist/percent_rank are tie-STABLE
    * (they count value-≤ rows, not row positions), so no tiebreak key
    * is needed for determinism.
    *
    * Scale shape: one partial-aggregable shuffle to per-customer spend,
    * then [[graft.functions.Dist.prefix]] grouped by segment — ranges
    * are cut on (segment, cents), so ONE segment's data-proportional
    * member list still parallelizes across range partitions (the plain
    * segment-partitioned window would bound parallelism at 5 and put
    * |customers|/5 rows through each sort). */
  def cumeDist(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val g = graft.functions.Dist.prefix(spend, Seq("c_mktsegment"),
      Seq(col("cents")), rankLe = Some(("__rk", "__le")),
      groupN = Some("__n"))
    ord(
      g.select(col("c_custkey"), col("c_mktsegment"),
        r4(col("cents").cast("double") / 100.0).as("spend"),
        r4(graft.functions.Dist.cumeDistOf(col("__le"), col("__n"))).as("cd"),
        r4(graft.functions.Dist.percentRankOf(col("__rk"), col("__n")))
          .as("pr")),
      col("c_custkey"))
  }

  /** q_benford — first-significant-digit distribution of order totals
    * against Benford's law (expected p_d = log10(1+1/d)) — the classic
    * fabricated-or-corrupted-numbers screen a data-quality layer runs
    * on money columns. Digit extraction is integer/string arithmetic on
    * floor(totalprice); observed frequency divides exact counts once;
    * the expectation is the same log10 formula evaluated on both
    * engines. One partial-aggregable shuffle onto 9 keys. */
  def benford(s: SparkSession, d: String): DataFrame = {
    val digits = Tables.orders(s, d).select(
      substring(floor(col("o_totalprice")).cast("bigint").cast("string"), 1, 1)
        .cast("int").as("digit"))
    val tot = digits.agg(count(lit(1)).as("total"))
    ord(
      digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          r4(col("n").cast("double") / col("total")).as("obs_freq"),
          r4(log10(lit(1.0) + lit(1.0) / col("digit"))).as("benford_freq")),
      col("digit"))
  }

  /** q_profile_nulls — the data-profiling pass every ETL runs before
    * trusting a source: per column, row count, null count, distinct
    * count. ONE aggregate job computes every column's counts
    * (count(col) skips nulls; count_distinct partial-aggregates), then
    * a `stack` generator reshapes the single wide row into one row per
    * column — profiling N columns costs one scan regardless of N. */
  def profileNulls(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val cols = Seq("user_id", "event_type", "value", "props")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"), countDistinct(col(c)).as(s"nd_$c")))
    val wide = e.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(
      s"stack(${cols.length}, ", ", ", ")")
    ord(
      wide.select(col("n_rows"),
          expr(stackExpr).as(Seq("column_name", "n_notnull", "n_distinct")))
        .select(col("column_name"), col("n_rows"),
                (col("n_rows") - col("n_notnull")).as("n_nulls"),
                col("n_distinct")),
      col("column_name"))
  }

  /** q_stats_agg — sample stddev/variance, correlation, covariance per
    * event_type (all algebraic — single-pass partial aggregates). */
  def statsAgg(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val uid = col("user_id").cast("double")
    ord(
      e.groupBy(col("event_type"))
        .agg(r4(stddev_samp(col("value"))).as("sd_value"),
             r4(var_samp(col("value"))).as("var_value"),
             r4(corr(col("value"), uid)).as("corr_vu"),
             r4(covar_samp(col("value"), uid)).as("cov_vu")),
      col("event_type"))
  }

  /** q_schema_drift — source-drift detection, the profile every
    * incremental ETL diffs before trusting a new extract: per column,
    * row/null/distinct counts split into the already-loaded period
    * (before the ingest cutoff) vs the fresh period, plus the null-rate
    * delta — a column whose null rate jumps in the fresh slice is a
    * breaking upstream change caught BEFORE the load.
    *
    * Scale shape: same one-wide-aggregate trick as q_profile_nulls —
    * conditional aggregates compute both periods' counts for every
    * column in a SINGLE scan (no per-period pass), then `stack`
    * reshapes; null rates divide exact integers once, r4'd. */
  def schemaDrift(s: SparkSession, d: String): DataFrame = {
    val cut = lit(graft.operators.IngestOps.SinkCutoff).cast("timestamp")
    val e = Tables.events(s, d).withColumn("_pre", col("ts") < cut)
    val cols = Seq("user_id", "event_type", "value", "props")
    val aggs =
      sum(when(col("_pre"), 1L).otherwise(0L)).as("n_pre") +:
      (sum(when(!col("_pre"), 1L).otherwise(0L)).as("n_post") +:
        cols.flatMap(c => Seq(
          count(when(col("_pre"), col(c))).as(s"nn_pre_$c"),
          count(when(!col("_pre"), col(c))).as(s"nn_post_$c"),
          countDistinct(when(col("_pre"), col(c))).as(s"nd_pre_$c"),
          countDistinct(when(!col("_pre"), col(c))).as(s"nd_post_$c"))))
    val wide = e.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(c =>
      s"'$c', nn_pre_$c, nn_post_$c, nd_pre_$c, nd_post_$c").mkString(
      s"stack(${cols.length}, ", ", ", ")")
    ord(
      wide.select(col("n_pre"), col("n_post"), expr(stackExpr)
          .as(Seq("column_name", "nn_pre", "nn_post", "nd_pre", "nd_post")))
        .select(col("column_name"),
                (col("n_pre") - col("nn_pre")).as("nulls_pre"),
                (col("n_post") - col("nn_post")).as("nulls_post"),
                col("nd_pre"), col("nd_post"),
                r4((col("n_post") - col("nn_post")).cast("double") / col("n_post") -
                   (col("n_pre") - col("nn_pre")).cast("double") / col("n_pre"))
                  .as("null_rate_delta")),
      col("column_name"))
  }

  /** q_winsorize — outlier-capped pricing stats, the robust-mean cleanup
    * every metrics pipeline applies before trusting an average: per
    * return flag, the p05/p95 thresholds of l_extendedprice, and the raw
    * vs winsorized (clamped into [p05, p95]) means.
    *
    * Scale shape: thresholds come from one per-group aggregate; the
    * clamp pass re-aggregates the fact rows after a join back on the
    * SAME group key — co-partitioned, exchange reuse, no window. The
    * exact interpolated percentile is the small-group path; at 100 TB
    * groups the thresholds would come from approx_percentile (the
    * q_percentile_approx path) with the identical clamp join.
    * Determinism: thresholds are r4'd BEFORE the clamp compares against
    * them, so both engines clamp against identical 4-decimal doubles
    * (both interpolate quantiles with the same lower+(upper−lower)·frac
    * formula — the q_rfm precedent); the clamped mean is r4'd once. */
  def winsorize(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("p"))
    val thr = li.groupBy(col("flag"))
      .agg(r4(percentile(col("p"), lit(0.05))).as("p05"),
           r4(percentile(col("p"), lit(0.95))).as("p95"))
    ord(
      li.join(thr, "flag")
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n"),
             first(col("p05")).as("p05"),
             first(col("p95")).as("p95"),
             r4(avg(col("p"))).as("mean_raw"),
             r4(avg(least(greatest(col("p"), col("p05")), col("p95"))))
               .as("mean_winsorized")),
      col("flag"))
  }

  /** q_expectations — declarative data-quality audit (the
    * expectations/contract gate every pipeline runs between ingest and
    * consumption): one row per check with population size, violation
    * count, and pass flag. Checks cover the four constraint families —
    * range (l_quantity ∈ [1,50]), non-negativity (events.value),
    * referential integrity (every l_orderkey resolves in orders),
    * uniqueness (event_id), and derived-column consistency
    * (documents.n_chars = length(text)).
    *
    * Scale shape: every scalar check is ONE partial-aggregable pass
    * over its table (violations counted as a conditional sum — never a
    * filtered second scan); the FK check is a left join on the key
    * counting unresolved rows (at 100 TB both sides are facts, so it
    * shuffles once on the key — a bucketed layout would kill even
    * that); uniqueness is one groupBy(key) counting rows beyond the
    * first. The result is a fixed handful of 1-row frames unioned —
    * audit cost is one pass per table regardless of corpus size. */
  def expectations(s: SparkSession, d: String): DataFrame = {
    def agg1(name: String, df: DataFrame, viol: org.apache.spark.sql.Column) =
      df.agg(count(lit(1)).as("n_checked"),
             sum(when(viol, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(name).as("check"), col("n_checked"), col("n_violations"))
    val li = Tables.lineitem(s, d)
    val checks = Seq(
      agg1("lineitem_quantity_range", li,
           col("l_quantity") < 1 || col("l_quantity") > 50),
      agg1("lineitem_orderkey_fk",
           li.join(Tables.orders(s, d).select(col("o_orderkey")),
                   col("l_orderkey") === col("o_orderkey"), "left"),
           col("o_orderkey").isNull),
      agg1("events_value_nonnegative", Tables.events(s, d),
           col("value") < 0),
      agg1("documents_nchars_consistent", Tables.documents(s, d),
           col("n_chars") =!= length(col("text"))),
      // uniqueness: rows beyond the first of each key are the violations
      Tables.events(s, d).groupBy(col("event_id"))
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("n_checked"),
             sum(col("n") - 1).as("n_violations"))
        .select(lit("events_eventid_unique").as("check"),
                col("n_checked"), col("n_violations")))
    ord(
      checks.reduce(_.unionByName(_))
        .withColumn("pass", col("n_violations") === 0),
      col("check"))
  }

  /** q_outliers_robust — Tukey IQR-fence outlier screen per group:
    * flag prices outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR]. The ROBUST
    * complement to q_anomaly's z-score and q_winsorize's clamp — the
    * fences themselves are quartile-derived, so a contaminated tail
    * cannot widen its own acceptance band (the failure mode of
    * mean/stddev screens on heavy-tailed data).
    *
    * Determinism: the whole fence pipeline runs in EXACT cent space —
    * quartiles interpolate integer cents at dyadic fractions (.25/.75
    * positions), so q1/q3/fences are exact dyadic doubles and the
    * outlier comparison is exact on both engines; only the two
    * REPORTED fences divide by 100 and r4 at the very end. (The
    * previous form r4'd the quartiles first and re-rounded the
    * derived fences — an arithmetic combo of already-rounded values,
    * which landed exactly on a .00005 tie at sf0.001 and split the
    * engines by 1 ulp: the §2.10 "never round derived products of
    * rounded values" trap, now eliminated instead of dodged.)
    *
    * Scale shape: one percentile pass per group (at 100 TB:
    * approx_percentile — the q_percentile_approx path), broadcast of
    * the |groups|-row fence frame back into a second scan's
    * conditional count. Two scans, zero wide shuffles. */
  def outliersRobust(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"),
              round(col("l_extendedprice") * 100).cast("long").as("c"))
    val fences = li.groupBy(col("flag"))
      .agg(percentile(col("c"), lit(0.25)).as("q1c"),
           percentile(col("c"), lit(0.75)).as("q3c"))
      .withColumn("loc", col("q1c") - lit(1.5) * (col("q3c") - col("q1c")))
      .withColumn("hic", col("q3c") + lit(1.5) * (col("q3c") - col("q1c")))
    ord(
      li.join(broadcast(fences), "flag")
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n"),
             first(col("loc")).as("loc"),
             first(col("hic")).as("hic"),
             sum(when(col("c") < col("loc") || col("c") > col("hic"), 1L)
                   .otherwise(0L)).as("n_out"))
        .select(col("flag"), col("n"),
                r4(col("loc") / 100.0).as("lo_fence"),
                r4(col("hic") / 100.0).as("hi_fence"),
                col("n_out"),
                r4(col("n_out").cast("double") * 100.0 / col("n"))
                  .as("out_pct")),
      col("flag"))
  }

  /** q_auc — AUC of the per-user total-spend score against the
    * day-one-conversion outcome (q_ab_test's conversion definition:
    * first purchase within 24 h of first activity), via the rank
    * identity AUC = (R₁ − n₁(n₁+1)/2)/(n₁n₀) with average ranks on
    * ties: the threshold-free companion to q_decile_lift's binned
    * view, and THE eval metric every binary scorer reports. Also
    * emits the accuracy ratio (Gini) 2·AUC−1.
    *
    * Determinism: the same all-int64 rank machinery as
    * q_mann_whitney (2·avg-rank = 2·cum_before + t + 1 on exact
    * cents; AUC and Gini divide once and round).
    *
    * Scale shape: one fact-scale per-user rollup (score and outcome
    * in the SAME pass — no second scan, no join); the rank cumulation
    * over DISTINCT score values rides [[graft.functions.Dist.prefix]]
    * (range-partitioned, no single-partition sort); a 1-row total. */
  def auc(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"),
           min(epochSec(col("ts"))).as("first_sec"),
           min(when(col("event_type") === "purchase", epochSec(col("ts"))))
             .as("first_purch"))
      .withColumn("pos",
        when(col("first_purch").isNotNull &&
             col("first_purch") - col("first_sec") <= 86400, 1).otherwise(0))
    val byVal = scored.groupBy(col("cents"))
      .agg(sum(when(col("pos") === 1, 1L).otherwise(0L)).as("np"),
           sum(when(col("pos") === 0, 1L).otherwise(0L)).as("nn"))
      .withColumn("t", col("np") + col("nn"))
    val tot = scored.agg(
      sum(when(col("pos") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("pos") === 0, 1L).otherwise(0L)).as("n0"))
    val r2 = graft.functions.Dist.prefix(byVal, Nil, Seq(col("cents")),
        cums = Seq("cum" -> col("t")))
      .agg(sum(col("np") * (lit(2L) * (col("cum") - col("t")) + col("t") + 1L))
             .as("r2p"))
    ord(
      r2.crossJoin(broadcast(tot))
        .withColumn("u2", col("r2p") - col("n1") * (col("n1") + 1L))
        .select(col("n1").as("n_pos"), col("n0").as("n_neg"),
                r4(col("u2").cast("double") /
                   (lit(2.0) * col("n1") * col("n0"))).as("auc"))
        .withColumn("gini", r4(lit(2.0) * col("auc") - 1.0)),
      col("n_pos"))
  }

  /** q_decile_lift — decile lift table: score customers by account
    * balance, decile them, and read how order spend concentrates
    * across deciles (lift vs the overall mean, cumulative capture).
    * The standard model-eval artifact for any propensity/LTV score —
    * here the "model" is the balance itself, which makes the readout
    * oracle-checkable while exercising the exact pipeline shape
    * (score → ntile → outcome join → per-decile rollup → cumulative
    * window).
    *
    * Determinism: the decile order has a unique tiebreak
    * (c_acctbal DESC, c_custkey); outcomes are exact cents; every
    * ratio divides integers once and r4's.
    *
    * Scale shape: the ntile rides [[graft.functions.Dist.prefix]]'s
    * range-partitioned rank of the SCORE FRAME only (customers, not
    * orders) — a parallel sort, not a global one; the outcome rollup is
    * one partial-aggregable shuffle on custkey; the cumulative capture
    * and corpus totals are two frames of ONE window over the CONSTANT
    * 10-row decile rollup (ntile(10)'s output — a 10-row single
    * partition is the design, q_novelty_decay precedent). r15: this
    * replaced the 10×10 broadcast theta join + 1-row total frames,
    * which re-evaluated the decile rollup's upstream pipeline three
    * times (62-exchange plan → the rollup now evaluates once). */
  /** q_stats_histogram — the equi-depth (equi-height) column histogram
    * an optimizer's ANALYZE collects: 10 equal-count buckets over order
    * value with per-bucket row count, value bounds, and customer NDV —
    * the statistics artifact selectivity estimation reads, exposed as a
    * first-class query (q_doc_length_histogram is the equi-WIDTH
    * counterpart; equi-depth adapts bucket bounds to skew).
    *
    * Determinism: ntile orders by (exact cents, orderkey) — a unique
    * tiebreak, so bucket membership is identical on both engines;
    * bounds are exact cents divided once for display.
    *
    * Scale shape: the ntile rides [[graft.functions.Dist.prefix]]'s
    * range-bucketed rank over the ORDERS frame (global row_number +
    * exact bucket arithmetic — no single-partition sort); the rollup is
    * 10 rows. The tier `persist()`s the fact frame as a compute-once
    * optimization — evictable and recompute-safe (r15: the bucket id is
    * a deterministic literal expression, nothing pins on materialized
    * blocks); a deployment that cannot afford even transient fact-frame
    * caching can still fall back to approx-quantile binning. */
  def statsHistogram(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
              round(col("o_totalprice") * 100).cast("long").as("cents"))
    ord(
      graft.functions.Dist.prefix(o, Nil,
          Seq(col("cents"), col("o_orderkey")),
          rowNum = Some("__rn"), groupN = Some("__n"))
        .withColumn("bucket",
          graft.functions.Dist.ntileOf(10, col("__rn"), col("__n")))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
             count_distinct(col("o_custkey")).as("ndv_cust"),
             min(col("cents")).as("locents"), max(col("cents")).as("hicents"))
        .select(col("bucket"), col("n_rows"), col("ndv_cust"),
                r4(col("locents").cast("double") / 100.0).as("lo"),
                r4(col("hicents").cast("double") / 100.0).as("hi")),
      col("bucket"))
  }

  def decileLift(s: SparkSession, d: String): DataFrame = {
    // deciles from the distributed rank tier: global row_number over
    // (balance DESC, custkey) + exact ntile arithmetic — the customer
    // SCORE frame never funnels through one partition
    val scored = graft.functions.Dist.prefix(
        Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
        Nil, Seq(col("c_acctbal").desc, col("c_custkey")),
        rowNum = Some("__rn"), groupN = Some("__n"))
      .select(col("c_custkey"),
              graft.functions.Dist.ntileOf(10, col("__rn"), col("__n"))
                .as("decile"))
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
    val byDecile = scored
      .join(spend, scored("c_custkey") === spend("o_custkey"), "left")
      .na.fill(0L, Seq("cents"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("cents"))
    // cumulative capture + corpus totals: ONE ordering/partitioning,
    // two frame specs (running vs unbounded) — Spark plans them as two
    // Window operators over the same sort with ZERO added exchanges —
    // on the CONSTANT 10-row decile rollup: ntile(10) bounds the frame
    // at any SF, so the single partition holds 10 rows by construction.
    // (The unpartitioned Window.orderBy emits Spark's expected
    // "No Partition Defined" WARN on every run — by design here, not a
    // leak; log triage should not flag it.)
    val dw = Window.orderBy(col("decile"))
    val cum = byDecile
      .withColumn("cum_cents",
        sum(col("cents")).over(
          dw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tc",
        sum(col("cents")).over(
          dw.rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)))
      .withColumn("tn",
        sum(col("n_cust")).over(
          dw.rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)))
    ord(
      cum.select(col("decile"),
                col("n_cust"),
                r4(col("cents").cast("double") / 100.0).as("spend"),
                r4(col("cents").cast("double") / col("n_cust") / 100.0)
                  .as("avg_spend"),
                r4(col("cents").cast("double") / col("tc")).as("capture"),
                r4(col("cum_cents").cast("double") / col("tc"))
                  .as("cum_capture"),
                r4((col("cents").cast("double") / col("n_cust")) /
                   (col("tc").cast("double") / col("tn"))).as("lift")),
      col("decile"))
  }

  /** q_fk_audit — referential-integrity audit across the warehouse's
    * five FK edges (lineitem→orders, lineitem→part, lineitem→supplier,
    * orders→customer, embeddings→documents): per edge, child rows,
    * orphan rows (no matching parent key), and the orphan rate — the
    * load-gate report every ingest pipeline runs before publishing a
    * snapshot (q_expectations checks value ranges; this checks the
    * JOINABILITY the whole query surface assumes).
    *
    * Determinism: exact integer counts; ONE r4'd division; edges on a
    * literal spine so an edge with zero orphans still reports.
    *
    * Scale shape: each edge is one anti-join on its key — shuffle-
    * partitioned on the FK, the exact shape the joins themselves use
    * (orphan detection can't be cheaper than the join it certifies) —
    * feeding a count-only rollup; nothing wider than the key crosses
    * the shuffle, and the 5-row result unions at driver cost. */
  def fkAudit(s: SparkSession, d: String): DataFrame = {
    def edge(name: String, child: DataFrame, key: String,
             parent: DataFrame, pkey: String): DataFrame = {
      val n = child.agg(count(lit(1)).as("n_child"))
      val orphans = child.join(parent.select(col(pkey)),
          col(key) === col(pkey), "left_anti")
        .agg(count(lit(1)).as("n_orphan"))
      n.crossJoin(orphans).select(lit(name).as("fk_edge"),
        col("n_child"), col("n_orphan"))
    }
    val li = Tables.lineitem(s, d)
    val rows = Seq(
      edge("lineitem.l_orderkey->orders", li.select(col("l_orderkey")),
           "l_orderkey", Tables.orders(s, d), "o_orderkey"),
      edge("lineitem.l_partkey->part", li.select(col("l_partkey")),
           "l_partkey", Tables.part(s, d), "p_partkey"),
      edge("lineitem.l_suppkey->supplier", li.select(col("l_suppkey")),
           "l_suppkey", Tables.supplier(s, d), "s_suppkey"),
      edge("orders.o_custkey->customer",
           Tables.orders(s, d).select(col("o_custkey")),
           "o_custkey", Tables.customer(s, d), "c_custkey"),
      edge("embeddings.vec_id->documents",
           Tables.embeddings(s, d).select(col("vec_id")),
           "vec_id", Tables.documents(s, d), "doc_id"))
    ord(
      rows.reduce(_ unionAll _)
        .select(col("fk_edge"), col("n_child"), col("n_orphan"),
                r4(col("n_orphan").cast("double") /
                   nullif(col("n_child").cast("double"), lit(0.0)))
                  .as("orphan_rate")),
      col("fk_edge"))
  }

  /** q_dup_payments — the duplicate-payment screen every AP audit
    * runs: orders by the SAME customer in the SAME $100 amount band
    * (cents DIV 10000), scanned in date order; a consecutive pair ≤ 7
    * days apart is flagged as a suspected double charge. Emits the
    * one-row audit summary (orders, same-band consecutive pairs,
    * flagged pairs, flag rate) — a summary row rather than the pair
    * list so the readout SURFACES at every SF even when the corpus is
    * clean (§2.10 spine rule; zero flags IS the healthy reading). The
    * band-then-adjacent shape is the audit-standard screen: exact
    * amount equality misses keyed-twice-with-fees pairs, and a full
    * pairwise compare is quadratic — banding makes it one sort.
    *
    * Determinism: bands/gaps are exact int64; the per-band scan
    * orders by the unique (day, orderkey); the rate is ONE division
    * r4'd with nullif on a pair-free corpus.
    *
    * Scale shape: ONE window partitioned by (custkey, band) — fully
    * parallel, no global sort; the summary is a partial-aggregable
    * 1-row rollup. At 100 TB the window keys are as fine as the data
    * (customer × band), so no partition ever exceeds one customer's
    * order history. */
  def dupPayments(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT) DIV 10000").as("band"),
      expr("CAST(unix_timestamp(o_orderdate) DIV 86400 AS LONG)").as("day_num"))
    val w = Window.partitionBy(col("o_custkey"), col("band"))
      .orderBy(col("day_num"), col("o_orderkey"))
    val gaps = o.withColumn("prev_day", lag(col("day_num"), 1).over(w))
    ord(
      gaps.agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("prev_day").isNotNull, 1L).otherwise(0L)).as("n_pairs"),
        sum(when(col("day_num") - col("prev_day") <= 7L, 1L).otherwise(0L))
          .as("n_flagged"))
        .select(col("n_orders"), col("n_pairs"), col("n_flagged"),
          r4(col("n_flagged").cast("double") /
             nullif(col("n_pairs").cast("double"), lit(0.0))).as("flag_rate")),
      col("n_orders"))
  }
}
