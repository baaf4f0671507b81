package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}
import org.apache.spark.sql.types.{ArrayType, MapType}
import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide plan guards over EVERY declared query: no cartesian
  * products (a cartesian at 100 TB is a non-terminating job), no
  * unpartitioned windows (a global window funnels the corpus through
  * one partition), and no map-typed output columns (engine-dependent
  * ordering breaks the oracle hash — SURVEY.md §2.10 rule 5).
  *
  * Each query's plan is built ONCE and shared by all guards — several
  * queries run real work at build time (the gated stream drains, the
  * BPE trainer trains), so a per-guard rebuild would multiply minutes
  * into the suite. */
class PlanGuardSpec extends AnyFunSuite {
  import TestBase._

  private lazy val executions =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf0001).queryExecution
    }

  /** Documented exceptions: these windows run over AGGREGATE-bounded
    * frames (≤ |calendar days| rows after a daily rollup — see the
    * q_moving_avg scaladoc), where one partition is the design, not a
    * leak of the corpus through a single sort. */
  private val unpartitionedWindowOk = Set(
    "q_moving_avg", "q_period_over_period", "q_changepoint",
    // NOTE (r14): every DATA-PROPORTIONAL global window — q_gini,
    // q_abc_pareto, q_user_concentration, q_decile_lift, q_calibration,
    // q_stats_histogram, q_ks_test, q_mann_whitney, q_kruskal_wallis,
    // q_auc, q_pr_curve, q_wasserstein (and the grouped q_cume_dist /
    // q_daily_p95) — now rides graft.functions.Dist.prefix and passes
    // this guard WITHOUT exemption. The remaining entries below are all
    // constant- or calendar-bounded frames where one partition is the
    // design, not a leak.
    // q_psi's total rides a 10-row bin spine; q_rolling_median
    // windows the calendar-bounded daily rollup
    "q_psi", "q_rolling_median",
    // q_survival's risk/product windows run over distinct DURATIONS
    // (calendar-bounded); q_chisq's total runs over the <=7x|types|
    // contingency cells
    "q_survival", "q_chisq",
    // q_mix_kl's totals run over the |languages| row mix frame
    "q_mix_kl",
    // q_cramers_v aggregates the <=7x|types| contingency cells (the
    // q_chisq frame); q_mrr's panel average runs over the <=|queries|
    // rr frame after the bounded top-k
    "q_cramers_v", "q_mrr",
    // q_theil_sen's median bracket sorts the O(days²) CALENDAR-bounded
    // pairwise-slope frame (scaladoc documents the bound);
    // q_bootstrap_ci's percentile bracket sorts the 200-row replicate
    // means
    "q_theil_sen", "q_bootstrap_ci",
    // q_mix_shift's totals ride the |segments| frame; q_cusum windows
    // the calendar-bounded daily rollup; q_mutual_info totals the
    // <=7x|types| contingency cells; q_rolling_corr windows the daily
    // rollup (q_moving_avg precedent)
    "q_mix_shift", "q_cusum",
    "q_mutual_info", "q_rolling_corr",
    // q_novelty_decay's epoch ntile rides Dist.prefix (r14); only its
    // cumulative window over the 10-row epoch rollup remains
    "q_novelty_decay",
    // q_coverage_cells' totals ride the |langs|x|sources| spine frame
    "q_coverage_cells",
    // q_heaps_law's cumulatives ride the 10-row epoch rollup
    // (q_novelty_decay precedent); q_seasonal_decompose's 7-day rolling
    // mean rides the calendar-bounded daily rollup (q_cusum precedent)
    "q_heaps_law",
    "q_seasonal_decompose",
    // q_zipf's rank window orders the post-TakeOrdered(100) frame —
    // bounded by the ZipfRanks constant, never by the corpus;
    // q_vocab_coverage's rank window orders its post-TakeOrdered(10000)
    // frame — same precedent, constant-bounded
    "q_zipf", "q_vocab_coverage",
    // q_rsi's lag/trailing-14 windows, q_sax's and q_holt_winters'
    // row_number ride the calendar-bounded daily rollup (q_moving_avg
    // precedent)
    "q_rsi", "q_sax", "q_holt_winters",
    // q_bollinger's 20-day and q_stochastic's 14-day + lag windows ride
    // the same calendar-bounded daily rollup (q_rsi precedent)
    "q_bollinger", "q_stochastic",
    // q_macd / q_kalman_filter / q_hurst rank the calendar-bounded
    // daily rollup for their folds (q_holt_winters precedent; hurst's
    // block windows all partition by (size, block))
    "q_macd", "q_kalman_filter", "q_hurst",
    // q_tail_index's row_number orders the post-TakeOrdered(101) frame
    // (q_zipf precedent)
    "q_tail_index",
    // q_control_chart's rule windows and q_page_hinkley's rank ride
    // the calendar-bounded daily rollup (q_rsi / q_holt_winters)
    "q_control_chart", "q_page_hinkley",
    // q_runs_test's lag and q_turning_points' lag/lead ride the same
    // calendar-bounded daily rollup
    "q_runs_test", "q_turning_points",
    // q_value_at_risk ranks the calendar-bounded delta frame and its
    // count window rides the same frame
    "q_value_at_risk",
    // q_attribution_markov's channel-id row_number orders the
    // |channel-vocabulary| frame (≤ a handful of event types)
    "q_attribution_markov",
    // q_sharpe's lag and q_max_drawdown's running-max/rank ride the
    // calendar-bounded daily rollup (q_value_at_risk / q_cusum)
    "q_sharpe", "q_max_drawdown",
    // q_part_adoption's cumulative sum rides the calendar-bounded
    // first-ship MONTH rollup (q_moving_avg precedent)
    "q_part_adoption",
    // q_decile_lift's cumulative capture/totals ride the CONSTANT
    // 10-row decile rollup — ntile(10)'s output bounds the frame at
    // any SF (q_novelty_decay / q_heaps_law precedent; r15, replacing
    // the 10×10 theta join that re-evaluated the rollup three times)
    "q_decile_lift")

  /** Constant-cardinality partition columns: a window partitioned ONLY
    * by one of these (experiment arm, language, nation, segment, source)
    * passes the unpartitioned-window guard yet still funnels a
    * fact-scale input through ≤ |domain| tasks — the r14 verdict's
    * "partitioned-but-still-data-proportional" blind spot (q_quantile_te
    * ran every order through 2 variant tasks). Flagged unless the frame
    * under the window is itself domain-bounded (an aggregate rollup to
    * ≤ |domain|·|calendar| rows), which the exemption list documents
    * per query. */
  private val lowCardCols = Set(
    "variant", "arm", "lang", "flag", "segment", "source",
    "c_nationkey", "n_nationkey", "c_mktsegment")

  /** Documented exceptions for the constant-cardinality guard: each of
    * these windows runs over an AGGREGATE-bounded frame (a per-domain
    * rollup of ≤ |domain|×|calendar| rows), where the low-cardinality
    * partition IS the design. NOTE (guard coverage): subtrees behind a
    * lazy localCheckpoint are INVISIBLE to both window guards — the
    * checkpoint truncates the logical plan to a LogicalRDD — so a query
    * that checkpoints a windowed frame self-certifies via its scaladoc
    * and its Dist.prefix/bounded-frame idioms, not via this scan
    * (q_attribution_markov's channel-rank window is the standing
    * example; see the r14 ADVICE note). */
  private val lowCardWindowOk: Set[String] = Set(
    // q_mix_kl / q_mix_shift / q_corpus_mix-family: windows total the
    // |languages|- or |segments|-row MIX frame after the rollup
    "q_mix_kl", "q_mix_shift",
    // q_coverage_cells' share window rides the |langs|x|sources| spine
    "q_coverage_cells",
    // q_psi bins ride a 10-row spine per source
    "q_psi",
    // q_weighted_median's per-flag cumulation runs over (flag, cents)
    // CELLS where cents is the catalog's p_retailprice — a VALUE-domain
    // bounded axis (measured: distinct prices saturate at 1000 from
    // sf0.01 on; the TPC-H price formula caps the domain at ~120k cents
    // values), so the frame is constant-bounded at any corpus size
    "q_weighted_median",
    // q_source_terms' final rank window reads the post-salt-cut frame
    // (≤ 5 rows per (source, 32-way salt) = ≤160 rows/source, constant);
    // the vocabulary-scale sort happens in the salted window upstream
    "q_source_terms")

  SparkEntry.queries.keys.foreach { name =>
    test(s"$name: no cartesian product; every window partitions") {
      val qe = executions(name)
      val p = qe.explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$p")
      if (!unpartitionedWindowOk(name)) qe.optimizedPlan.foreach {
        case w: Window =>
          assert(w.partitionSpec.nonEmpty,
            s"$name has an unpartitioned window (single-partition sort " +
              s"of the whole input):\n${w.windowExpressions}")
        case _ =>
      }
      // r19 (r18 verdict ask #7): the whitelist is no longer name-only.
      // EVERY exempted unpartitioned window must sit over a frame the
      // plan itself shows to be bounded — an Aggregate rollup (the
      // calendar/contingency/replicate/bin-spine class) or a Limit
      // (the post-TakeOrdered class) somewhere below it — so adding a
      // fact-scale unpartitioned window to a whitelisted query fails
      // here instead of passing by name. The scaladoc of each listed
      // query documents WHICH rollup bounds it; this guard pins that
      // the rollup is actually in the plan.
      // q_theil_sen's bounding day rollup sits behind an eager
      // iterCut (LogicalRDD truncates the logical plan — the
      // documented checkpoint blind spot above), so its window
      // self-certifies via the scaladoc'd calendar bound instead of
      // this structural scan.
      val checkpointBounded = Set("q_theil_sen")
      if (unpartitionedWindowOk(name) && !checkpointBounded(name))
        qe.optimizedPlan.foreach {
          case w: Window if w.partitionSpec.isEmpty =>
            val bounded = w.child.collectFirst {
              case a: Aggregate => a
              case l: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => l
            }.isDefined
            assert(bounded,
              s"$name: exempted unpartitioned window does not sit over an " +
                s"aggregate- or limit-bounded frame:\n${w.windowExpressions}")
          case _ =>
        }
      // r16 (r15 ADVICE): q_decile_lift's whitelist entry is SCOPED —
      // only an unpartitioned window sitting over the constant
      // decile-grouped rollup is admitted, so a future fact-scale
      // unpartitioned window in this query fails here instead of
      // passing by name.
      if (name == "q_decile_lift") qe.optimizedPlan.foreach {
        case w: Window if w.partitionSpec.isEmpty =>
          val overDecileRollup = w.child.collectFirst {
            case a: Aggregate if a.groupingExpressions.exists(
                _.references.exists(_.name == "decile")) => a
          }.isDefined
          assert(overDecileRollup,
            s"$name: exempted unpartitioned window does not sit over " +
              s"the constant decile rollup:\n${w.windowExpressions}")
        case _ =>
      }
      if (!lowCardWindowOk(name) && !unpartitionedWindowOk(name))
        qe.optimizedPlan.foreach {
          case w: Window if w.partitionSpec.nonEmpty =>
            val refs = w.partitionSpec.flatMap(_.references.map(_.name))
            assert(!refs.forall(r =>
                lowCardCols(r) || lowCardCols(r.replaceAll("#\\d+$", ""))),
              s"$name has a window partitioned ONLY by constant-" +
                s"cardinality keys ${refs.mkString(",")} — ≤ |domain| " +
                "tasks at any scale; route through Dist.prefix(part=…) " +
                "or document the bounded frame in lowCardWindowOk")
          case _ =>
        }
    }
  }

  test("no oracle-checked query outputs a map- or array-typed column") {
    // the driver's checker sorts rows with pandas and cannot hash either
    // kind — r1's only red row was exactly this (q_map_funcs arrays)
    SparkEntry.oracleSql.keys.foreach { name =>
      val schema = executions(name).analyzed.schema
      val bad = schema.fields.filter(f =>
        f.dataType.isInstanceOf[MapType] || f.dataType.isInstanceOf[ArrayType])
      assert(bad.isEmpty, s"$name outputs non-scalar columns: ${bad.mkString(",")}")
    }
  }
}
