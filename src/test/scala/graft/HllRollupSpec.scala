package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The merge algebra q_hll_rollup's design rests on: HLL union is
  * register-wise max, so merging per-day sketches reproduces the EXACT
  * register state (hence estimate) of a single whole-range sketch, and
  * the estimate tracks the exact count. */
class HllRollupSpec extends AnyFunSuite {
  import TestBase._

  test("union of daily sketches == single whole-range sketch; estimate within 5% of exact") {
    val e = Tables.events(spark, sf0001)
    val merged = e.groupBy(to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .head().getLong(0)
    val direct = e
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))"))
      .head().getLong(0)
    assert(merged == direct,
      s"sketch merge is not lossless: merged=$merged direct=$direct")

    val exact = e.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"estimate $merged vs exact $exact drifts past 5%")

    // the rollup query itself: weekly rows, positive estimates
    val out = operators.RelationalOps.hllRollup(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(2) > 0))
  }

  test("per-WEEK estimates within 5% of exact weekly distinct users at the driver SF") {
    // r11 verdict ask #6: bound the query's OWN output rows against
    // exact values on the driver's sf0.01 data — per week, not only the
    // whole-range total the fixture test covers
    val e = Tables.events(spark, sf001)
    val exact = e
      .groupBy(date_trunc("week", to_date(col("ts"))).cast("date").as("week"))
      .agg(countDistinct(col("user_id")).as("ex"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val est = operators.RelationalOps.hllRollup(spark, sf001).collect()
      .map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    assert(est.keySet == exact.keySet, s"week sets differ: $est vs $exact")
    est.foreach { case (wk, v) =>
      val ex = exact(wk)
      assert(math.abs(v - ex).toDouble / ex <= 0.05,
        s"week $wk: estimate $v vs exact $ex drifts past 5%")
    }
  }
}
