package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_hll_overlap's accuracy contract: the inclusion–exclusion estimate
  * over per-type sketches tracks the exact pairwise intersection. */
class HllOverlapSpec extends AnyFunSuite {
  import TestBase._

  test("every type-pair overlap estimate within 10% of exact (floor 2 users)") {
    val e = Tables.events(spark, sf0001)
    val tu = e.select(col("event_type"), col("user_id")).distinct()
    val exact = tu.as("a")
      .join(tu.as("b"),
            col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
               col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val est = operators.RelationalOps.hllOverlap(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(est.nonEmpty)
    est.foreach { case (pair, o) =>
      val ex = exact.getOrElse(pair, 0L)
      // inclusion-exclusion compounds three estimates' errors, so the
      // band is 10% with an absolute floor for tiny intersections
      assert(math.abs(o - ex) <= math.max(2L, math.round(ex * 0.10)),
        s"$pair: est $o vs exact $ex")
    }
  }

  test("driver-SF (sf0.01) pair overlaps within 10% of the exact q_audience_overlap intersections") {
    // r11 verdict ask #6: bound the sketch against its EXACT TWIN on
    // the driver's own sf0.01 data — q_audience_overlap's `inter`
    // column is the oracle-gated exact intersection count
    val exact = operators.ReportOps.audienceOverlap(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    val est = operators.RelationalOps.hllOverlap(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (pair, o) =>
      val ex = exact(pair)
      assert(math.abs(o - ex) <= math.max(2L, math.round(ex * 0.10)),
        s"$pair: est $o vs exact $ex (driver SF)")
    }
  }
}
