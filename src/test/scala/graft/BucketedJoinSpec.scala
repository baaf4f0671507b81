package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB fact⋈fact story: bucketing both tables on the join key
  * makes the shuffle disappear — the join reads co-located buckets
  * (SURVEY.md §7.5; README design rule 3). This is what q_join_inner's
  * shuffle join becomes on a real warehouse layout. */
class BucketedJoinSpec extends AnyFunSuite {
  import TestBase._

  test("bucketed tables join without a shuffle exchange") {
    val o = Tables.orders(spark, sf0001)
    val li = Tables.lineitem(spark, sf0001)
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    // at sf0.001 both sides fit the broadcast threshold, which would hide
    // the co-located-join shape this test demonstrates; disable it (at
    // real scale neither fact side is broadcastable)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try testColocated() finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  private def testColocated(): Unit = {
    val o = Tables.orders(spark, sf0001)
    val li = Tables.lineitem(spark, sf0001)
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the join itself must consume bucketed scans directly: no Exchange
    // between the two parquet scans and the join. In the printed tree
    // the join's INPUTS appear below it, so the subtree after the join
    // line must be exchange-free (the groupBy exchange sits above).
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    val lines = plan.split("\n\n").head.linesIterator.toVector
    val joinLine = lines.indexWhere(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(!lines.drop(joinLine + 1).exists(_.contains("Exchange")),
      "bucketed join still shuffles:\n" + plan)

    // and it computes the same result as the unbucketed join
    val want = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    assert(collectSet(joined) == collectSet(want))
  }
}
