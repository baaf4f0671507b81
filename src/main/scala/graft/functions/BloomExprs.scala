package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL-registry surface for Spark's own bloom-filter sketch pair —
  * `BloomFilterAggregate` (build) and `BloomFilterMightContain`
  * (probe), the expressions behind AQE's `InjectRuntimeFilter`. The
  * optimizer only injects them into shuffle equi-joins it can prove
  * beneficial; registering them as callable functions lets a pipeline
  * apply the same fact-scan pruning EXPLICITLY — ahead of a join the
  * planner can't see through (multi-stage, non-equi verify step, or a
  * dim filtered by an opaque predicate) — with the sketch built once
  * and shipped as a bounded binary literal.
  *
  * `bloom_build(key, est_items, num_bits)` is partial-aggregable
  * (TypedImperativeAggregate): each map task builds a local filter and
  * the merge ORs the bitsets, so the build is one pass over the dim
  * keys with O(num_bits) state — never a collect of the keys.
  * `bloom_might_contain(bloom, key)` requires a FOLDABLE bloom side
  * (constant or scalar subquery — Spark's own contract), i.e. the
  * built sketch re-enters the plan as a literal: ship the SKETCH, not
  * the data. No false negatives, so a downstream exact join sees every
  * true match; false positives only cost wasted probe rows. */
object BloomExprs {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_build",
      { exprs =>
        require(exprs.length == 3,
          s"bloom_build(key, est_items, num_bits) takes 3 arguments, got ${exprs.length}")
        new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      { exprs =>
        require(exprs.length == 2,
          s"bloom_might_contain(bloom, key) takes 2 arguments, got ${exprs.length}")
        BloomFilterMightContain(exprs.head, exprs(1))
      },
      "built-in")
  }
}
