package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs at sf0.001 and is deterministic
  * (two runs, identical results) — the re-run idempotency the
  * reference's hash-id appends promise, engine-wide. */
class QuerySmokeSpec extends AnyFunSuite {
  import TestBase._

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and is deterministic at sf0.001") {
      val a = fn(spark, sf0001).collect().map(_.toSeq).toSeq
      val b = fn(spark, sf0001).collect().map(_.toSeq).toSeq
      assert(a == b, s"$name not deterministic")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("only the declared non-oracle queries lack oracle SQL") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("q_agg_approx_distinct", "q_dedup_minhash",
                           "q_percentile_approx", "q_bpe_vocab",
                           "q_bpe_encode", "q_hll_rollup", "q_hll_overlap"),
      s"unexpected non-oracle set: $noOracle")
  }
}
