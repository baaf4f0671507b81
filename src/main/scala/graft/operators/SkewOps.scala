package graft.operators

import graft.{Fin, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §7.5 / the 100 TB brief).
  *
  * AQE's OptimizeSkewedJoin splits oversized shuffle partitions at
  * runtime and is the first line of defense (enabled by default).
  * These manual forms cover the cases AQE cannot fix:
  *  - a single group key so hot that even one partition of it spills
  *    (salted two-phase aggregation);
  *  - a broadcast-ineligible dim joined on a skewed fact key
  *    (salt-replicated join).
  *
  * Salting is deterministic here (hash of a stable row key, not rand()):
  * re-runs produce identical partitioning, keeping the engine's
  * idempotency contract.
  */
object SkewOps {

  /** Deterministic salt in [0, salts) from a stable row key. */
  def saltCol(stableKey: Column, salts: Int): Column =
    pmod(xxhash64(stableKey), lit(salts.toLong)).cast("int")

  /** Two-phase aggregation for skewed keys: partial aggregate on
    * (key, salt) spreads a hot key over `salts` reducers, then a final
    * merge on key. This instance computes sum + count (the pattern
    * generalizes to any algebraic aggregate whose partials merge —
    * sum/count/min/max — by swapping the two agg stages). */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      valueCol: String,
      stableKey: String,
      salts: Int = 16): DataFrame = {
    df.withColumn("_salt", saltCol(col(stableKey), salts))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("n"))
  }

  /** Skewed-fact ⋈ small-dim equi-join without broadcast: the fact side
    * gets a deterministic salt, the dim side is replicated `salts`
    * times, and the join key becomes (key, salt) — a hot key now lands
    * on `salts` reducers instead of one. Dim replication cost is
    * |dim| × salts, so keep the dim small (else broadcast was the
    * answer anyway). */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      factStableKey: String,
      salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt", saltCol(col(factStableKey), salts))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** q_agg_salted — the salted two-phase aggregation as a driver-checked
    * query: sum+count of value per event_type with the hot key spread
    * over 16 (key, salt) reducers before the final merge. The oracle is
    * the plain unsalted GROUP BY — salting must be result-invisible,
    * and that invariant is exactly what the hash check proves. */
  def aggSalted(s: SparkSession, d: String): DataFrame = {
    import Fin._
    ord(
      saltedSumCount(Tables.events(s, d), "event_type", "value", "event_id")
        .select(col("event_type"), r4(col("sum_value")).as("sum_value"), col("n")),
      col("event_type"))
  }

  /** q_join_salted — the salt-replicated JOIN as a driver-checked query:
    * orders⋈customer revenue per market segment with the fact side
    * salted on its unique order key and the dim replicated ×16, so a
    * hot customer key lands on 16 reducers instead of one. This is the
    * skew fix for a dim too big to broadcast; the oracle is the plain
    * unsalted join — like q_agg_salted, the hash check proves the
    * machinery result-invisible. */
  def joinSalted(s: SparkSession, d: String): DataFrame = {
    import Fin._
    val o = Tables.orders(s, d)
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"),
              col("o_orderkey"))
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    ord(
      saltedJoin(o, c, "c_custkey", "o_orderkey")
        .groupBy(col("c_mktsegment"))
        .agg(r4(sum(col("o_totalprice"))).as("revenue"),
             count(lit(1)).as("n_orders")),
      col("c_mktsegment"))
  }
}
