package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewOps

/** Salted forms must agree exactly with the unsalted plans on skewed
  * data (one key owning ~90% of rows). */
class SkewSpec extends AnyFunSuite {
  import TestBase._
  import spark.implicits._

  private lazy val skewed = {
    // hot key 0 gets 9000 rows; keys 1..9 get ~111 each
    val rows = (1 to 10000).map { i =>
      val k = if (i <= 9000) 0L else (i % 9 + 1).toLong
      (i.toLong, k, (i % 100).toDouble)
    }
    rows.toDF("row_id", "k", "v")
  }

  test("salted two-phase aggregation equals plain groupBy on skewed keys") {
    val got = SkewOps.saltedSumCount(skewed, "k", "v", "row_id", salts = 8)
    val want = skewed.groupBy("k").agg(sum($"v").as("sum_value"), count(lit(1)).as("n"))
    assert(collectSet(got) == collectSet(want))
  }

  test("salted join equals plain join on skewed fact key") {
    val dim = (0L to 9L).map(k => (k, s"name$k")).toDF("k", "k_name")
    val got = SkewOps.saltedJoin(skewed, dim, "k", "row_id", salts = 8)
      .select("row_id", "k", "v", "k_name")
    val want = skewed.join(dim, Seq("k")).select("row_id", "k", "v", "k_name")
    assert(got.count() == want.count())
    assert(collectSet(got) == collectSet(want))
  }

  test("salt distribution actually spreads the hot key") {
    val spread = skewed.filter($"k" === 0L)
      .withColumn("_salt", SkewOps.saltCol($"row_id", 8))
      .groupBy("_salt").count().collect()
    assert(spread.length == 8, "hot key must land on all salt buckets")
    assert(spread.map(_.getLong(1)).max < 9000 * 0.3,
      "no salt bucket should hold a dominating share")
  }
}
