package graft

import org.apache.spark.sql.catalyst.expressions.Round
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.FoldNestedRound

/** The custom optimizer rule folds redundant nested rounds and changes
  * nothing else. */
class ExtensionsSpec extends AnyFunSuite {
  import TestBase._

  private def countRounds(df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.transformAllExpressions {
      case r: Round => n += 1; r
    }
    n
  }

  test("round(round(x,4),4) folds to a single round; different scales don't") {
    spark.experimental.extraOptimizations = Seq(FoldNestedRound)
    try {
      val li = Tables.lineitem(spark, sf0001)
      val same = li.select(round(round(col("l_extendedprice"), 4), 4).as("r"))
      assert(countRounds(same) == 1, "same-scale nested round must fold")
      val diff = li.select(round(round(col("l_extendedprice"), 2), 4).as("r"))
      assert(countRounds(diff) == 2, "different scales must NOT fold")
      // semantics unchanged
      val a = same.orderBy(col("r")).limit(5).collect().map(_.getDouble(0)).toSeq
      val b = li.select(round(col("l_extendedprice"), 4).as("r"))
        .orderBy(col("r")).limit(5).collect().map(_.getDouble(0)).toSeq
      assert(a == b)
    } finally spark.experimental.extraOptimizations = Nil
  }
}
