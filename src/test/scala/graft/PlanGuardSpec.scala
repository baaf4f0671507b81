package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.types.{ArrayType, MapType}
import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide plan guards over EVERY declared query: no cartesian
  * products (a cartesian at 100 TB is a non-terminating job), and no
  * map-typed output columns (engine-dependent ordering breaks the
  * oracle hash — SURVEY.md §2.10 rule 5). */
class PlanGuardSpec extends AnyFunSuite {
  import TestBase._

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name: no cartesian product in the physical plan") {
      val p = fn(spark, sf0001).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$p")
    }
  }

  test("no oracle-checked query outputs a map- or array-typed column") {
    // the driver's checker sorts rows with pandas and cannot hash either
    // kind — r1's only red row was exactly this (q_map_funcs arrays)
    SparkEntry.oracleSql.keys.foreach { name =>
      val schema = SparkEntry.queries(name)(spark, sf0001).schema
      val bad = schema.fields.filter(f =>
        f.dataType.isInstanceOf[MapType] || f.dataType.isInstanceOf[ArrayType])
      assert(bad.isEmpty, s"$name outputs non-scalar columns: ${bad.mkString(",")}")
    }
  }
}
