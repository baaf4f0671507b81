package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.types.MapType
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

  test("no oracle-checked query outputs a map-typed column") {
    SparkEntry.oracleSql.keys.foreach { name =>
      val schema = SparkEntry.queries(name)(spark, sf0001).schema
      val maps = schema.fields.filter(_.dataType.isInstanceOf[MapType])
      assert(maps.isEmpty, s"$name outputs map columns: ${maps.mkString(",")}")
    }
  }
}
