import org.apache.spark.sql.SparkSession

/** Physical-plan audit tool: prints, per query, the exchange/join-shape
  * summary used in the per-round "plan you'd want at 100×" review
  * (shuffle count, broadcast vs sort-merge joins, cartesian products,
  * scan pushdowns). Usage:
  *
  *   sbt "runMain PlanAudit [sfDir] [queryName ...]"
  *
  * No query names = audit every SparkEntry query. BNLJ counts are
  * expected to be the deliberate 1-row broadcast scalar frames
  * (corpus totals); anything else shows up as a Cartesian and is also
  * rejected by PlanGuardSpec. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val lines = graft.SparkEntry.queries(n)(s, d)
        .queryExecution.executedPlan.toString.split("\n")
      def c(tag: String) = lines.count(_.contains(tag))
      println(f"$n%-28s exchanges=${c("Exchange")}%-3d bhj=${c("BroadcastHashJoin")}%-3d " +
        f"smj=${c("SortMergeJoin")}%-3d cart=${c("Cartesian")}%-2d " +
        f"bnlj=${c("BroadcastNestedLoop")}%-2d wsc=${c("WholeStageCodegen")}%d")
    }
    s.stop()
  }
}
