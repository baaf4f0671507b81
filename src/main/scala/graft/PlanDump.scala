package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to files — the
  * committed plan evidence for optimization rounds (plans/rNN/).
  *
  * Usage: sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> [q ...]"
  * writes <outDir>/<query>_<suffix>.txt per query (no query names =
  * every SparkEntry query). Plans are built, never executed — the
  * dump shows the pre-execution AdaptiveSparkPlan, which is what the
  * per-round plan review diffs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val fmt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), fmt)
      println(s"[plandump] $n -> $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
