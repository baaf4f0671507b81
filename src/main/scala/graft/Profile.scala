package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiler: time named queries with warm repeats, optionally
  * print the formatted plan. Usage:
  *   sbt "runMain graft.Profile q_dedup_minhash q_dedup_exact"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_EXPLAIN=1,
  *      SPARK_GRAFT_REPS (default 3).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) {
        println(s"===== $name plan =====")
        fn(spark, sfDir).explain("formatted")
      }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${times.map(t => f"$t%.2f").mkString(" ")}  (min ${times.min}%.2f s)")
    }
    spark.stop()
  }
}
