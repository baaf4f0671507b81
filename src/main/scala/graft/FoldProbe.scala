package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for the Dist-tier offsets fold at the bucket CAP
  * (r19, the r18 verdict ask #2's done-bar): time the global tier at
  * parts = 4096 on a synthetic frame sized so the hash gate samples
  * sparsely (n = 4096·128·16), isolating the per-action subquery cost
  * — the r18 transform×slice×aggregate fold paid O(buckets²·fields)
  * interpreted lambda work exactly here; the r19 dist_fold pass is
  * O(buckets). Run on two trees for an A/B:
  *   sbt "runMain graft.FoldProbe [reps]"
  * Caches are cleared between reps so every rep re-executes the
  * offsets subquery.
  */
object FoldProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 4096L * 128L * 16L // gate modulus 16: ~524k sampled tuples
    val df = spark.range(n).select(
      (col("id") * 131 % 999983).as("v"), col("id").as("k"),
      (col("id") % 97).as("x")).repartition(8)
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val out = graft.functions.Dist.prefix(df, Nil,
        Seq(col("v"), col("k")),
        cums = Seq("cs" -> col("x")), rowNum = Some("rn"), parts = 4096)
      out.write.format("noop").mode("overwrite").save()
      println(f"[foldprobe] rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
