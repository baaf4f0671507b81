package graft

/** Scale-probe counter (r17, the r16 verdict ask #5): prints
  * q_simjoin_prefix's candidate-pair and result-pair counts for a
  * corpus, so the query's 10×/100× time exponent decomposes into a
  * COUNTED output-growth floor (result pairs are the work any
  * algorithm must emit) plus wasted verification (candidates −
  * results). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale10x sbt "runMain graft.ScaleCounts"
  *
  * One JSON line: {"sf":…, "candidates":N, "results":N}.
  */
object ScaleCounts {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (cand, res) = graft.operators.AffinityOps.simJoinParts(spark, sfDir)
    val nCand = cand.count()
    val nRes = res.count()
    println(s"""{"sf":"$sfDir","candidates":$nCand,"results":$nRes}""")
    spark.stop()
  }
}
