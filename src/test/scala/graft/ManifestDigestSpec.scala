package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for q_shard_manifest_scale's order-insensitive
  * digest (r12 verdict ask #5): on every planted corpus mutation the
  * commutative sum+xor accumulator must flag exactly the shards the
  * sorted-concat md5 digest flags — same drop/dup/substitute
  * detection contract, O(1) aggregation state instead of a collected
  * member list. */
class ManifestDigestSpec extends AnyFunSuite {
  import TestBase._

  private val C = graft.operators.CurationOps

  /** (doc_id, n_chars) frame; n_chars fixed so ONLY membership drives
    * the digest columns under test. */
  private def corpus(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("doc_id").withColumn("n_chars", lit(100L))
  }

  /** shard -> digest columns, for either manifest variant. */
  private def digests(df: DataFrame): Map[Long, Seq[Any]] =
    df.collect().map { r =>
      r.getLong(0) -> (3 until r.length).map(r.get)
    }.toMap

  private def changedShards(a: Map[Long, Seq[Any]],
                            b: Map[Long, Seq[Any]]): Set[Long] =
    (a.keySet ++ b.keySet).filter(k => a.get(k) != b.get(k))

  private val baseIds = (1L to 400L)
  private lazy val sortedBase = digests(C.shardManifestOn(corpus(baseIds)))
  private lazy val scaleBase = digests(C.shardManifestScaleOn(corpus(baseIds)))

  private def agree(mutated: Seq[Long], label: String): Unit = {
    val sortedDelta =
      changedShards(sortedBase, digests(C.shardManifestOn(corpus(mutated))))
    val scaleDelta =
      changedShards(scaleBase, digests(C.shardManifestScaleOn(corpus(mutated))))
    assert(sortedDelta == scaleDelta,
      s"$label: sorted digest flags $sortedDelta but scale digest flags $scaleDelta")
    assert(sortedDelta.nonEmpty == (mutated.sorted != baseIds.sorted),
      s"$label: mutation visibility wrong (flagged $sortedDelta)")
  }

  test("identical member sets in any order produce identical digests") {
    val shuffled = scala.util.Random.shuffle(baseIds.toVector)
    val reDigest = digests(C.shardManifestScaleOn(
      corpus(shuffled).repartition(7)))
    assert(reDigest == scaleBase,
      "row order / partitioning leaked into the commutative digest")
  }

  test("a dropped member flags the same shard as the sorted digest") {
    for (drop <- Seq(1L, 97L, 400L))
      agree(baseIds.filterNot(_ == drop), s"drop $drop")
  }

  test("a duplicated member flags the same shard (xor alone would miss even counts)") {
    for (dup <- Seq(3L, 211L)) {
      agree(baseIds :+ dup, s"dup $dup")
      // EVEN-count duplicate: xor component cancels, sum must catch it
      agree(baseIds :+ dup :+ dup, s"double-dup $dup")
    }
  }

  test("a substituted member flags both affected shards") {
    agree(baseIds.map(i => if (i == 250L) 9999L else i), "substitute 250->9999")
  }

  test("an additive near-collision (swap preserving raw id sum) still flags") {
    // ids 10+13 -> 11+12 preserves Σ doc_id but not Σ md5(doc_id):
    // the digest sums HASHES, never raw ids, so this must flag
    val ids0 = baseIds.filterNot(Set(11L, 12L))
    val a = digests(C.shardManifestScaleOn(corpus(ids0)))
    val mutated = ids0.map { case 10L => 11L; case 13L => 12L; case i => i }
    val b = digests(C.shardManifestScaleOn(corpus(mutated)))
    assert(changedShards(a, b).nonEmpty,
      "raw-id-sum-preserving swap went undetected")
  }
}
