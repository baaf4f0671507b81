package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CurationOps

/** Corpus-curation operators: transitive dedup clustering (the A~B~C
  * chain must collapse even when A≁C directly), deterministic
  * stratified sampling, and the quality-filter rules. */
class CurationSpec extends AnyFunSuite {
  import TestBase._

  test("dedup_keep_best: higher-quality member wins; ties fall to min doc_id; singleton keeps itself") {
    val dir = tmpDir("cur_keepbest")
    // docs 0/1 near-dup (1 appends two words -> longer -> higher
    // quality = uniq_ratio * min(1, n_tokens/50)); docs 2/3 identical
    // (equal quality -> min doc_id wins); doc 4 singleton.
    val a = "one two three four five six seven eight nine ten alpha beta"
    val b = a + " gamma delta"
    val t = "red blue green yellow purple orange pink brown black white"
    val lone = "totally different content with no overlap at all here now"
    writeTable(dir, "documents", documentsSchema, Seq(
      Row(0L, a, "en", "s0", a.length.toLong),
      Row(1L, b, "en", "s0", b.length.toLong),
      Row(2L, t, "en", "s0", t.length.toLong),
      Row(3L, t, "en", "s0", t.length.toLong),
      Row(4L, lone, "en", "s0", lone.length.toLong)))
    val got = CurationOps.dedupKeepBest(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(0L) == ((2L, 1L, 0.28)), s"cluster {0,1}: got $got")   // 14 distinct tokens / 50
    assert(got(2L) == ((2L, 2L, 0.2)), s"cluster {2,3}: got $got")    // 10/50, tie -> doc 2
    assert(got(4L) == ((1L, 4L, lone.split(" ").length / 50.0)), s"singleton: got $got")
    assert(got.size == 3)
  }

  test("curation_funnel: each planted doc falls at exactly its own gate") {
    val dir = tmpDir("cur_funnel")
    def words(p: String, n: Int) = (1 to n).map(p + _).mkString(" ")
    val benchT = words("b", 30)             // doc 0: held-out benchmark
    val goodT  = words("g", 30)             // doc 50: survives everything
    val shortT = words("s", 5)              // doc 51: quality 0.1 < 0.5
    val dupA   = words("d", 30)             // doc 52: loses dedup to 53
    val dupB   = words("d", 30) + " dx dy"  // doc 53: longer near-dup, keeper
    val leakT  = benchT + " lx ly lz lw lv" // doc 54: quotes the benchmark
    val rows = Seq(
      Row(0L, benchT, "en", "s0", benchT.length.toLong),
      Row(50L, goodT, "en", "s0", goodT.length.toLong),
      Row(51L, shortT, "en", "s0", shortT.length.toLong),
      Row(52L, dupA, "en", "s0", dupA.length.toLong),
      Row(53L, dupB, "en", "s0", dupB.length.toLong),
      Row(54L, leakT, "en", "s0", leakT.length.toLong))
    writeTable(dir, "documents", documentsSchema, rows)
    val out = CurationOps.curationFunnel(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((6L, 5L, 4L, 3L, 2L)),
      s"stage counts drifted: ${r.toSeq}")
    // survivors are docs 50 (30 tokens) and 53 (32 tokens)
    assert(r.getLong(6) == 62L, s"tokens_kept: ${r.toSeq}")
  }

  test("dedup_cluster: transitive near-dup chain collapses to one component") {
    val dir = tmpDir("cur_cluster")
    // A and B share most grams; B and C share most grams; A and C share
    // fewer — the pair graph is a chain, the component must still be one.
    val a = "one two three four five six seven eight nine ten alpha beta"
    val b = "one two three four five six seven eight nine ten gamma delta"
    val c = "zz yy three four five six seven eight nine ten gamma delta"
    val lone = "totally different content with no overlap at all here now"
    val rows = Seq(
      Row(0L, a, "en", "s0", a.length.toLong),
      Row(1L, b, "en", "s0", b.length.toLong),
      Row(2L, c, "en", "s0", c.length.toLong),
      Row(3L, lone, "en", "s0", lone.length.toLong))
    writeTable(dir, "documents", documentsSchema, rows)
    val comp = CurationOps.dedupCluster(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L),
      s"expected chain {0,1,2} + singleton {3}, got $comp")
  }

  test("contamination: a doc quoting the benchmark scores high, clean docs zero") {
    val dir = tmpDir("cur_contam")
    // benchmark = doc_id < 50; corpus doc 50 quotes benchmark text
    // verbatim, doc 51 shares nothing
    val benchText = "the quick brown fox jumps over the lazy dog today"
    val leak = "prefix words then the quick brown fox jumps over the lazy dog today"
    val clean = "completely unrelated sentence about distributed query engines"
    val rows = Seq(
      Row(0L, benchText, "en", "s0", benchText.length.toLong),
      Row(50L, leak, "en", "s0", leak.length.toLong),
      Row(51L, clean, "en", "s0", clean.length.toLong))
    writeTable(dir, "documents", documentsSchema, rows)
    val got = CurationOps.contamination(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set(50L, 51L), s"got $got")
    val (n50, ov50, c50) = got(50L)
    // leak doc: 12 tokens -> 10 distinct 3-grams, 8 of them benchmark
    // grams ("the quick brown" ... "the lazy dog today" tail)
    assert(ov50 > 0 && c50 > 0.5, s"leak not detected: $got")
    assert(ov50 <= n50)
    assert(got(51L)._2 == 0L && got(51L)._3 == 0.0, s"clean doc flagged: $got")
  }

  test("dedup_cluster: corpus with zero near-dup pairs = all singletons (no crash)") {
    val dir = tmpDir("cur_nopairs")
    val rows = (0 until 5).map { i =>
      val t = s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g"
      Row(i.toLong, t, "en", "s0", t.length.toLong)
    }
    writeTable(dir, "documents", documentsSchema, rows)
    val comp = CurationOps.dedupCluster(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == (0L until 5L).map(i => i -> i).toMap, s"got $comp")
  }

  test("dedup_cluster is idempotent-deterministic across runs") {
    val x = CurationOps.dedupCluster(spark, sf0001).collect().toSeq
    val y = CurationOps.dedupCluster(spark, sf0001).collect().toSeq
    assert(x == y)
  }

  test("ccStars == ccMinLabel on a mixed random graph (components, chains, singleton edges)") {
    import spark.implicits._
    // deterministic pseudo-random graph: cliques of 4, a 20-chain, stars
    val edges = ((0 until 60).map(i => (i.toLong * 7 % 97, i.toLong * 31 % 97)) ++
      (100L until 119L).map(i => (i, i + 1)) ++          // 20-node chain
      (0 until 5).map(i => (200L, 201L + i))             // star
    ).filter { case (a, b) => a != b }
      .toDF("d1", "d2")
    val byLabel = CurationOps.ccMinLabel(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byStars = CurationOps.ccStars(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byStars == byLabel,
      s"stars=$byStars\nlabel=$byLabel")
    assert(byLabel.values.forall(c => byLabel(c) == c), "component mins must be roots")
  }

  test("ccStars converges on a deep chain that exceeds the propagation bound") {
    import spark.implicits._
    // a 200-deep chain needs 200 propagation rounds (one hop per round)
    // but only O(log) star rounds — exactly the adversarial case the
    // alternative path exists for
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("d1", "d2")
    val ex = intercept[CurationOps.CcNonConvergence] {
      CurationOps.ccMinLabel(chain, maxIter = 64).collect()
    }
    assert(ex.getMessage.contains("ccMinLabel did not converge"))
    val comp = CurationOps.ccStars(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 201 && comp.values.forall(_ == 0L),
      s"chain must collapse to component 0, got ${comp.toSeq.sortBy(_._1).take(10)}...")
  }

  test("cc auto-falls back to ccStars past the propagation round budget") {
    import spark.implicits._
    // same adversarial deep chain, but through the production entry
    // point: no human re-run required — cc catches the typed
    // non-convergence and reclusters with the star algorithm
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("d1", "d2")
    val comp = CurationOps.cc(chain, maxIter = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 201 && comp.values.forall(_ == 0L),
      s"fallback must still collapse the chain to component 0, " +
        s"got ${comp.toSeq.sortBy(_._1).take(10)}...")
    // a shallow graph stays on the cheap path and agrees with ccStars
    val shallow = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("d1", "d2")
    val viaCc = CurationOps.cc(shallow).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaCc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("ccStars fails loudly when the round budget is exhausted") {
    import spark.implicits._
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("d1", "d2")
    val ex = intercept[IllegalArgumentException] {
      CurationOps.ccStars(chain, maxIter = 1).collect()
    }
    assert(ex.getMessage.contains("ccStars did not converge"))
  }

  test("ccStars on an empty edge set returns no rows (no crash)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(CurationOps.ccStars(empty).collect().isEmpty)
  }

  test("stratified sample: per-stratum rates within hash tolerance, reproducible") {
    val s1 = CurationOps.sampleStratified(spark, sf0001).collect()
    val s2 = CurationOps.sampleStratified(spark, sf0001).collect()
    assert(s1.toSeq == s2.toSeq, "sample not reproducible")
    assert(s1.forall(r =>
      r.getLong(2) < (if (r.getString(1) == "en") 20 else 50)),
      "a row leaked past its stratum's rate gate")
  }

  test("text_repetition: hand-computed fractions on planted repetitive docs") {
    val dir = tmpDir("cur_rep")
    val looped = "spam spam spam spam ham"          // top 'spam' 4/5; bigrams: spam-spam x3, spam-ham -> dup (4-2)/4
    val clean = "every word here is different"      // top 1/5, no dup bigrams
    val single = "solo"                             // 1 token, 0 bigrams
    val rows = Seq(
      Row(0L, looped, "en", "s0", looped.length.toLong),
      Row(1L, clean, "en", "s0", clean.length.toLong),
      Row(2L, single, "en", "s0", single.length.toLong))
    writeTable(dir, "documents", documentsSchema, rows)
    val got = CurationOps.textRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(0L) == ((5, 0.8, 0.5)), s"looped doc: ${got(0L)}")
    assert(got(1L) == ((5, 0.2, 0.0)), s"clean doc: ${got(1L)}")
    assert(got(2L) == ((1, 1.0, 0.0)), s"single-token doc: ${got(2L)}")
  }

  test("text_filter: every verdict matches its own emitted features") {
    CurationOps.textFilter(spark, sf0001).collect().foreach { r =>
      val (n, mean, uniq, stop) =
        (r.getInt(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      val expect = n >= 10 && n <= 5000 && mean >= 2.0 && mean <= 12.0 &&
        uniq > 0.2 && stop < 0.3
      assert(r.getInt(6) == (if (expect) 1 else 0), s"verdict mismatch at $r")
    }
  }

  test("pii_redact: redacted hash differs from raw where digits existed") {
    val e = Tables.events(spark, sf0001)
    import org.apache.spark.sql.functions._
    val joined = CurationOps.piiRedact(spark, sf0001)
      .join(e.select(col("event_id"), md5(col("props")).as("raw_hash")), "event_id")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val changed = r.getString(2) != r.getString(3)
      assert(changed == (r.getInt(1) > 0),
        s"hash changed iff digits redacted violated at $r")
    }
  }
}
