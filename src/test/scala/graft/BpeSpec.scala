package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeOps

/** BPE trainer/encoder contract (q_bpe_vocab / q_bpe_encode are
  * declared non-oracle — this suite is their correctness gate).
  *
  * Fixture arithmetic, worked by hand for `low low lower` repeated:
  * word counts {low: 2k, lower: k}. Initial symbols are characters.
  *  - round 0 pairs: (l,o)=3k, (o,w)=3k — tie broken by (left, right)
  *    string order ⇒ (l,o) wins; words become [lo,w] / [lo,w,e,r]
  *  - round 1: (lo,w)=3k wins ⇒ [low] / [low,e,r]
  *  - round 2: (e,r)=k vs (low,e)=k — (e,r) < (low,e) ⇒ (e,r) wins
  *  - round 3: (low,er)=k ⇒ [lower]; no pair occurs twice afterwards
  *    (every word is a single symbol) ⇒ training stops early.
  */
class BpeSpec extends AnyFunSuite {
  import TestBase._

  private def docsFixture(texts: Seq[String]): String = {
    val dir = tmpDir("bpe")
    writeTable(dir, "documents", documentsSchema,
      texts.zipWithIndex.map { case (t, i) =>
        Row(i.toLong, t, "en", "s0", t.length.toLong) })
    dir
  }

  test("trainBpe reproduces the hand-computed merge table, stops early when dry") {
    val dir = docsFixture(Seq.fill(5)("low low lower"))
    val merges = BpeOps.trainBpe(spark, dir, merges = 16)
    assert(merges.map(m => (m.left, m.right)) ===
      Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")))
    assert(merges.map(_.n) === Seq(15L, 15L, 5L, 5L))
    assert(merges.map(_.rank) === Seq(0, 1, 2, 3))
  }

  test("decode inverse: concatenating a word's symbols reproduces the word") {
    val dir = docsFixture(Seq("the quick brown fox jumps over the lazy dog",
                              "pack my box with five dozen liquor jugs"))
    val dict = BpeOps.bpeDictionary(spark, dir, merges = 8).collect()
    assert(dict.nonEmpty)
    dict.foreach { r =>
      val w = r.getString(0)
      val sym = r.getSeq[String](1)
      assert(sym.mkString === w, s"decode($w) broke")
      assert(sym.forall(_.nonEmpty))
    }
  }

  test("compression: more merges never increase the subword token count") {
    val dir = docsFixture(Seq.fill(3)("banana bandana ban and anna"))
    def totalTokens(merges: Int): Long =
      BpeOps.bpeDictionary(spark, dir, merges).collect()
        .map(r => r.getSeq[String](1).size * r.getLong(2)).sum
    val counts = Seq(0, 2, 4, 8).map(totalTokens)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"token counts not monotone: $counts")
    // and merging genuinely compresses this repetitive fixture
    assert(counts.last < counts.head)
  }

  test("q_bpe_encode invariants: words <= tokens <= chars, ratio >= 1") {
    val rows = BpeOps.bpeEncode(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (words, toks, chars) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(words <= toks, "a word encodes to at least one token")
      assert(toks <= chars, "a token holds at least one character")
      assert(r.getDouble(4) >= 1.0)
    }
  }

  test("q_bpe_vocab on the test corpus is deterministic across calls") {
    val a = BpeOps.bpeVocab(spark, sf0001).collect().toSeq
    val b = BpeOps.bpeVocab(spark, sf0001).collect().toSeq
    assert(a === b)
    assert(a.size === BpeOps.BpeMerges) // corpus is rich enough to fill
  }
}
