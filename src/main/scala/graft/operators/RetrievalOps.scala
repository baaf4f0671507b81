package graft.operators

import graft.{Fin, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic IR scoring over the `documents` corpus: TF-IDF term weighting
  * and BM25 retrieval (SURVEY.md §2.8 — text-analysis family). These are
  * the two workhorse relevance primitives of a training-data pipeline:
  * TF-IDF for per-document salient-term extraction (topic labeling,
  * keyword-based filtering) and BM25 for query-driven corpus retrieval
  * (e.g. pulling eval-adjacent documents out of a 100 TB crawl).
  *
  * Scale notes (100 TB):
  *  - the token explode is linear in corpus size and partial-aggregable:
  *    tf is one shuffle on (doc_id, tok), df one shuffle on tok;
  *  - corpus-level scalars (N, avgdl) are 1-row frames cross-joined via
  *    broadcast — never a driver-side collect;
  *  - BM25 filters the exploded tokens to the query terms BEFORE any
  *    shuffle, so the scored frame is |q| rows per matching doc, not the
  *    full posting list; the final top-20 is a TakeOrderedAndProject
  *    (per-partition heap + driver merge of 20 rows), not a global sort;
  *  - determinism: scores are round(·,4) before any argmax/ordering and
  *    ties break on the unique key (tok / doc_id) — the hash-safe rule.
  */
object RetrievalOps {
  import Fin._

  /** Tokens per document: whitespace split, empty tokens dropped —
    * exactly `string_split(text, ' ')` + `length(tok) > 0` in DuckDB. */
  private def toks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)

  /** q_tfidf — per-document top TF-IDF term. tf = in-doc term count,
    * idf = ln((1+N)/(1+df)) (smoothed), score = tf·idf rounded to 4
    * decimals; the winning term is the min token among max-score ties
    * (`min_by` on a (-score, tok) struct — one partial-aggregable
    * shuffle, no per-doc window sort). */
  def tfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val n = docs.agg(count(lit(1)).as("n"))
    val tf = toks(docs).groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "tok").crossJoin(broadcast(n))
      .withColumn("s", r4(col("tf") * log((lit(1.0) + col("n")) / (lit(1.0) + col("df")))))
    ord(
      scored.groupBy(col("doc_id"))
        .agg(min_by(col("tok"), struct((-col("s")).as("ns"), col("tok").as("t")))
               .as("top_tok"),
             max(col("s")).as("tfidf")),
      col("doc_id"))
  }

  /** BM25 hyperparameters (the standard Robertson defaults) and the
    * fixed demo query — `dup` is a rare term in the synthetic corpus,
    * `spark`/`hash` are common, so the score exercises the full idf
    * range. */
  private val K1 = 1.2
  private val B = 0.75
  private[graft] val BmQuery = Seq("spark", "hash", "dup")

  /** q_bm25 — top-20 documents for a fixed 3-term query under BM25:
    * idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)),
    * score(d) = Σ_t idf·tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)). */
  def bm25(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val t = toks(docs)
    // Document lengths (token instances) and the corpus scalars.
    val dl = t.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    // Query-term postings only — the filter runs before the tf shuffle.
    val tfq = t.filter(col("tok").isin(BmQuery: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfq = tfq.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = tfq.join(broadcast(dfq), "tok").join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("term_s",
        col("idf") * col("tf") * (lit(K1) + 1.0) /
          (col("tf") + lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("dl") / col("avgdl"))))
    scored.groupBy(col("doc_id"))
      .agg(r4(sum(col("term_s"))).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }
}
