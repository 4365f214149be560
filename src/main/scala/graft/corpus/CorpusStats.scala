package graft.corpus

import graft.textops.TextOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus analytics: the most frequent n-gram shingles per group
  * (typically language) — the "what is actually in this corpus" report
  * that drives stopword lists, boilerplate hunting, and mixture
  * sanity checks.
  *
  * Scale posture: the count is one shuffle on (group, shingle) with
  * map-side combine. The top-k is ONE row_number window: Spark's
  * rank-limit pushdown (WindowGroupLimit, 3.5+) inserts a partial
  * per-group top-k below the window's exchange, so each upstream task
  * forwards at most k rows per group and no language's full
  * distinct-shingle set (10^10 rows at corpus scale) ever crosses one
  * task — the reducer sees <= k x map-tasks rows per group. The
  * hand-rolled salted two-level top-k this replaces bought the same
  * bound for an extra full exchange (see Sampling.domainCap).
  */
object CorpusStats {

  /** (group, shingle, cnt, rank): rank 1..k per group, ordered by
    * (cnt desc, shingle asc) — the tiebreak keeps the output
    * deterministic and engine-portable.
    */
  def topShinglesPerGroup(docs: DataFrame, groupCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: k=$k")
    val counts = graft.Parallelize.bySplits(
        docs.select(col(groupCol).as("grp"), col(textCol).as("__t")), "grp")
      .select(col("grp"),
        explode(TextOps.shinglesOfText(col("__t"), n)).as("shingle"))
      .groupBy(col("grp"), col("shingle")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("cnt").desc, col("shingle").asc)
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("grp").as(groupCol), col("shingle"), col("cnt"), col("rank"))
  }

  /** TF-IDF term weights: (doc_id, term, tf, df, tfidf) with
    * tfidf = tf * ln(n_docs / df), for terms with tf >= minTf. Two
    * map-side-combined shuffles (term counts, document frequency) plus
    * a broadcast 1-row corpus count — no window, no collect. The
    * output is deliberately rank-free: scores are doubles, and a
    * ranked oracle would hash-flip on a 1-ulp ln() divergence between
    * engines, while raw score VALUES are canonicalized by the gate.
    * Rank per doc with [[topTermsPerDoc]] when consuming.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String,
      minTf: Int = 2): DataFrame = {
    val tf = graft.Parallelize.bySplits(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")), "doc_id")
      .select(col("doc_id"), explode(TextOps.tokens(col("__t"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .filter(col("tf") >= minTf)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf") * log(col("n_docs").cast("double") / col("df"))).as("tfidf"))
  }

  /** BM25 retrieval scores (Robertson/Zaragoza, with the Lucene
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf that stays positive for
    * df > N/2): per document matching >= 1 query term,
    * score = sum over matched terms of
    * idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    *
    * Scale posture: the query-term filter lands directly on the
    * exploded token stream, so the tf shuffle carries only
    * |queryTerms| terms' postings — the term-partitioned inverted-
    * index probe, not a corpus-wide score. Document length and avgdl
    * are one map-side-combined count plus a broadcast 1-row corpus
    * aggregate.
    *
    * Determinism: per-(doc, term) scores are single IEEE formulas; the
    * per-doc sum folds the matched terms in TERM-SORTED order
    * (array_sort + left fold), never agg-arrival order, so the oracle
    * replays the accumulation exactly. The idf is DISCRETIZED to
    * integer micro-nats (floor(ln * 1e6 + 0.5) / 1e6 — the bigram-LM
    * precedent): JVM StrictMath.log and C libm genuinely disagree by
    * 1 ulp on some arguments (measured: df=3857/N=5000 at sf0.1), and
    * raw ln would leak that into every score containing the term; after
    * discretization a 1-ulp ln flip changes the score only when
    * ln*1e6+0.5 sits within ~3e-11 of an integer. Output is rank-free
    * for the same reason as [[tfidf]]; consumers rank with their own
    * tiebreak.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = graft.Parallelize.bySplits(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")), "doc_id")
      .select(col("doc_id"), explode(TextOps.tokens(col("__t"))).as("term"))
      .filter(col("term") =!= "")
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val termScore = (floor(log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        lit(1000000.0) + lit(0.5)) / lit(1000000.0)) *
      (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .select(col("doc_id"), col("term"), termScore.as("ts"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("term"), col("ts"))).as("parts"))
      .select(col("doc_id"),
        size(col("parts")).cast("bigint").as("n_matched"),
        aggregate(array_sort(col("parts")), lit(0.0),
          (acc, x) => acc + x.getField("ts")).as("score"))
  }

  /** Per-token KL(A||B) contributions between two corpus slices — the
    * domain-shift / drift report: which tokens make slice A diverge
    * from slice B (sums to the full KL divergence under add-one
    * smoothing over the UNION vocabulary, so absent-in-B tokens are
    * finite). Output is rank-free per-token rows (counts exact,
    * contribution a row-level IEEE formula — the q_tfidf posture).
    *
    * Scale posture: one map-side-combined token-count shuffle with the
    * two slice counts as conditional sums (single pass, no join of two
    * count tables), plus a broadcast 1-row totals cross join.
    */
  def tokenKlContribs(docs: DataFrame, sliceCol: String, textCol: String,
      sliceA: String, sliceB: String): DataFrame = {
    val c = docs
      .filter(col(sliceCol).isin(sliceA, sliceB))
      .select(col(sliceCol).as("__s"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok"))
      .agg(sum(when(col("__s") === sliceA, 1L).otherwise(0L)).as("c_a"),
        sum(when(col("__s") === sliceB, 1L).otherwise(0L)).as("c_b"))
    val tot = c.agg(sum(col("c_a")).as("tot_a"), sum(col("c_b")).as("tot_b"),
      count(lit(1)).as("v"))
    val pA = (col("c_a") + lit(1.0)) / (col("tot_a") + col("v"))
    val pB = (col("c_b") + lit(1.0)) / (col("tot_b") + col("v"))
    c.crossJoin(broadcast(tot))
      .select(col("tok"), col("c_a"), col("c_b"),
        (pA * log(pA / pB)).as("kl_contrib"))
  }

  /** Top-m TF-IDF terms per document. The per-doc window partition is
    * bounded by one document's vocabulary, so no salting is needed
    * (unlike the per-GROUP top-k above).
    */
  def topTermsPerDoc(docs: DataFrame, idCol: String, textCol: String,
      m: Int, minTf: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    tfidf(docs, idCol, textCol, minTf)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= m)
  }

  /** Token frequency-of-frequencies spectrum (the Zipf/Heaps corpus
    * health report): how many distinct terms occur exactly `freq`
    * times. A healthy natural-language corpus shows a power-law tail;
    * a template-stamped crawl shows mass at suspiciously identical
    * frequencies. Two map-side-combined shuffles, output bounded by
    * the number of DISTINCT frequencies (tiny), no windows.
    */
  def frequencySpectrum(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .groupBy("freq").agg(count(lit(1)).as("n_terms"))

  /** Zipf power-law fit: least-squares slope/intercept of ln(freq) vs
    * ln(rank) over the `topR` most frequent terms — the one-number
    * naturalness check on a crawl slice (natural language sits near
    * slope -1; template-stamped spam flattens it). Companion readout to
    * [[frequencySpectrum]]: that reports the whole distribution, this
    * fits its head.
    *
    * Scale shape: one map-side-combined term-count shuffle, then a
    * TakeOrdered top-R (never a global sort) and a single-row closed-
    * form aggregate. Determinism: ln is discretized to integer
    * micro-nats (floor(ln*1e6 + 0.5) — the q_bm25 discipline, StrictMath
    * vs libm differ by 1 ulp) and all five regression sums are exact
    * BIGINT, so shuffle arrival order cannot perturb the fitted doubles;
    * the final slope/intercept divisions are the only float ops and are
    * expression-order-identical in the oracle.
    */
  def zipfFit(docs: DataFrame, textCol: String, topR: Int = 100): DataFrame = {
    val top = docs
      .select(explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term").asc).limit(topR)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("term").asc)))
    val sums = top
      .select(
        floor(log(col("rank").cast("double")) * 1e6 + 0.5).cast("long").as("x"),
        floor(log(col("freq").cast("double")) * 1e6 + 0.5).cast("long").as("y"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    sums
      .withColumn("slope",
        (col("n_terms") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n_terms") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("intercept",
        (col("sy").cast("double") - col("slope") * col("sx").cast("double")) /
          (col("n_terms").cast("double") * lit(1e6)))
      .select(col("n_terms"), col("slope"), col("intercept"))
  }
}
