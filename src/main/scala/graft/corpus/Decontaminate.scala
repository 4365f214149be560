package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the GPT-3 appendix-C / PaLM-style
  * eval-set overlap filter: flag (and drop) corpus documents that share
  * at least `minHits` distinct n-token shingles with a benchmark table,
  * so evaluation numbers are not inflated by training on the test set.
  *
  * NOT a dedup variant: the relation is asymmetric — a huge corpus
  * checked against a benchmark that is orders of magnitude smaller, and
  * only the corpus side is filtered. That asymmetry is what the plan
  * exploits:
  *
  *  - benchmark shingles are hashed (the portable 60-bit md5 base, so
  *    the DuckDB oracle replays hits bit-for-bit) and DISTINCT-ed into
  *    one small relation — eval sets are thousands of documents, so
  *    this side broadcasts; above the broadcast threshold Catalyst/AQE
  *    falls back to a shuffle equi-join and the operator still works,
  *    just with one bounded shuffle;
  *  - corpus shingles stream through the join WITHOUT pre-dedup: the
  *    benchmark side being distinct makes the join 1:<=1 per corpus
  *    shingle, so no hot-shingle fan-out exists and no cap is needed
  *    (unlike the near-dup candidate generators); the per-doc distinct
  *    hit count happens AFTER the join, on the tiny hit set, via
  *    countDistinct's partial aggregation.
  *
  * n=13 follows the published filters; the tests and the oracled query
  * use smaller n so the synthetic corpus actually overlaps.
  */
object Decontaminate {

  /** (doc_id, shash) for every n-token shingle occurrence; NOT deduped
    * (see object doc — dedup after the join is the cheap side). A
    * projection of [[graft.dedup.Substring.windows]] — one shared
    * fingerprint construction, so the tokenization/clamp/parallelize
    * semantics cannot drift between the substring and decontamination
    * operators.
    */
  def shingleHashes(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    graft.dedup.Substring.windows(docs, idCol, textCol, n)
      .select(col("doc_id"), col("whash").as("shash"))

  /** Corpus docs overlapping the benchmark: (doc_id, n_hits) with
    * n_hits = distinct shared shingles, filtered to >= minHits.
    */
  def contaminationHits(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String,
      benchIdCol: String, benchTextCol: String,
      n: Int = 13, minHits: Int = 1): DataFrame = {
    val benchShingles = shingleHashes(bench, benchIdCol, benchTextCol, n)
      .select(col("shash")).distinct()
    shingleHashes(corpus, idCol, textCol, n)
      .join(benchShingles, "shash")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shash")).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** The decontaminated corpus: every corpus row except flagged docs.
    * Anti-join keyed on the (small) contaminated-id set — broadcast-able;
    * the full corpus is never shuffled.
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String,
      benchIdCol: String, benchTextCol: String,
      n: Int = 13, minHits: Int = 1): DataFrame = {
    val flagged = contaminationHits(corpus, bench, idCol, textCol,
        benchIdCol, benchTextCol, n, minHits)
      .select(col("doc_id").as(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
