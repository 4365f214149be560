package graft.dedup

import graft.PortableHash
import graft.textops.TextOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Passage-level EXACT-substring dedup: maximal runs of text duplicated
  * ACROSS documents (boilerplate paragraphs shared by millions of
  * pages), the one corpus-hygiene operator doc-level exact/near-dup
  * cannot express — two long documents sharing one paragraph are not
  * near-dups of each other, but the paragraph must still be found.
  *
  * Distributed design (NO suffix arrays across the cluster — the
  * suffix-array construction of Lee et al., "Deduplicating Training
  * Data Makes Language Models Better" (ACL 2022), assumes a shared
  * in-memory index; its distributed approximation is window
  * fingerprinting):
  *
  *  1. every L-token window of every doc is fingerprinted with the
  *     portable 60-bit md5 hash, carrying its token offset — a
  *     record-local HOF map (posexplode of the shingle array), no
  *     shuffle, no UDF;
  *  2. one groupBy(whash) with partial aggregation counts each window's
  *     document frequency; windows in >= minDocFreq distinct docs are
  *     duplicate ANCHORS (map-side combine keeps hot boilerplate
  *     windows from concentrating pre-aggregation);
  *  3. anchors equi-join back to the positioned windows (shuffle keyed
  *     by whash), and per doc the surviving positions merge into
  *     maximal duplicated spans with the islands pattern (one window
  *     shuffle keyed by doc_id, reused by the final groupBy).
  *
  * A span's L-gram coverage means every L-token run inside it occurs
  * somewhere else in the corpus; the span as a WHOLE may be a chimera
  * (prefix shared with doc X, suffix with doc Y) — the standard window
  * -fingerprint trade, worth it because no pairwise doc join ever
  * happens: cost is linear in corpus tokens plus two bounded shuffles,
  * vs the reference-free alternative (all-pairs substring compare)
  * which is quadratic.
  *
  * maxDocFreq is the hot-key guard for the join-back shuffle: an anchor
  * shared by 10^8 docs sends all its occurrences to ONE reduce
  * partition. Over-cap anchors are dropped whole and auditable via
  * [[droppedAnchors]] (the no-silent-caps posture shared with the LSH /
  * ngram / simhash caps); a pipeline that must keep them can union a
  * broadcast-join pass over just the over-cap anchor set, which is tiny
  * by construction.
  *
  * The corpus scan + window fingerprinting runs twice (anchor counting
  * + join-back): windows are per-token, so persisting them (the sigs
  * pattern in minhashNearDups) would cache a frame larger than the
  * corpus itself; at petabyte scale land the window frame in a temp
  * table instead and read it twice.
  */
object Substring {

  /** Positioned L-token window fingerprints: (doc_id, pos, whash),
    * pos 0-based token offset. Docs with fewer than L tokens emit no
    * windows (shingleArray's clamp). The scan is spread across cores
    * before the CPU-heavy md5 map (same posture as Dedup.shingles).
    */
  def windows(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int): DataFrame = {
    val sh = TextOps.shinglesOfText(col("__t"), windowTokens)
    graft.Parallelize.bySplits(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")), "doc_id")
      .select(col("doc_id"), posexplode(sh).as(Seq("pos", "wtext")))
      .select(col("doc_id"), col("pos"),
        PortableHash.md5Hash60(col("wtext")).as("whash"))
  }

  /** Per-window document frequency: (whash, df). */
  private def anchorFreq(w: DataFrame): DataFrame =
    w.groupBy(col("whash")).agg(countDistinct(col("doc_id")).as("df"))

  /** No-silent-caps audit: the anchors duplicatePassages' maxDocFreq
    * drops, with their document frequency. A non-empty result is recall
    * loss on exactly the most-shared boilerplate — run it alongside
    * capped jobs and either raise the cap or add the broadcast pass for
    * the listed anchors.
    */
  def droppedAnchors(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 8, maxDocFreq: Int = 100000): DataFrame =
    anchorFreq(windows(docs, idCol, textCol, windowTokens))
      .filter(col("df") > maxDocFreq)

  /** Maximal duplicated passages: one row per (doc, merged span of
    * duplicate-anchor windows) — (doc_id, span_start, span_end) in
    * token offsets (end exclusive), dup_group = the span's minimum
    * window fingerprint (identical passages share it), n_windows = how
    * many duplicate anchors merged into the span.
    */
  def duplicatePassages(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 8, minDocFreq: Int = 2,
      maxDocFreq: Int = 100000): DataFrame = {
    val w = windows(docs, idCol, textCol, windowTokens)
    val anchors = anchorFreq(w)
      .filter(col("df") >= minDocFreq && col("df") <= maxDocFreq)
      .select(col("whash"))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    // islands: a window extends the current span when it starts within
    // L tokens of the previous duplicated window (overlap or exact
    // adjacency — the duplicated text is contiguous either way); the
    // first window of a doc has a null lag and opens a span
    val isl = w.join(anchors, "whash")
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(byDoc) <= windowTokens, 0)
          .otherwise(1))
      .withColumn("island",
        sum("brk").over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + windowTokens).cast("long").as("span_end"),
        min(col("whash")).as("dup_group"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("dup_group"), col("n_windows"))
  }
}
