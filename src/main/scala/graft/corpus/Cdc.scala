package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — variable-size chunk boundaries
  * chosen by the CONTENT, not by fixed offsets: a chunk ends at token
  * position i when the hash of the 4-gram window ending at i is
  * divisible by the divisor. The property that matters for dedup/delta
  * storage: inserting text into a document only changes the chunks
  * around the edit — every later boundary re-synchronizes because it
  * depends only on a local window — whereas fixed-size chunking shifts
  * every subsequent chunk (the rsync/LBFS/borg principle).
  *
  * Hash = the engine-wide portable 60-bit md5, so the DuckDB oracle
  * replays every boundary bit-for-bit.
  *
  * Scale shape: token explode is a record-local Generate in the scan
  * stage; the 4-gram window (three lags) and the chunk groupBy share
  * ONE doc-keyed exchange; per-chunk state is the chunk's own tokens.
  */
object Cdc {

  /** (doc_id, chunk_idx, start_tok, n_toks, chunk_sha) per chunk;
    * 1-based token positions, chunk_sha = sha256 of the chunk's
    * space-joined tokens.
    */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
      divisor: Int): DataFrame = {
    // spread the token frame on the window's own key: the window's
    // ENSURE_REQUIREMENTS exchange is byte-targeted, so AQE coalesced
    // it to 2 partitions (token rows are small in bytes) and the
    // rolling-gram hashing + chunk sha ran 2-way parallel (measured
    // 0.4-0.6 s 2-task stages at sf0.1). The pinned keyed repartition
    // satisfies ClusteredDistribution(doc_id), so the window adds no
    // second exchange; at production scan widths bySplits is a no-op.
    val tok = graft.Parallelize.bySplits(
      docs.select(col(idCol).as("doc_id"),
          posexplode(split(col(textCol), " ", -1)).as(Seq("pos0", "tok")))
        .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok")),
      "doc_id")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val gram = concat_ws(" ",
      lag(col("tok"), 3).over(w), lag(col("tok"), 2).over(w),
      lag(col("tok"), 1).over(w), col("tok"))
    val flagged = tok.withColumn("__b",
      when(col("pos") >= 4 &&
        graft.PortableHash.md5Hash60(gram) % divisor === 0, 1).otherwise(0))
    // a boundary at pos CLOSES the chunk at pos: tokens after it start
    // the next chunk, so chunk_idx = boundaries strictly before pos
    val withChunk = flagged.withColumn("chunk_idx",
      coalesce(sum(col("__b")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    withChunk.groupBy(col("doc_id"), col("chunk_idx"))
      .agg(
        min(col("pos")).as("start_tok"),
        count(lit(1)).as("n_toks"),
        sha2(array_join(transform(
          array_sort(collect_list(struct(col("pos").as("p"), col("tok").as("t")))),
          x => x.getField("t")), " "), 256).as("chunk_sha"))
  }

  /** Cross-document chunk-store deduplication — the report a
    * content-addressed chunk store (borg/restic/LBFS model) builds
    * over [[chunks]]: group every chunk in the corpus by its content
    * hash and emit each hash stored more than once, with copy counts,
    * distinct-document counts, the canonical copy to keep (lexicographic
    * min (doc_id, chunk_idx) — deterministic survivorship) and the
    * token savings from storing the content once. Because CDC
    * boundaries re-synchronize after edits, shared passages between
    * near-identical documents land in identical chunks and surface
    * here even when the documents as wholes differ — the storage-side
    * complement of passage-level dedup.
    *
    * Scale shape: [[chunks]]' one doc-keyed exchange, then ONE
    * combinable chunk_sha-keyed shuffle (count/min partials map-side);
    * no self-join, no driver collection. Chunk hashes are uniform, so
    * the second shuffle has no skew axis beyond genuinely mass-
    * duplicated content — which is precisely the signal reported.
    */
  def chunkDedup(docs: DataFrame, idCol: String, textCol: String,
      divisor: Int, minCopies: Int = 2): DataFrame =
    chunks(docs, idCol, textCol, divisor)
      .groupBy(col("chunk_sha"))
      .agg(
        min(col("n_toks")).as("n_toks"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(struct(col("doc_id"), col("chunk_idx"))).as("__keep"))
      .filter(col("n_copies") >= minCopies)
      .select(col("chunk_sha"), col("n_toks"), col("n_copies"), col("n_docs"),
        col("__keep.doc_id").as("keep_doc"),
        col("__keep.chunk_idx").as("keep_idx"),
        ((col("n_copies") - 1) * col("n_toks")).as("saved_toks"))
}
