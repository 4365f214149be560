package graft.corpus

import graft.textops.TextOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into overlapping
  * token-window chunks — the training-prep step between cleaning and
  * sequence packing (long docs must become model-context-sized pieces
  * before packSequences lays them out; the overlap keeps boundary
  * context so no next-token prediction ever lacks its left context
  * entirely).
  *
  * Layout rule (deterministic, engine-portable): chunk starts are
  * 0, S, 2S, ... with stride S = maxTokens - overlap, generated while
  * start <= max(nTokens - overlap - 1, 0); chunk k covers tokens
  * [k*S, min(k*S + maxTokens, n)). Every token is covered, every chunk
  * past the first repeats exactly `overlap` tokens of its predecessor,
  * and no chunk is generated that adds no new token. A doc shorter than
  * maxTokens yields exactly one chunk (itself).
  *
  * Scale posture: pure record-local HOF columns (sequence + posexplode
  * + slice) inside the scan's codegen stage — zero shuffles, no UDF,
  * embarrassingly parallel, and the DuckDB oracle replays the layout
  * byte-for-byte.
  */
object Chunking {

  /** (doc_id, chunk_idx, chunk_text, n_tokens), chunk_idx 0-based. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens): got overlap=$overlap maxTokens=$maxTokens")
    val stride = maxTokens - overlap
    docs
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0),
          greatest(size(col("toks")) - overlap - 1, lit(0)),
          lit(stride))).as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx"),
        array_join(slice(col("toks"), col("start") + 1, lit(maxTokens)), " ")
          .as("chunk_text"),
        size(slice(col("toks"), col("start") + 1, lit(maxTokens)))
          .as("n_tokens"))
  }
}
