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
  * map-side combine. The top-k itself is TWO-LEVEL: a naive
  * row_number window partitioned by group alone would pull every
  * distinct shingle of a language through one task (10^10-row
  * partitions at corpus scale); instead a salted local top-k bounds
  * each window partition, and the global window only ranks the
  * k x salts survivors per group. Counts are already global when the
  * salt is applied, so the union of per-salt top-ks is a superset of
  * the global top-k and the final output is identical to the naive
  * form — which is what the DuckDB oracle replays.
  */
object CorpusStats {

  /** (group, shingle, cnt, rank): rank 1..k per group, ordered by
    * (cnt desc, shingle asc) — the tiebreak keeps the output
    * deterministic and engine-portable.
    */
  def topShinglesPerGroup(docs: DataFrame, groupCol: String, textCol: String,
      n: Int, k: Int, salts: Int = 64): DataFrame = {
    require(k >= 1 && salts >= 1, s"k and salts must be positive: k=$k salts=$salts")
    val counts = graft.Parallelize.bySplits(
        docs.select(col(groupCol).as("grp"), col(textCol).as("__t")), "grp")
      .select(col("grp"),
        explode(TextOps.shingleArray(TextOps.tokens(col("__t")), n)).as("shingle"))
      .groupBy(col("grp"), col("shingle")).agg(count(lit(1)).as("cnt"))
    val localW = Window
      .partitionBy(col("grp"), pmod(xxhash64(col("shingle")), lit(salts)))
      .orderBy(col("cnt").desc, col("shingle").asc)
    val survivors = counts
      .withColumn("lr", row_number().over(localW))
      .filter(col("lr") <= k)
      .drop("lr")
    val globalW = Window.partitionBy(col("grp"))
      .orderBy(col("cnt").desc, col("shingle").asc)
    survivors
      .withColumn("rank", row_number().over(globalW))
      .filter(col("rank") <= k)
      .select(col("grp").as(groupCol), col("shingle"), col("cnt"), col("rank"))
  }
}
