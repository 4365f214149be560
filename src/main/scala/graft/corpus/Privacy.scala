package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity over quasi-identifier columns — the privacy-hardening
  * pass a training corpus gets before release: no published row may be
  * identifiable within a group of fewer than k rows sharing its
  * quasi-identifiers (Sweeney 2002, "k-anonymity: a model for
  * protecting privacy").
  *
  * Generalization is a fixed prefix ladder over the caller's QI columns
  * (ordered most→least identifying): a row publishes at the FINEST
  * level whose group still holds >= k rows — level 0 keeps every QI
  * column, level i drops the last i columns, the final level is the
  * catch-all (whole corpus, always >= k for k <= |corpus|). Dropped
  * columns are published as NULL, so the output schema is stable and
  * the suppression is explicit per row rather than a silent row drop
  * (the no-silent-caps posture: `group_n` carries the published group's
  * size as evidence the k contract holds).
  *
  * Scale posture: one groupBy per ladder level (depth bounded by the QI
  * arity, typically 2-4), each map-side combinable with at most
  * |distinct QI prefix| result rows, joined back by shuffle equi-join.
  * Deliberately NOT a count-over-window per level: an unbounded window
  * partitioned by a coarse prefix (e.g. one language) funnels that
  * prefix's billions of rows through a single task's sort, while the
  * groupBy+join shape keeps every stage hash-partitioned and
  * AQE-skew-splittable.
  */
object Privacy {

  /** (idCol, level, <qi columns — NULL where generalized away>,
    * group_n) for every input row; `level` in [0, qiCols.length], the
    * number of trailing QI columns suppressed to reach a group of
    * >= k rows. QI columns must be non-null (the per-level counts join
    * back on them null-unsafely; map missing values to a sentinel
    * upstream) — NULL in the output always means "generalized away".
    */
  def kAnonymize(df: DataFrame, idCol: String, qiCols: Seq[String],
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val nLevels = qiCols.length // levels 0..nLevels, last = catch-all
    var cur = df.select(col(idCol) +: qiCols.map(col): _*)
    for (lvl <- 0 until nLevels) {
      val key = qiCols.dropRight(lvl)
      val cnts = df.groupBy(key.map(col): _*)
        .agg(count(lit(1)).as(s"__cnt$lvl"))
      cur = cur.join(cnts, key, "left")
    }
    val total = df.agg(count(lit(1)).as(s"__cnt$nLevels"))
    cur = cur.crossJoin(broadcast(total))
    val level = (0 until nLevels).foldRight(lit(nLevels)) { (lvl, rest) =>
      when(col(s"__cnt$lvl") >= k, lvl).otherwise(rest)
    }
    val withLevel = cur.withColumn("level", level.cast("int"))
    val published = qiCols.zipWithIndex.map { case (c, i) =>
      // column i survives while i < published prefix length
      // (= qiCols.length - level)
      when(col("level") <= lit(nLevels - 1 - i), col(c))
        .otherwise(lit(null)).as(c)
    }
    val groupN = (0 until nLevels).foldRight(col(s"__cnt$nLevels")) {
      (lvl, rest) => when(col("level") === lvl, col(s"__cnt$lvl")).otherwise(rest)
    }
    withLevel.select(
      (col(idCol) +: col("level") +: published :+ groupN.as("group_n")): _*)
  }
}
