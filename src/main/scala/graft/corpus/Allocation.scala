package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.PortableHash

/** Exact-size mixture selection — build a training mix of EXACTLY
  * `total` documents with per-group quotas from largest-remainder
  * (Hamilton) apportionment over the groups' corpus shares. Rate-based
  * sampling ([[Sampling]]) binomially wobbles around its target; a
  * budgeted run ("train on exactly 50B docs, sources in corpus
  * proportion") needs the apportionment to be exact and the selection
  * deterministic.
  *
  * Apportionment: quota_g = floor(total * n_g / N); the remaining
  * total - sum(quota) seats go to the largest fractional remainders
  * (ties by group name ascending). Exact by construction; the only
  * float is total*n_g/N itself, one IEEE multiply+divide both engines
  * share. With total <= N, quota_g + 1 <= n_g always holds, so quotas
  * are satisfiable.
  *
  * Selection: within each group the quota lowest salted-hash docs (the
  * domainCap discipline) — deterministic, order-free, and nested: a
  * bigger `total` selects a superset per group wherever its quota
  * grows.
  *
  * Scale posture: the group count table is tiny (GROUPs, not docs) —
  * apportionment runs in a broadcast-size frame with one window over
  * |groups| rows; the selection is one window per group partition
  * whose reducer input Spark bounds via rank pushdown only for
  * constant limits, so the per-group limit join keeps the filter above
  * the window — per-group partitions are the group sizes themselves,
  * the same bound domainCap already documents.
  */
object Allocation {

  /** (all input columns..., sel_rank) for exactly `total` selected
    * rows, largest-remainder quotas per `groupCol`, lowest
    * salted-hash-first within a group.
    */
  def proportionalSelect(df: DataFrame, groupCol: String, idCol: String,
      total: Long, salt: String = "alloc"): DataFrame = {
    require(total >= 0, s"bad total=$total")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    // grand total as an unbounded window over the |groups|-row count
    // frame — join-free (a cross join against an aggregate of the same
    // lineage trips Spark's ambiguous-self-join detection). NB the name
    // must not be "__N": resolution is case-INsensitive by default and
    // withColumn would silently replace "__n".
    val withN = counts.withColumn("__grand",
        sum(col("__n")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__exact",
        lit(total.toDouble) * col("__n").cast("double") / col("__grand").cast("double"))
      .withColumn("__base", floor(col("__exact")).cast("long"))
      .withColumn("__frac", col("__exact") - col("__base"))
    val seatW = Window.orderBy(col("__frac").desc, col(groupCol).asc)
    val quotas = withN
      .withColumn("__leftover",
        lit(total) - sum(col("__base")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__seat", row_number().over(seatW))
      .select(col(groupCol),
        (col("__base") + when(col("__seat") <= col("__leftover"), 1L)
          .otherwise(0L)).as("__quota"))
    val ranked = df.withColumn("__h",
        PortableHash.md5Hash60(concat(lit(salt), lit(":"),
          col(idCol).cast("string"))))
      .withColumn("sel_rank", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__h"), col(idCol))))
      .drop("__h")
    ranked.join(broadcast(quotas), Seq(groupCol))
      .filter(col("sel_rank") <= col("__quota"))
      .drop("__quota")
  }
}
