package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget-aware corpus selection: keep the highest-scoring
  * documents whose cumulative token count fits a total training budget
  * — the "which N billion tokens do we actually train on" step that
  * follows scoring and precedes chunking/packing.
  *
  * Selection rule (deterministic, the greedy prefix pipelines actually
  * use — budget-knapsack is NP and irrelevant at 10^9 docs): order by
  * (score DESC, id ASC as tiebreak), keep every doc whose inclusive
  * running token total stays <= budget. The first doc that overflows is
  * dropped along with everything after it; no back-fill of smaller docs
  * (back-fill would make the output depend on global knapsack search
  * rather than a prefix, killing both determinism-under-append and the
  * SQL oracle).
  *
  * Scale posture: one global sort (Spark range-partitions by the sort
  * key — the only correct distributed shape for a total order) plus a
  * single-direction running sum. The window's ORDER BY over the whole
  * frame means the cumsum itself runs in one task at the margin; at
  * 10^12 docs replace the exact prefix with a two-phase cut: aggregate
  * per-partition token totals (tiny), compute the cut partition + offset
  * on the driver, and filter — same output, no single-task window. The
  * exact window form here is the reference semantics the two-phase cut
  * must reproduce.
  */
object BudgetSelect {

  /** Rows of `docs` selected under `budget` total tokens, with the
    * running total (`cum_tokens`) attached.
    */
  def selectUnderBudget(docs: DataFrame, idCol: String, tokenCol: String,
      scoreCol: String, budget: Long): DataFrame = {
    val order = Window
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum_tokens", sum(col(tokenCol).cast("long")).over(order))
      .filter(col("cum_tokens") <= budget)
  }
}
