package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel completion: per user, how deep into an ordered stage
  * sequence (view → click → purchase, …) their event history advances,
  * where stage i+1 must occur STRICTLY after stage i (by timestamp) and
  * within `windowUs` of the stage-1 time. Greedy earliest-first
  * semantics: each stage binds to the earliest qualifying event, which
  * is provably equivalent to the chained-min definition
  * (t_{i+1} = min{us : type = s_{i+1}, us > t_i, us <= t_1 + W}) the
  * oracle replays — the fold scans events in ascending-time order, so
  * "first qualifying" IS the minimum.
  *
  * Strict-> advancement makes tie order irrelevant: two events sharing
  * a microsecond can never both advance the funnel, so no tiebreak
  * column is needed and the result is engine-portable.
  *
  * Scale shape (10^9 users): events are filtered to the k stage types
  * BEFORE the one groupBy(user) shuffle, then each user's funnel folds
  * record-locally over their time-sorted stage events (integer
  * microseconds, O(1) fold state). Per-user memory is bounded by that
  * user's stage-event count — the usual funnel-analytics contract; a
  * bot user with millions of qualifying events is a data-quality
  * problem upstream (cap with a per-user limit filter if needed).
  */
object Funnel {

  /** One row per user having >= 1 stage-type event:
    * (userCol, n_stages, t_first_us, t_last_us) — stages completed,
    * stage-1 time, deepest-stage time. n_stages >= 1 iff a stage-1
    * event exists; a user with only later-stage events gets 0 with
    * null timestamps.
    *
    * `usCol` must be an integer microsecond (or any strictly ordered
    * integer) column; `windowUs = Long.MaxValue` disables the window
    * (the overflow-safe build-time branch — never computed as t1 + W).
    */
  def completion(events: DataFrame, userCol: String, typeCol: String,
      usCol: String, stages: Seq[String],
      windowUs: Long = Long.MaxValue): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be non-empty and distinct: $stages")
    val k = stages.size
    val stageArr = array(stages.map(lit): _*)
    val zero = struct(lit(0).as("idx"),
      lit(null).cast("long").as("t1"), lit(null).cast("long").as("tl"))
    def advance(st: Column, us: Column, typ: Column): Column = {
      val inWindow =
        if (windowUs == Long.MaxValue) lit(true)
        else st("idx") === 0 || us <= st("t1") + lit(windowUs)
      val ok = st("idx") < k &&
        typ === element_at(stageArr, st("idx") + 1) &&
        (st("idx") === 0 || us > st("tl")) && inWindow
      when(ok, struct((st("idx") + 1).as("idx"),
        when(st("idx") === 0, us).otherwise(st("t1")).as("t1"),
        us.as("tl")))
        .otherwise(st)
    }
    events
      .filter(col(typeCol).isin(stages.map(_.asInstanceOf[Any]): _*))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(
        col(usCol).cast("long").as("us"), col(typeCol).as("typ")))).as("__evs"))
      .withColumn("__st",
        aggregate(col("__evs"), zero,
          (st, e) => advance(st, e("us"), e("typ"))))
      .select(col(userCol),
        col("__st")("idx").as("n_stages"),
        col("__st")("t1").as("t_first_us"),
        col("__st")("tl").as("t_last_us"))
  }
}
