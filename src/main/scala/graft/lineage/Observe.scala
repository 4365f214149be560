package graft.lineage

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Single-pass pipeline telemetry via `Dataset.observe` — the metrics
  * a 100 TB job must NOT pay a second scan for: row counts, byte
  * totals, null tallies ride along the write as accumulator-backed
  * observed aggregates and are read on the driver after the action
  * completes. This is the Spark-native replacement for the
  * "write, then re-read to count" anti-pattern; Lineage's metrics
  * table rows are fed from exactly this kind of pass.
  */
object Observe {

  /** Writes `df` as parquet and returns the observed metrics of the
    * SAME pass (no second scan). Metric expressions must be
    * aggregates (count/sum/min/max/...).
    */
  def writeWithMetrics(
      df: DataFrame,
      path: String,
      metrics: (String, Column)*): Map[String, Any] = {
    require(metrics.nonEmpty, "at least one observed metric required")
    val obs = Observation()
    val named = metrics.map { case (n, c) => c.as(n) }
    df.observe(obs, named.head, named.tail: _*)
      .write.mode("overwrite").parquet(path)
    obs.get
  }
}
