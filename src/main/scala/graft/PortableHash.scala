package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE portable 60-bit hash base: first 15 hex chars of md5 as a
  * non-negative integer. Every engine with md5 reproduces it exactly,
  * which is what makes the DuckDB oracles replay sampling, MinHash,
  * packing, and the KMV sketch bit-for-bit. One definition — the
  * oracle-side SQL (`CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`)
  * mirrors exactly one construction.
  */
object PortableHash {

  /** 60-bit hash of a column's raw value — since round 6 a native
    * Catalyst expression (graft.functions.Md5Hash60Expr): digest ->
    * long directly, no 32-char hex materialization + conv() re-parse
    * per row. Value-identical to the SQL form below (spec-pinned); the
    * cast normalizes binary inputs byte-identically (string<->binary
    * casts are byte reinterpretations).
    */
  def md5Hash60(value: Column): Column =
    org.apache.spark.sql.graft.PlanBridge.column(
      graft.functions.Md5Hash60Expr(
        org.apache.spark.sql.graft.PlanBridge.expression(value.cast("string"))))

  /** The pre-round-6 SQL formulation — kept as the spec cross-check
    * anchor for the native expression (and the shape the DuckDB
    * oracles replay).
    */
  def md5Hash60Sql(value: Column): Column =
    conv(substring(md5(value), 1, 15), 16, 10).cast("long")

  /** Salted variant over the value's string form. */
  def salted60(value: Column, salt: String): Column =
    md5Hash60(concat(lit(salt), value.cast("string")))
}
