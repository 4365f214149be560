package graft.operators

import graft.functions.GraftFunctions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dictionary-accelerated Jaro-Winkler fuzzy self-match — the entity-
  * resolution primitive for "which values of this key column are
  * near-identical spellings of each other" (vendor names, product
  * titles, author strings).
  *
  * Scale shape: fuzzy similarity is a property of the VALUE DOMAIN,
  * not of rows — so the first move is a distinct+count over the key
  * column (one combinable shuffle), collapsing 10^12 rows to the
  * dictionary of distinct spellings (typically 10^2..10^6). Pair
  * scoring then runs over the dictionary only: a broadcast nested-loop
  * self-join under `name_a < name_b` with the native codegen'd
  * [[graft.functions.JaroWinklerExpr]] in the join filter. The output
  * is the name-level match table (name_a, name_b, jw, n_a, n_b) —
  * the artifact a canonicalization MERGE consumes — NEVER the row-pair
  * explosion (two hot spellings with 10^6 rows each would fan out
  * 10^12 row pairs for one dictionary edge). For dictionaries too big
  * to broadcast, block first (sorted-neighborhood / first-token) and
  * feed blocks through the same scorer.
  */
object FuzzyJoin {

  /** (name_a, name_b, jw, n_a, n_b) for every unordered pair of
    * distinct values of `nameCol` with Jaro-Winkler >= threshold;
    * n_* are the row counts backing each spelling.
    */
  def jaroWinklerPairs(spark: SparkSession, df: DataFrame,
      nameCol: String, threshold: Double): DataFrame = {
    val dict = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("cnt"))
    val a = dict.select(col("name").as("name_a"), col("cnt").as("n_a"))
    val b = dict.select(col("name").as("name_b"), col("cnt").as("n_b"))
    a.join(broadcast(b), col("name_a") < col("name_b"))
      .withColumn("jw",
        GraftFunctions.jaroWinkler(spark, col("name_a"), col("name_b")))
      .filter(col("jw") >= threshold)
      .select(col("name_a"), col("name_b"), col("jw"), col("n_a"), col("n_b"))
  }
}
