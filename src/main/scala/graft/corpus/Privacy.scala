package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Left-join per-prefix aggregate rows back onto `cur` with NULL-SAFE
    * key equality. groupBy already treats a NULL QI value as one real
    * group, so the join-back must too — a null-unsafe key would let a
    * NULL-QI row silently miss its own group's count and demote to the
    * catch-all level, diverging from any oracle that groups NULLs
    * (window PARTITION BY / USING both do).
    */
  private def joinBackNullSafe(cur: DataFrame, aggd: DataFrame,
      key: Seq[String]): DataFrame = {
    val renamed = key.foldLeft(aggd)((d, c) => d.withColumnRenamed(c, s"${c}__k"))
    val cond = key.map(c => col(c) <=> col(s"${c}__k")).reduce(_ && _)
    cur.join(renamed, cond, "left").drop(key.map(c => s"${c}__k"): _*)
  }

  /** (idCol, level, <qi columns — NULL where generalized away>,
    * group_n) for every input row; `level` in [0, qiCols.length], the
    * number of trailing QI columns suppressed to reach a group of
    * >= k rows. NULL QI values are first-class: they count and join
    * back as one real group (null-safe keys end to end); in the output,
    * `level` disambiguates a genuinely-NULL published value from one
    * generalized away (column i is suppressed iff i >= arity - level).
    *
    * Honesty note on the guarantee: per-row finest-level generalization
    * gives the k-MAP property — every published QI combination matches
    * >= k rows of the ORIGINAL population — not strict equivalence-class
    * k-anonymity, where the PUBLISHED rows sharing a combination must
    * themselves number >= k (that stronger form needs global recoding:
    * one level for the whole corpus, which over-generalizes every row
    * to the weakest group's level). k-map is the standard release
    * criterion when, as here, the adversary's reference is the
    * population the corpus was drawn from.
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
      cur = joinBackNullSafe(cur, cnts, key)
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

  /** l-diversity audit (Machanavajjhala et al. 2007) over the same QI
    * ladder as [[kAnonymize]]: one row per published equivalence class
    * (level + generalized QI prefix) with the class's population size
    * (`group_n`), rows actually published in it (`n_published`), the
    * number of DISTINCT sensitive values across the generalized group
    * (`n_sensitive` — population-side, matching the k-map posture), and
    * the verdict `l_ok = n_sensitive >= l`. k-anonymity alone permits a
    * homogeneity attack (a group of >= k rows all sharing one sensitive
    * value reveals it without re-identification); this is the audit
    * that catches it.
    *
    * Scale posture: one count+countDistinct groupBy per ladder level
    * (depth = QI arity) joined back by shuffle equi-join, then one
    * class-level groupBy — same never-a-coarse-window shape as
    * kAnonymize; exact distinct counts are per-level aggregates whose
    * result cardinality is the distinct-prefix count, not the row
    * count.
    */
  def lDiversity(df: DataFrame, idCol: String, qiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(k > 0 && l > 0, s"k and l must be positive, got k=$k l=$l")
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val nLevels = qiCols.length
    val base = df.select(
      (col(idCol) +: col(sensitiveCol).as("__sens") +: qiCols.map(col)): _*)
    var cur = base
    for (lvl <- 0 until nLevels) {
      val key = qiCols.dropRight(lvl)
      val aggd = base.groupBy(key.map(col): _*)
        .agg(count(lit(1)).as(s"__cnt$lvl"),
          countDistinct(col("__sens")).as(s"__div$lvl"))
      cur = joinBackNullSafe(cur, aggd, key)
    }
    val total = base.agg(count(lit(1)).as(s"__cnt$nLevels"),
      countDistinct(col("__sens")).as(s"__div$nLevels"))
    cur = cur.crossJoin(broadcast(total))
    val level = (0 until nLevels).foldRight(lit(nLevels)) { (lvl, rest) =>
      when(col(s"__cnt$lvl") >= k, lvl).otherwise(rest)
    }
    val withLevel = cur.withColumn("level", level.cast("int"))
    val published = qiCols.zipWithIndex.map { case (c, i) =>
      when(col("level") <= lit(nLevels - 1 - i), col(c))
        .otherwise(lit(null)).as(c)
    }
    val groupN = (0 until nLevels).foldRight(col(s"__cnt$nLevels")) {
      (lvl, rest) => when(col("level") === lvl, col(s"__cnt$lvl")).otherwise(rest)
    }
    val nSens = (0 until nLevels).foldRight(col(s"__div$nLevels")) {
      (lvl, rest) => when(col("level") === lvl, col(s"__div$lvl")).otherwise(rest)
    }
    withLevel
      .select((col("level") +: published :+ groupN.as("__gn") :+ nSens.as("__ns")): _*)
      .groupBy((col("level") +: qiCols.map(col)): _*)
      .agg(max(col("__gn")).as("group_n"),
        count(lit(1)).as("n_published"),
        max(col("__ns")).as("n_sensitive"))
      .withColumn("l_ok", col("n_sensitive") >= l)
  }

  /** ε-differentially-private noisy counts (Laplace mechanism,
    * sensitivity 1, Dwork et al. 2006) — the fourth rung of the privacy
    * ladder: k-anonymity/l-diversity/t-closeness bound what a published
    * ROW reveals; DP bounds what a published AGGREGATE reveals, with the
    * count query's classic calibration b = 1/ε.
    *
    * Noise is SEEDED: inverse-CDF Laplace draws from two independent
    * portable 60-bit hashes of (salt, group key) — magnitude from
    * f = (h_u mod 1e6)/1e6 ∈ [0,1) via X = (1/ε)·(−ln(1−f)), sign from
    * h_s parity — discretized to integer micro-units BEFORE the add, so
    * the release is order-immune 64-bit arithmetic and the DuckDB
    * oracle replays every released value bit-for-bit. Determinism also
    * means a rerun releases the SAME values (no silent ε-budget burn on
    * retries) — and it means the salt IS the secret: an adversary who
    * learns it can subtract the noise, so the salt must never ship with
    * the release (the standard trade-off of seeded-noise deployments).
    * Groups absent from the data are not released; if absence itself is
    * sensitive, pad the group domain upstream before calling this.
    *
    * Scale posture: ONE map-side-combinable groupBy; the noise is a
    * codegen'd expression over the aggregate's result rows (cardinality
    * = |groups|, never |rows|); zero extra shuffles, nothing driver-side.
    */
  def dpNoisyCounts(df: DataFrame, groupCols: Seq[String], eps: Double,
      salt: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(eps > 0, s"epsilon must be positive, got $eps")
    val counted = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    counted.select((groupCols.map(col) :+
      (col("cnt") * lit(1000000L) +
        dpNoiseMicro(groupCols, eps, salt)).as("noisy_cnt_micro")): _*)
  }

  /** Curator-side utility audit of [[dpNoisyCounts]]'s noise (NOT part
    * of the release — publishing the noise next to the noisy count
    * reconstructs the true count): per group, the signed micro-unit
    * noise, the Laplace scale b in micro-units, and whether the draw
    * landed within 3b (P ≈ 95% per group) — the readout a curator signs
    * off on before shipping the release.
    */
  def dpNoiseAudit(df: DataFrame, groupCols: Seq[String], eps: Double,
      salt: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(eps > 0, s"epsilon must be positive, got $eps")
    val bMicro = math.round(1e6 / eps)
    df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("cnt"))
      .select((groupCols.map(col) :+
        dpNoiseMicro(groupCols, eps, salt).as("noise_micro")): _*)
      .withColumn("b_micro", lit(bMicro))
      .withColumn("within_3b", abs(col("noise_micro")) <= lit(3L * bMicro))
  }

  /** Signed seeded Laplace draw in integer micro-units for the given
    * group key (see [[dpNoisyCounts]] for the construction).
    */
  private def dpNoiseMicro(groupCols: Seq[String], eps: Double,
      salt: String): Column = {
    // unit-separator-joined key: without a separator ("ab","c") and
    // ("a","bc") would collide and share their noise draw
    val key = concat_ws("\u001f", groupCols.map(c => col(c).cast("string")): _*)
    val hu = graft.PortableHash.salted60(key, s"$salt:u")
    val hs = graft.PortableHash.salted60(key, s"$salt:s")
    val f = (hu % lit(1000000L)).cast("double") / lit(1000000.0)
    val mag = floor(-log(lit(1.0) - f) * lit(1e6 / eps) + lit(0.5)).cast("long")
    when(hs % 2 === 0, mag).otherwise(-mag)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the privacy ladder: l-diversity counts distinct sensitive
    * values but a group can hold l distinct values in wildly skewed
    * proportions and still leak (skewness attack); t-closeness bounds
    * the total-variation distance between each published class's
    * sensitive-value distribution and the whole corpus's at
    * t = tNum/tDen.
    *
    * One row per published equivalence class (same k-map ladder as
    * [[kAnonymize]]):
    *   TVD = (1/2) * sum_s |c_s/n_class - g_s/n_glob|
    * carried as the EXACT integer fraction
    *   tvd_num / tvd_den = sum_s |c_s*n_glob - g_s*n_class| / (2*n_class*n_glob)
    * and verdict t_ok decided by cross-multiplication
    * (tvd_num * tDen <= tNum * tvd_den) — no float division anywhere,
    * so the oracle replays bit-for-bit. Products are computed in
    * DECIMAL(38,0) (at 10^12 rows n_class*n_glob overflows a long); the
    * emitted columns cast back to BIGINT, which under ANSI fails loudly
    * rather than wrapping if a deployment's magnitudes outgrow them.
    *
    * Scale posture: per-level (prefix, sens) groupBys (map-side
    * combinable, result cardinality = distinct prefix x sens), a
    * classes x global-sens-distribution expansion bounded by
    * |classes| * |distinct sens| (both aggregate-sized, never row
    * counts), and null-safe equi-joins throughout — same
    * never-a-coarse-window shape as the rest of the ladder.
    */
  def tCloseness(df: DataFrame, idCol: String, qiCols: Seq[String],
      sensitiveCol: String, k: Int, tNum: Long, tDen: Long): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(tNum >= 0 && tDen > 0, s"t must be a fraction >= 0, got $tNum/$tDen")
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val nLevels = qiCols.length
    val base = df.select(
      (col(idCol) +: col(sensitiveCol).as("__sens") +: qiCols.map(col)): _*)
    // level ladder (population counts per prefix), as in kAnonymize
    var cur = base
    for (lvl <- 0 until nLevels) {
      val key = qiCols.dropRight(lvl)
      cur = joinBackNullSafe(cur,
        base.groupBy(key.map(col): _*).agg(count(lit(1)).as(s"__cnt$lvl")),
        key)
    }
    cur = cur.crossJoin(
      broadcast(base.agg(count(lit(1)).as(s"__cnt$nLevels"))))
    val level = (0 until nLevels).foldRight(lit(nLevels)) { (lvl, rest) =>
      when(col(s"__cnt$lvl") >= k, lvl).otherwise(rest)
    }
    val withLevel = cur.withColumn("level", level.cast("int"))
    val published = qiCols.zipWithIndex.map { case (c, i) =>
      when(col("level") <= lit(nLevels - 1 - i), col(c))
        .otherwise(lit(null)).as(c)
    }
    val groupN = (0 until nLevels).foldRight(col(s"__cnt$nLevels")) {
      (lvl, rest) => when(col("level") === lvl, col(s"__cnt$lvl")).otherwise(rest)
    }
    // published classes with their population size
    val classes = withLevel
      .select((col("level") +: published :+ groupN.as("__gn")): _*)
      .groupBy((col("level") +: qiCols.map(col)): _*)
      .agg(max(col("__gn")).as("__nc"))
    // per-level (prefix, sens) population counts, prefix NULL-padded to
    // the full QI shape so one frame serves every level
    val qiTypes = qiCols.map(c => base.schema(c).dataType)
    val classSens = (0 to nLevels).map { lvl =>
      val key = qiCols.dropRight(lvl)
      base.groupBy((key.map(col) :+ col("__sens")): _*)
        .agg(count(lit(1)).as("__cs"))
        .select((lit(lvl).cast("int").as("__l2") +:
          qiCols.zip(qiTypes).map { case (c, dt) =>
            (if (key.contains(c)) col(c) else lit(null).cast(dt)).as(s"${c}__2")
          }) :+ col("__sens").as("__s2") :+ col("__cs"): _*)
    }.reduce(_ unionByName _)
    // global sensitive-value distribution
    val gs = base.groupBy(col("__sens")).agg(count(lit(1)).as("__cg"))
    val ng = base.agg(count(lit(1)).as("__ng"))
    val joinCond = (col("level") === col("__l2")) &&
      (col("__sens") === col("__s2")) &&
      qiCols.map(c => col(c) <=> col(s"${c}__2")).reduce(_ && _)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    classes
      .crossJoin(gs)
      .join(classSens, joinCond, "left")
      .crossJoin(broadcast(ng))
      .withColumn("__c", coalesce(col("__cs"), lit(0L)))
      .groupBy((col("level") +: qiCols.map(col) :+ col("__nc") :+ col("__ng")): _*)
      .agg(sum(abs(dec(col("__c")) * dec(col("__ng")) -
        dec(col("__cg")) * dec(col("__nc")))).as("__num"))
      .select((col("level") +: qiCols.map(col) :+
        col("__nc").cast("long").as("group_n") :+
        col("__num").cast("long").as("tvd_num") :+
        (dec(lit(2)) * dec(col("__nc")) * dec(col("__ng"))).cast("long")
          .as("tvd_den") :+
        (col("__num") * dec(lit(tDen)) <=
          dec(lit(tNum)) * dec(lit(2)) * dec(col("__nc")) * dec(col("__ng")))
          .as("t_ok")): _*)
  }
}
