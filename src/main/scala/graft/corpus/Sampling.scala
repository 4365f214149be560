package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Two designs with different scale postures:
  *
  *  - hashSample: keep a row iff a portable md5-derived hash of its id
  *    falls under the rate threshold. Shuffle-free (pure filter inside
  *    the scan's codegen stage), reproducible across engines and runs,
  *    and composable (a 1% sample of a 10% sample is the 0.1% sample of
  *    neither — each uses an independent salt). The per-stratum rate is
  *    only approximate (binomial), which is what you want at 10^9 rows.
  *
  *  - stratifiedExact: exactly ceil(frac * |stratum|) rows per stratum,
  *    chosen by the same portable hash order. Needs one shuffle on the
  *    stratum key and a within-stratum sort (window row_number) — the
  *    price of exactness; use for bounded-cardinality strata (languages,
  *    sources), not for high-cardinality keys.
  *
  * Portable hash: first 15 hex chars of md5(salt || id) as a 60-bit
  * integer (same construction as Dedup.minhashBase), so a DuckDB oracle
  * replays the exact sample.
  */
object Sampling {

  val HashMod: Long = 1000000L

  /** 60-bit md5-derived hash of the id, reduced to [0, HashMod). */
  def portableHash(id: Column, salt: String): Column =
    graft.PortableHash.salted60(id, salt) % HashMod

  /** Shuffle-free deterministic sample: rate in [0, 1]. */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
      salt: String = "graft"): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(portableHash(col(idCol), salt) < (rate * HashMod).toLong)
  }

  /** Mixture sample: a DIFFERENT deterministic rate per stratum — the
    * domain-mixing knob of a training-data pipeline (e.g. upweight
    * code, downweight boilerplate web). Same shuffle-free hash filter
    * as hashSample, with the per-stratum threshold folded into the scan
    * predicate; strata absent from `rates` default to `defaultRate`.
    * Nested like hashSample: lowering one stratum's rate yields a
    * subset of the higher-rate sample.
    */
  def mixtureSample(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "graft"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      s"rates must be in [0,1]: $rates / $defaultRate")
    val threshold = rates.foldLeft(lit((defaultRate * HashMod).toLong)) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit((rate * HashMod).toLong)).otherwise(acc)
    }
    df.filter(portableHash(col(idCol), salt) < threshold)
  }

  /** Exact stratified sample: ceil(frac * |stratum|) rows per stratum,
    * lowest portable-hash rows first (id breaks hash ties).
    */
  def stratifiedExact(df: DataFrame, stratumCol: String, idCol: String,
      frac: Double, salt: String = "graft"): DataFrame = {
    require(frac >= 0 && frac <= 1, s"frac must be in [0,1], got $frac")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(portableHash(col(idCol), salt), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(stratumCol))))
      .filter(col("__rn") <= ceil(lit(frac) * col("__n")))
      .drop("__rn", "__n")
  }

  /** Deterministic multi-way split: labels each row train/val/test/...
    * by disjoint hash ranges — the artifact step that fixes evaluation
    * membership once and forever (a doc's split never changes when the
    * corpus grows, because it depends only on its own id + salt).
    * `weights` need not sum to 1 (they are normalized); the label
    * column holds `labels(i)` where the id's hash falls in bucket i.
    * Shuffle-free: one codegen'd CASE over the scan.
    */
  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006): each row gets key = u^(1/w) with u = (h+1)/2^60
    * from the salted portable hash and w its positive weight; the k
    * largest keys per group are a weight-proportional sample. Fully
    * deterministic given (id, salt) — reruns and engines agree. One
    * window: Spark's rank-limit pushdown (WindowGroupLimit, 3.5+) puts
    * a partial per-group top-k on the map side of the exchange, so a
    * hot group's reducer input is bounded by k x map-tasks — the
    * hand-rolled salted two-level formulation this replaces only added
    * a second full exchange (see domainCap's scaladoc). Output
    * (group, id, weight, key, rank), rank 1..k by (key desc, id asc).
    */
  def weightedSample(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int, salt: String): DataFrame = {
    require(k >= 1, s"k must be positive: k=$k")
    val keyed = df
      .select(col(groupCol).as("grp"), col(idCol).as("id"),
        col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0)
      // full 60-bit hash, NOT the mod-1e6 portableHash reduction: u
      // must be fine-grained so distinct ids virtually never tie
      .withColumn("key",
        pow((graft.PortableHash.salted60(col("id"), salt).cast("double") + lit(1.0)) /
          lit(graft.operators.Kmv.HashSpace),
          lit(1.0) / col("w")))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("key").desc, col("id").asc)
    keyed
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("grp").as(groupCol), col("id").as(idCol),
        col("w").as(weightCol), col("key"), col("rank").cast("bigint").as("rank"))
  }

  /** Per-group contribution cap: keep at most `cap` rows per group, the
    * `cap` lowest salted-hash rows (id breaks ties) — the host-cap
    * curation step that stops Zipfian head domains from dominating a
    * training mix (without it the biggest crawl hosts contribute
    * millions of near-identical pages). Deterministic: membership
    * depends only on (id, salt) ranks within the group, so reruns and
    * engines agree.
    *
    * Skew posture: ONE window, deliberately. Spark's WindowGroupLimit
    * rewrite (rank-limit pushdown, 3.5+) inserts a partial per-group
    * limit on the MAP side of the exchange, so each upstream task
    * forwards at most `cap` rows per group and a hot group's reducer
    * input is bounded by cap x map-tasks — independent of group size.
    * A hand-rolled salted two-level formulation was measured to cost a
    * second full exchange + sort of the entire input here for a
    * tighter but unneeded bound (weightedSample and
    * CorpusStats.topShinglesPerGroup shed the same pattern).
    */
  def domainCap(df: DataFrame, groupCol: String, idCol: String, cap: Int,
      salt: String = "graft"): DataFrame = {
    require(cap >= 1, s"cap must be positive: $cap")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__hv").asc, col(idCol).asc)
    df.withColumn("__hv", portableHash(col(idCol), salt))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__hv", "__rn")
  }

  /** Deterministic fractional-epoch UPSAMPLING — the other half of the
    * data-mixing knob. mixtureSample can only downweight (rate <= 1);
    * published LLM data recipes also repeat high-value domains (e.g.
    * wiki x3.2 epochs in GPT-3's mix). Each row is emitted
    * floor(epochs) times plus one extra copy iff its salted portable
    * hash falls under frac(epochs) x HashMod, so a stratum with
    * epochs=2.3 contributes exactly ~2.3x its rows, each copy tagged
    * `copy_idx` (0-based) so downstream shuffles can co-locate or
    * spread copies explicitly. epochs < 1 degrades gracefully to
    * mixtureSample semantics (0 whole copies + fractional keep).
    *
    * Scale posture: record-local — the epoch lookup folds into a CASE
    * in the scan stage and the repeat is a per-row explode of a
    * sequence bounded by max(epochs)+1; zero shuffles, fan-out bounded
    * and known in advance. Deterministic across runs/engines: the
    * extra-copy decision replays from md5 like every sampler here.
    */
  def epochUpsample(df: DataFrame, stratumCol: String, idCol: String,
      epochs: Map[String, Double], defaultEpochs: Double = 1.0,
      salt: String = "graftep"): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0 && e.isFinite),
      s"epochs must be finite and >= 0: $epochs / $defaultEpochs")
    val ep = epochs.foldLeft(lit(defaultEpochs)) { case (acc, (s0, v)) =>
      when(col(stratumCol) === s0, lit(v)).otherwise(acc)
    }
    // floor() on both factors keeps the threshold arithmetic integer-
    // exact in the oracle replay (CAST alone rounds half-even in DuckDB)
    val whole = floor(ep).cast("long")
    val fracThreshold = floor((ep - floor(ep)) * HashMod).cast("long")
    val copies = whole +
      (portableHash(col(idCol), salt) < fracThreshold).cast("long")
    df.withColumn("__copies", copies)
      .filter(col("__copies") >= 1)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  def split(df: DataFrame, idCol: String, labels: Seq[String],
      weights: Seq[Double], salt: String = "split",
      labelCol: String = "split"): DataFrame = {
    require(labels.nonEmpty && labels.length == weights.length,
      s"labels/weights must be same non-zero length: ${labels.length}/${weights.length}")
    require(weights.forall(_ >= 0) && weights.sum > 0,
      s"weights must be non-negative with positive sum: $weights")
    val total = weights.sum
    // integer cut points in [0, HashMod] — identical arithmetic on the
    // oracle side, so boundaries cannot drift between engines
    val cuts = weights.scanLeft(0.0)(_ + _)
      .map(w => (w / total * HashMod).toLong)
    val h = portableHash(col(idCol), salt)
    val label = labels.zipWithIndex.tail.foldLeft(lit(labels.head)) {
      case (acc, (l, i)) => when(h >= cuts(i), lit(l)).otherwise(acc)
    }
    df.withColumn(labelCol, label)
  }
}
