package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.PortableHash

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * score every raw document by how target-like it looks under hashed
  * unigram bag-of-words models, then keep the top-N. The standard
  * "make 100 TB of crawl look like the curated target corpus" selector:
  * weight(d) = log p_target(d) - log p_raw(d) under two multinomials
  * over `buckets` hashed token features, add-one smoothed.
  *
  * Float discipline (engine-portable by construction): every ln is
  * discretized to integer MICRO-NATS (floor(ln(x)*1e6 + 0.5)) the
  * moment it is taken, so a document's weight is an exact BIGINT dot
  * product — immune to summation order, reproducible bit-for-bit in
  * any engine with ln. Since log p(d) = sum_b c_b*ln(t_b+1)
  * - n*ln(T+B) (and same for raw), the weight decomposes into a
  * per-bucket integer diff plus a per-token integer constant.
  *
  * Scale shape (10^12 docs): one token explode feeding ONE shuffle
  * (groupBy (doc, target-flag, bucket) with map-side combine, key
  * space bounded by docs x their distinct buckets); the model is a
  * `buckets`-row frame (totals via one unbounded window over it) that
  * BROADCASTS back; scoring is a broadcast join + one groupBy(doc)
  * reusing nothing wider than the per-doc bucket counts. Selection is
  * a distributed TakeOrdered (orderBy + limit), never a single-node
  * sort.
  */
object Dsir {

  val DefaultBuckets = 1024

  /** floor(ln(x)*1e6 + 0.5) as BIGINT — the shared micro-nat grid. */
  def mnLn(x: Column): Column =
    floor(log(x.cast("double")) * lit(1e6) + lit(0.5)).cast("long")

  /** (idCol, n_tok, weight_mn): importance weight in micro-nats for
    * every document. `isTarget` marks the rows whose token distribution
    * defines the target; they are scored too (a target doc should rank
    * high — a useful sanity signal).
    */
  def score(docs: DataFrame, idCol: String, textCol: String, isTarget: Column,
      buckets: Int = DefaultBuckets, salt: String = "dsir"): DataFrame = {
    require(buckets > 0, s"bad buckets=$buckets")
    val bkt = docs
      .select(col(idCol), isTarget.as("__tgt"),
        explode(split(col(textCol), " ", -1)).as("__t"))
      .filter(col("__t") =!= "")
      .select(col(idCol), col("__tgt"),
        (PortableHash.md5Hash60(concat(lit(salt + ":"), col("__t")))
          % buckets.toLong).as("__b"))
    // one shuffle: per-(doc, bucket) counts; __tgt rides along (it is
    // functionally dependent on the doc id) so the model derives from
    // this compact frame without a second pass over the tokens
    val perDoc = bkt.groupBy(col(idCol), col("__tgt"), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val perBucket = perDoc.groupBy(col("__b"))
      .agg(sum(col("__c")).as("__r"),
        sum(when(col("__tgt"), col("__c")).otherwise(0L)).as("__tc"))
    // corpus totals as a broadcast 1-row cross join, not an unbounded
    // window: same integer sums, but the plan never funnels the model
    // frame through a single WindowExec partition
    val totals = perBucket.agg(
      sum(col("__r")).as("__rtot"), sum(col("__tc")).as("__ttot"))
    val model = perBucket.crossJoin(broadcast(totals))
      .select(col("__b"),
        (mnLn(col("__tc") + 1) - mnLn(col("__r") + 1)).as("__diff"),
        (mnLn(col("__rtot") + buckets) - mnLn(col("__ttot") + buckets)).as("__const"))
    perDoc.join(broadcast(model), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).cast("long").as("n_tok"),
        (sum(col("__c") * col("__diff")) +
          sum(col("__c")) * max(col("__const"))).cast("long").as("weight_mn"))
  }

  /** The top-`n` most target-like documents by (weight desc, id asc) —
    * a distributed TakeOrdered, no global single-partition sort.
    */
  def selectTop(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, n: Int, buckets: Int = DefaultBuckets,
      salt: String = "dsir"): DataFrame =
    score(docs, idCol, textCol, isTarget, buckets, salt)
      .orderBy(col("weight_mn").desc, col(idCol).asc)
      .limit(n)
}
