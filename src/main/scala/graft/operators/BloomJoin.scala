package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter runtime pre-filter for equi-joins: build
  * an m-bit filter over the build side's keys (k salted portable
  * hashes), ship the bit words to the probe side as a literal, and
  * drop probe rows that cannot match BEFORE the join shuffle. The join
  * output is identical to the plain join (false positives survive the
  * pre-filter and die in the exact join); the filter only cuts shuffle
  * volume — the runtime-filter pattern that matters when the probe
  * side is 100 TB and the build side is 10^6 keys.
  *
  * The m/64-word bit array DOES reach the driver — bounded by mBits
  * (a few KB), the same documented pattern as IVF's k x dim codebook
  * pull, not a data-volume collect.
  *
  * Portability: bit positions come from the 60-bit md5 portable hash,
  * so a relational oracle can replay membership exactly — "position
  * set by ANY build key" is a plain DISTINCT + IN, which is how
  * q_bloom_prune_audit verifies the false-positive set cross-engine.
  */
object BloomJoin {

  private[graft] def positions(key: Column, mBits: Int, k: Int,
      salt: String): Seq[Column] =
    (0 until k).map(i =>
      pmod(graft.PortableHash.salted60(key, s"$salt$i:"), lit(mBits.toLong)))

  /** Aggregate the filter's 64-bit words distributedly (explode k
    * positions, bit_or per word) and return the dense word array.
    */
  def bloomWords(build: DataFrame, keyCol: String, mBits: Int, k: Int,
      salt: String): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64: $mBits")
    require(k >= 1, s"k must be positive: $k")
    val pos = positions(col(keyCol), mBits, k, salt)
    // NULL build keys can never equi-join, so they contribute no bits
    // (without the filter their NULL positions would NPE the word fill)
    val rows = build
      .filter(col(keyCol).isNotNull)
      .select(explode(array(pos: _*)).as("pos"))
      .select((col("pos") / 64).cast("long").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("pos"), lit(64)).cast("int"))
          .as("mask"))
      .groupBy(col("w"))
      .agg(call_function("bit_or", col("mask")).as("bits"))
      .collect()
    val words = new Array[Long](mBits / 64)
    rows.foreach(r => words(r.getAs[Long]("w").toInt) = r.getAs[Long]("bits"))
    words
  }

  /** Membership test as a codegen-friendly Column over the literal
    * word array: every one of the key's k bit positions must be set.
    */
  def mightContain(key: Column, words: Array[Long], mBits: Int, k: Int,
      salt: String): Column =
    positions(key, mBits, k, salt).map { p =>
      val word = element_at(typedLit(words.toSeq), (p / 64).cast("int") + 1)
      val mask = call_function("shiftleft", lit(1L), pmod(p, lit(64)).cast("int"))
      word.bitwiseAND(mask) =!= 0
    }.reduce(_ && _)

  /** The Bloom-pruned equi-join: output-identical to
    * probe JOIN build ON probeKey = buildKey, with non-candidate probe
    * rows dropped before the shuffle.
    */
  def filteredJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, mBits: Int = 1 << 12, k: Int = 3,
      salt: String = "bloom"): DataFrame = {
    val words = bloomWords(build, buildKey, mBits, k, salt)
    probe.filter(mightContain(col(probeKey), words, mBits, k, salt))
      .join(build, col(probeKey) === col(buildKey))
  }

  /** The filter's false-positive audit: DISTINCT probe keys that pass
    * the Bloom test but have no build match — the rows the pre-filter
    * shuffles in vain. Oracled relationally (the no-silent-costs
    * companion, like the LSH/substring cap audits).
    */
  def prunedNonMatches(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, mBits: Int, k: Int, salt: String): DataFrame = {
    val words = bloomWords(build, buildKey, mBits, k, salt)
    probe.filter(mightContain(col(probeKey), words, mBits, k, salt))
      .select(col(probeKey))
      .join(build, col(probeKey) === col(buildKey), "left_anti")
      .distinct()
  }
}
