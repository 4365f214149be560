package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Real byte-pair encoding: merges LEARNED from the corpus (not the
  * regex estimate `TextOps.bpeTokenEstimate`, which stays as the cheap
  * scan-time proxy), applied at JVM-loop speed inside whole-stage
  * codegen via [[graft.functions.BpeCountExpr]].
  *
  * Training is the classic Sennrich et al. (ACL 2016) procedure:
  * start from codepoints, repeatedly merge the most frequent adjacent
  * symbol pair (frequency weighted by word count), ties broken
  * lexicographically — fully deterministic, so the learned table is a
  * pure function of the corpus and the DuckDB oracle can replay its
  * application bit-for-bit from the dumped merge rows.
  *
  * Scale posture: the only distributed stage is the word-frequency
  * groupBy (one shuffle, map-side combine); the driver pulls at most
  * `maxWords` (count, word) rows — a model-sized, explicitly bounded
  * collect, the same pattern as IVF's k x dim codebook — and runs the
  * merge loop locally over that vocabulary sample (how production BPE
  * vocabs are trained: on a bounded sample, then applied corpus-wide).
  * Application back on the cluster is embarrassingly parallel.
  */
object Bpe {

  /** Train a codec on the corpus: top `maxWords` whitespace words by
    * (count desc, word asc) — deterministic at any parallelism — then
    * up to `numMerges` merges, stopping early when no adjacent pair
    * reaches `minPairFreq` weighted occurrences.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int = 200,
      minPairFreq: Long = 2, maxWords: Int = 65536): BpeCodec = {
    val counts = docs
      .select(explode(split(col(textCol), " ", -1)).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainFromCounts(counts, numMerges, minPairFreq)
  }

  /** The driver-side merge loop over a (word, count) vocabulary.
    *
    * Pair counts are maintained INCREMENTALLY: built once up front,
    * then each merge only touches words containing the merged pair
    * (their old adjacent-pair multiset is subtracted and the
    * re-segmented one added back). A per-round full rebuild would cost
    * O(numMerges x vocab x word-length) boxed map updates — minutes of
    * driver latency at the 65536-word cap; the incremental form is
    * O(corpus + affected) and arithmetically identical (the map always
    * equals the exact pair total over the current segmentations).
    */
  def trainFromCounts(wordCounts: Seq[(String, Long)], numMerges: Int,
      minPairFreq: Long): BpeCodec = {
    val segs: Array[(Array[String], Long)] =
      wordCounts.map { case (w, c) => (BpeCodec.codepoints(w), c) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
    def tally(seg: Array[String], delta: Long): Unit = {
      var i = 0
      while (i < seg.length - 1) {
        pc.updateWith((seg(i), seg(i + 1))) { v =>
          val nv = v.getOrElse(0L) + delta
          if (nv == 0L) None else Some(nv)
        }
        i += 1
      }
    }
    def containsPair(seg: Array[String], p: (String, String)): Boolean = {
      var i = 0
      while (i < seg.length - 1) {
        if (seg(i) == p._1 && seg(i + 1) == p._2) return true
        i += 1
      }
      false
    }
    segs.foreach { case (seg, cnt) => tally(seg, cnt) }
    var go = true
    while (go && merges.length < numMerges) {
      if (pc.isEmpty) go = false
      else {
        // most frequent pair, ties by lexicographic (left, right) in
        // UTF-8 BYTE order — the ordering Spark's orderBy(word) (vocab
        // cut) and DuckDB's ORDER BY both use. JVM String compareTo is
        // UTF-16 code-unit order, which disagrees for supplementary
        // characters and would silently diverge the engine's merge
        // table from the oracle's on a non-BMP rank tie
        val (bestPair, bestCnt) = pc.minBy { case ((l, r), c) => (-c, l, r) }(
          Ordering.Tuple3(Ordering.Long, utf8ByteOrder, utf8ByteOrder))
        if (bestCnt < minPairFreq) go = false
        else {
          merges += bestPair
          var i = 0
          while (i < segs.length) {
            val (seg, cnt) = segs(i)
            if (containsPair(seg, bestPair)) {
              tally(seg, -cnt)
              val merged = applyMergeAll(seg, bestPair)
              tally(merged, cnt)
              segs(i) = (merged, cnt)
            }
            i += 1
          }
        }
      }
    }
    new BpeCodec(merges.toArray)
  }

  /** Unsigned lexicographic comparison of UTF-8 encodings — equals
    * codepoint order, and matches Spark's UTF8String binary ordering
    * and DuckDB's VARCHAR ordering (JVM compareTo does not, for
    * supplementary characters).
    */
  private val utf8ByteOrder: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    var res = 0
    val n = math.min(x.length, y.length)
    while (res == 0 && i < n) {
      res = (x(i) & 0xff) - (y(i) & 0xff)
      i += 1
    }
    if (res != 0) res else x.length - y.length
  }

  /** All occurrences of `p`, left-to-right, non-overlapping. */
  private def applyMergeAll(seg: Array[String], p: (String, String)): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](seg.length)
    var i = 0
    while (i < seg.length) {
      if (i < seg.length - 1 && seg(i) == p._1 && seg(i + 1) == p._2) {
        out += seg(i) + seg(i + 1); i += 2
      } else { out += seg(i); i += 1 }
    }
    out.toArray
  }
}

/** A trained, ordered merge table plus its application loop. Ships to
  * executors inside the codegen'd expression (addReferenceObj) or as a
  * packed array<string> literal; both rebuild the transient rank index
  * and word cache lazily per JVM.
  */
final class BpeCodec(val merges: Array[(String, String)]) extends Serializable {

  def numMerges: Int = merges.length

  /** Single-array literal form ("left right" per rank, in order)
    * for riding as an expression child.
    */
  def packed: Array[String] = merges.map { case (l, r) => l + " " + r }

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(merges(i)._1 + " " + merges(i)._2, Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** Bounded word -> token-count cache: corpora are Zipf-distributed,
    * so a small cache absorbs almost all lookups; races are harmless
    * (the value is deterministic) and the cap stops adversarial vocab
    * from growing executor memory.
    */
  @transient private lazy val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val MaxCache = 1 << 16

  /** Segment one word: start from codepoints, repeatedly merge the
    * LEFTMOST occurrence of the lowest-rank applicable pair until none
    * applies. One-occurrence-at-a-time is output-identical to the
    * usual all-occurrences pass — a merge can only create pairs
    * containing its new symbol, which by construction carry HIGHER
    * ranks — and is what the DuckDB oracle replays row-for-row.
    */
  def segmentWord(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty[String]
    var seg = BpeCodec.codepoints(word)
    var done = false
    while (!done && seg.length > 1) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < seg.length - 1) {
        val r = ranks.get(seg(i) + " " + seg(i + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestPos = i
        }
        i += 1
      }
      if (bestPos < 0) done = true
      else {
        val next = new Array[String](seg.length - 1)
        System.arraycopy(seg, 0, next, 0, bestPos)
        next(bestPos) = seg(bestPos) + seg(bestPos + 1)
        System.arraycopy(seg, bestPos + 2, next, bestPos + 1, seg.length - bestPos - 2)
        seg = next
      }
    }
    seg
  }

  def countWord(word: String): Int = {
    val hit = countCache.get(word)
    if (hit != null) return hit.intValue()
    val n = segmentWord(word).length
    if (countCache.size < MaxCache) countCache.put(word, Integer.valueOf(n))
    n
  }

  /** BPE token count of a single-space-separated text; empty fields
    * contribute zero tokens, matching split(t, ' ', -1) + per-word
    * segmentation on both engines.
    */
  def countText(text: String): Long = {
    var total = 0L
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) total += countWord(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }
}

object BpeCodec {

  def fromPacked(packed: Array[String]): BpeCodec =
    new BpeCodec(packed.map { s =>
      val i = s.indexOf(' ')
      (s.substring(0, i), s.substring(i + 1))
    })

  /** Codepoint split (NOT UTF-16 code units): matches the oracle's
    * substr(word, i, 1), which is codepoint-indexed.
    */
  def codepoints(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }
}
