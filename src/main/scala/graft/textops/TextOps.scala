package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, expressed as
  * codegen-friendly Column functions (`org.apache.spark.sql.functions`
  * only — no UDFs in the hot path). Each has a DuckDB-oracle-backed
  * entry in SparkEntry.
  */
object TextOps {

  /** Whitespace tokens (keeps empty trailing fields off by splitting on
    * single spaces — the synthetic corpus is single-spaced).
    */
  def tokens(text: Column): Column = split(text, " ", -1)

  def tokenCount(text: Column): Column = size(tokens(text)).cast("bigint")

  /** A BPE-ish subword proxy: word-piece count estimated by splitting on
    * non-alphanumerics and counting ceil(len/4) pieces per word — a
    * published rule-of-thumb (~4 chars/token) that keeps the hot path in
    * whole-stage codegen instead of calling a real tokenizer.
    */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(
      split(text, "[^A-Za-z0-9]+", -1),
      lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("bigint"))

  /** Per-language marker-stopword hit counts; the langId heuristic is the
    * deterministic argmax (ties break in declaration order). N-gram-free
    * but the same shape as published stopword-profile language ID.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
    "zh" -> Seq("的", "是", "了"))

  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => t.isin(markers: _*))).cast("bigint")

  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> markerHits(text, ms) }
    // argmax, first-wins on ties, 'und' (undetermined) when all zero
    val best = scores.tail.foldLeft((scores.head._1: String, scores.head._2)) {
      case ((bl, bs), (l, s)) => (l, when(s > bs, s).otherwise(bs))
    }
    val allZero = scores.map(_._2).reduce(_ + _) === 0
    val pick = scores.reverse.foldLeft(lit("und")) {
      case (acc, (l, s)) => when(s === best._2 && s > 0, lit(l)).otherwise(acc)
    }
    when(allZero, lit("und")).otherwise(pick)
  }

  /** Quality score in [0,1]: blend of length saturation, mean word
    * length plausibility and stopword presence — the standard cheap
    * quality gates (C4-style heuristics) as one codegen'd expression.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val nChars = length(text).cast("double")
    val meanWord = nChars / greatest(nTok.cast("double"), lit(1.0))
    val lenScore = least(nTok.cast("double") / 64.0, lit(1.0))
    val wordScore =
      when(meanWord >= 3 && meanWord <= 10, 1.0)
        .otherwise(greatest(lit(0.0), lit(1.0) - abs(meanWord - 6.5) / 10.0))
    val stopScore =
      least(markerHits(text, LangMarkers.flatMap(_._2)).cast("double") /
        greatest(nTok.cast("double") * 0.05, lit(1.0)), lit(1.0))
    // unrounded: the whole expression tree is plain IEEE arithmetic, so
    // the DuckDB oracle reproduces it bit-identically; round() would
    // reintroduce 1-ulp cross-engine differences
    lenScore * 0.4 + wordScore * 0.3 + stopScore * 0.3
  }

  /** n-gram shingle array over a token array. A doc with fewer than n
    * tokens yields an EMPTY array — the greatest() clamp alone would
    * emit one null-padded partial shingle, which diverged from the
    * relational oracles in round 1. Shared by the dedup family and
    * repetitionScore so the clamp semantics live in one place.
    */
  /** n-gram token shingles straight from the TEXT column — the native
    * expression path ([[graft.functions.ShingleArrayExpr]]): identical
    * output to `shingleArray(tokens(text), n)` (OpsSpec pins it) but
    * each shingle is emitted as a substring slice of the input bytes
    * inside whole-stage codegen, instead of the interpreted
    * slice/zip_with/concat_ws HOF chain. Preferred by every
    * tokenize-then-shingle caller; the HOF form below remains for
    * pre-tokenized arrays.
    */
  def shinglesOfText(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.PlanBridge.column(
      graft.functions.ShingleArrayExpr(
        org.apache.spark.sql.graft.PlanBridge.expression(text), n))

  def shingleArray(toks: Column, n: Int): Column = {
    // Built from n shifted slices folded with zip_with rather than a
    // transform over indices: an index lambda would capture `toks`
    // per element, and HOF lambdas re-evaluate captured subtrees on
    // EVERY element (no codegen/CSE inside CodegenFallback HOFs) — with
    // toks itself a split() that is O(tokens^2) per document.
    //
    // The input is additionally LET-BOUND once per row via a 1-element
    // transform(): the slice construction references its argument
    // ~2n+1 times (each slice + each slice's size()-derived length +
    // the guard), and with `toks` a split() that was 2n+1 whole-text
    // splits per row (17 at the substring pass's n=8; measured ~35% of
    // q_dedup_substring's task-CPU). Inside the lambda `t` is a bound
    // lambda variable — an O(1) read — so the split runs exactly once
    // per row; transform(array(x), f)[1] ≡ f(x) for deterministic f,
    // null included (array(null) -> [null] -> [f(null)]).
    def sh(t: Column): Column = {
      val len = size(t) - (n - 1)
      val parts = (0 until n)
        .map(k => slice(t, lit(k + 1), greatest(len, lit(0))))
      val joined = parts.reduce((a, b) => zip_with(a, b,
        (x, y) => concat_ws(" ", x, y)))
      when(size(t) >= n, joined).otherwise(array().cast("array<string>"))
    }
    element_at(transform(array(toks), t => sh(t)), 1)
  }

  /** Repetition score (Gopher-style quality gate): the fraction of
    * duplicated n-gram shingles within the document, 1 -
    * distinct/total, 0.0 when the doc has no shingles. High values
    * signal boilerplate/spam loops that perplexity-free pipelines
    * filter on. Record-local HOF columns, no UDF, exact IEEE doubles —
    * oracle-replayable.
    */
  def repetitionScore(text: Column, n: Int = 3): Column = {
    val sh = shinglesOfText(text, n)
    when(size(sh) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh))
  }

  /** PII/URL scrub (C4-style pre-training hygiene): URLs, then email
    * addresses, then IPv4 addresses, then phone numbers, each replaced
    * with a placeholder token. Order matters and is fixed: an email in a
    * URL's userinfo scrubs as part of the URL; an IP host scrubs as part
    * of its URL; IPs go before phones so dotted octet runs are never
    * half-eaten by the phone pattern. The patterns use only constructs
    * Java regex and RE2/DuckDB interpret identically (literal classes,
    * `[^ ]`, bounded repetition, ASCII `\b`), so a SQL oracle replays
    * the scrub byte-for-byte. Codegen'd regexp_replace — no UDF.
    *
    * `\b` placement: both digit patterns anchor word boundaries on their
    * digit runs, so digits INSIDE an alphanumeric token ("build20261")
    * never scrub — the C4 false-positive guard. The phone boundary sits
    * before the area code's first digit (after the optional `+CC` and
    * `(`, which as non-word chars cannot carry a boundary themselves),
    * and the trailing `\b` rejects matches that would end mid-digit-run,
    * so over-long digit runs stay untouched.
    */
  val UrlPattern = "https?://[^ ]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"
  val PhonePattern =
    "(\\+[0-9]{1,3}[-. ]?)?\\(?\\b[0-9]{3}\\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\\b"
  /** Invisible-character hygiene — strips zero-width characters
    * (ZWSP/ZWNJ/ZWJ/word-joiner), bidi controls (LRM/RLM, the
    * LRE..PDF embedding range, the LRI..PDI isolate range), BOM, and
    * soft hyphen. These survive HTML flattening and whitespace
    * normalization untouched, split tokens invisibly (wa​ter
    * tokenizes as two words), duplicate otherwise-identical docs past
    * exact dedup, and bidi controls are the Trojan-Source vector for
    * code corpora. Engine-portable regex subset (a single character
    * class), so the oracle replays it verbatim.
    */
  private val InvisiblesRe =
    "[\\x{200B}-\\x{200F}\\x{202A}-\\x{202E}\\x{2060}-\\x{2064}\\x{2066}-\\x{2069}\\x{FEFF}\\x{00AD}]"

  def stripInvisibles(text: Column): Column =
    regexp_replace(text, InvisiblesRe, "")

  /** How many invisibles were stripped (the audit column). */
  def invisibleCount(text: Column): Column =
    (length(text) - length(stripInvisibles(text))).cast("bigint")

  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, UrlPattern, "<URL>"),
          EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** The scrub family's patterns, named — shared by `scrubPii`
    * (redaction) and `entityInventory` (audit).
    */
  val EntityPatterns: Seq[(String, String)] = Seq(
    "url" -> UrlPattern,
    "email" -> EmailPattern,
    "ip" -> Ipv4Pattern,
    "phone" -> PhonePattern)

  /** Typed entity inventory — the AUDIT side of PII handling: before
    * (or after) scrubbing, measure what identifiable strings the
    * corpus actually carries, per document and type. Each pattern is
    * applied to the ORIGINAL text independently (an email inside a URL
    * is counted under both types — prevalence, not span partition),
    * with the same RE2-compatible patterns the scrub uses, so the
    * DuckDB oracle replays the match sets verbatim.
    *
    * Scale shape: codegen'd regexp_extract_all per pattern, a union of
    * four narrow projections over the same scan, one
    * map-side-combinable count shuffle. No UDFs, no driver state.
    */
  def entityInventory(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    EntityPatterns.map { case (tname, pat) =>
      docs.select(col(idCol), lit(tname).as("entity_type"),
        explode(regexp_extract_all(col(textCol), lit(pat), lit(0))).as("value"))
    }.reduce(_ union _)
      .groupBy(col(idCol), col("entity_type"), col("value"))
      .agg(count(lit(1)).as("n"))

  /** Homoglyph confusable map: the Cyrillic letters that render
    * identically to Latin а/е/о/р/с/х/у/і/ѕ — the classic spoofing
    * vector (a "сору" of a page that exact-dedup, URL blocklists, and
    * n-gram matching all miss because the code points differ).
    */
  val HomoglyphCyr: String =
    "аеорсхуіѕ"
  val HomoglyphLat: String = "aeopcxyis"

  /** Confusable skeleton: fold Cyrillic lookalikes onto their Latin
    * twins (a tiny, deterministic slice of Unicode TR39 skeletons).
    * Comparing skeletons instead of raw text makes homoglyph spoofs
    * collide with their originals; codegen'd single `translate`.
    */
  def homoglyphSkeleton(text: Column): Column =
    translate(text, HomoglyphCyr, HomoglyphLat)

  /** Count of characters in a Unicode script (Latin / Cyrillic / Han /
    * ...): everything outside the script is deleted and the remainder
    * measured. Common-script characters (digits, spaces, punctuation)
    * belong to no script and never count. Java names the property
    * `\p{IsX}` where RE2 says `\p{X}` — same Unicode script data, so
    * the DuckDB oracle replays the counts exactly.
    */
  def scriptCount(text: Column, script: String): Column =
    length(regexp_replace(text, s"[^\\p{Is$script}]", "")).cast("bigint")

  /** Dominant-script vote over per-script counts; ties break
    * alphabetically (cyrillic < han < latin), all-zero votes 'none'.
    */
  def dominantScript(lat: Column, cyr: Column, han: Column): Column =
    when(cyr >= han && cyr >= lat && cyr > 0, "cyrillic")
      .when(han >= lat && han > 0, "han")
      .when(lat > 0, "latin")
      .otherwise("none")

  /** Count of code-ish symbol characters ({ } ; = ( )) — the cheap
    * signal separating code from prose in a mixed crawl (the
    * code-vs-text mixing knob every LLM data recipe tunes).
    */
  def codeSymbolCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[{};=()]", ""))).cast("bigint")

  /** Lines starting with a tab or 2+ spaces (code indentation). The
    * per-element lambda touches only its own line — no HOF-CSE hazard.
    */
  def indentedLineCount(text: Column): Column =
    size(filter(split(text, "\n"), l => l.rlike("^(\t|  )"))).cast("bigint")

  /** Code-vs-prose vote: symbol density > 2% of characters OR > 30% of
    * lines indented. Pure double ratios with identical IEEE evaluation
    * on the oracle side.
    */
  def isCodeLike(text: Column): Column = {
    val symRatio = codeSymbolCount(text).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    val indentRatio = indentedLineCount(text).cast("double") /
      greatest(size(split(text, "\n")).cast("double"), lit(1.0))
    symRatio > 0.02 || indentRatio > 0.3
  }

  /** Mean whitespace-token length (Gopher rule: prose sits in [3, 10];
    * outside that band the "text" is usually tag soup, minified code,
    * or CJK misparsed by a whitespace tokenizer). The token array is
    * the aggregate's INPUT argument (evaluated once per row), not a
    * lambda capture — no HOF re-evaluation hazard.
    */
  def meanWordLength(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, w) => acc + length(w))
      .cast("double") / greatest(tokenCount(text).cast("double"), lit(1.0))

  /** Occurrences of a literal substring, via length-delta (codegen'd,
    * regex-free). Exact-integer result: the delta is always a multiple
    * of the pattern length, so the double divide is lossless.
    */
  def substrCount(text: Column, pat: String): Column = {
    require(pat.nonEmpty, "pattern must be non-empty")
    ((length(text) - length(replace(text, lit(pat), lit("")))) / lit(pat.length))
      .cast("long")
  }

  /** Symbol-to-word ratio (Gopher: > 0.1 flags spam/markup): counts of
    * '#', ASCII '...' (per 3-char run), and Unicode '…' per token.
    */
  def symbolWordRatio(text: Column): Column =
    (substrCount(text, "#") + substrCount(text, "...") + substrCount(text, "…"))
      .cast("double") / greatest(tokenCount(text).cast("double"), lit(1.0))

  /** Fraction of lines starting with a bullet marker (-, *, •) after
    * optional leading whitespace (Gopher: >= 0.9 flags list-only pages).
    */
  def bulletLineRatio(text: Column): Column = {
    val lines = split(text, "\n", -1)
    size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("double") /
      greatest(size(lines).cast("double"), lit(1.0))
  }

  /** Fraction of lines ending in an ellipsis after right-trim (Gopher:
    * >= 0.3 flags truncated-teaser pages).
    *
    * Engine-portability caveat: Java's `$` also matches before a FINAL
    * line terminator (\n, NEL U+0085, U+2028/29), where RE2's matches
    * only end-of-text — divergent only for lines whose last character
    * is a terminator, which normalizeText's control strip removes
    * upstream; the oracle corpus never carries them.
    */
  def ellipsisLineRatio(text: Column): Column = {
    val lines = split(text, "\n", -1)
    size(filter(lines, l => rtrim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") /
      greatest(size(lines).cast("double"), lit(1.0))
  }

  /** Fraction of whitespace tokens containing at least one ASCII letter
    * (Gopher: < 0.8 flags symbol/number soup).
    */
  def alphaWordRatio(text: Column): Column =
    size(filter(tokens(text), w => w.rlike("[A-Za-z]"))).cast("double") /
      greatest(tokenCount(text).cast("double"), lit(1.0))

  /** Gopher's required-stopword set (Rae et al. 2021): a document with
    * fewer than 2 hits is usually not running English prose.
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The composed Gopher quality gate over the signals above. Word-count
    * bounds are parameters (the published [50, 100000] is calibrated to
    * web pages; short-doc corpora lower the floor). Every signal is a
    * codegen-friendly Column with identical IEEE evaluation on the
    * DuckDB oracle side — the gate replays bit-for-bit.
    */
  def gopherPass(text: Column, minWords: Long = 50L,
      maxWords: Long = 100000L): Column = {
    val n = tokenCount(text)
    val mw = meanWordLength(text)
    n >= minWords && n <= maxWords &&
      mw >= 3.0 && mw <= 10.0 &&
      symbolWordRatio(text) < 0.1 &&
      bulletLineRatio(text) < 0.9 &&
      ellipsisLineRatio(text) < 0.3 &&
      alphaWordRatio(text) > 0.8 &&
      markerHits(text, GopherStopwords) >= 2L
  }

  /** Encoding-damage (mojibake) signals — the ingest-hygiene gate that
    * catches double-encoded UTF-8 and lossy transcodes before they
    * poison a training mix:
    *  - replacementCount: U+FFFD chars (a decoder already gave up);
    *  - c1ControlCount: C1 controls U+0080-U+009F (almost always
    *    CP-1252 bytes mis-read as Latin-1);
    *  - artifactCount: the classic UTF-8-read-as-Latin-1 digraphs
    *    ("Ã©" for é, "â€™" for ', ...).
    * All regex-free or literal-class counts, codegen'd, oracle-exact.
    */
  val MojibakeArtifacts: Seq[String] = Seq("Ã©", "Ã¨", "Ã¼", "â€™", "â€œ")

  def replacementCount(text: Column): Column = substrCount(text, "�")

  def c1ControlCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\x{80}-\\x{9F}]", "")))
      .cast("bigint")

  def mojibakeArtifactCount(text: Column): Column =
    MojibakeArtifacts.map(substrCount(text, _)).reduce(_ + _)

  def isEncodingDamaged(text: Column): Column =
    (replacementCount(text) + c1ControlCount(text) +
      mojibakeArtifactCount(text)) > 0L

  /** Syllable estimate: vowel-group count per token ([aeiouy]+ runs on
    * the lowercased token), floored at 1 per token — the standard
    * dictionary-free approximation Flesch implementations use. The
    * lambda is element-local (no captured-subtree re-evaluation).
    */
  def syllableEstimate(text: Column): Column =
    aggregate(tokens(lower(text)), lit(0L),
      (acc, w) => acc + greatest(regexp_count(w, lit("[aeiouy]+")), lit(1)).cast("long"))

  /** Sentence count: runs of terminal punctuation, floored at 1 so
    * punctuation-free text counts as one long sentence.
    */
  def sentenceCount(text: Column): Column =
    greatest(regexp_count(text, lit("[.!?]+")), lit(1)).cast("long")

  /** Sentence segmentation: split after a terminal-punctuation run
    * followed by a single space — the rule-based segmenter of a
    * cleaning pipeline (sentence-level dedup, per-sentence LM scoring,
    * bitext alignment all consume this). Implemented as
    * mark-then-split (insert U+0001 after the boundary, split on it)
    * because that stays inside the Java-regex/RE2 shared subset —
    * RE2 has no lookbehind, so a DuckDB oracle replays it exactly.
    * Record-local, codegen'd, zero shuffles.
    */
  def sentences(text: Column): Column =
    split(regexp_replace(text, "([.!?]+) ", "$1\u0001"), "\u0001", -1)

  /** Flesch reading ease (206.835 - 1.015 x words/sentence - 84.6 x
    * syllables/word) — the curriculum/difficulty axis of a data mix.
    * Pure IEEE arithmetic over the integer signals above, so the
    * DuckDB oracle replays the score bit-for-bit.
    */
  def fleschReadingEase(text: Column): Column = {
    val words = tokenCount(text).cast("double")
    val sents = sentenceCount(text).cast("double")
    val syls = syllableEstimate(text).cast("double")
    lit(206.835) - lit(1.015) * (words / sents) -
      lit(84.6) * (syls / greatest(words, lit(1.0)))
  }

  /** Word-boundary blocklist hit count (C4's badword gate shape): each
    * word matches as \b-delimited lowercase literal, so "big," and
    * "Big!" hit but "bigger" does not. Blocklist words must be plain
    * ASCII literals (no regex metacharacters) — checked — keeping the
    * pattern in the Java-regex/RE2 shared subset for oracle replay.
    */
  def blocklistHits(text: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "blocklist must be non-empty")
    require(words.forall(_.matches("[a-z0-9]+")),
      s"blocklist words must be lowercase ASCII literals: $words")
    words.map(w => regexp_count(lower(text), lit("\\b" + w + "\\b")).cast("long"))
      .reduce(_ + _)
  }

  /** Positional rolling-hash fingerprint: sum_i i*len(tok_i) mod p —
    * order-sensitive, engine-portable (pure integer arithmetic).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      zip_with(
        tokens(text),
        sequence(lit(1), greatest(size(tokens(text)), lit(1))),
        (tok, i) => i.cast("bigint") * length(tok)),
      lit(0L), (acc, x) => acc + x) % 1000000007L

  /** 64-bit SimHash over whitespace tokens (pure Scala, for typed maps):
    * per token a 64-bit hash votes +1/-1 on each bit; the sign vector is
    * the fingerprint. Near-duplicates have small Hamming distance.
    */
  def simhash64(text: String): Long = {
    val acc = new Array[Int](64)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          var h = hash64(text, start, i)
          var b = 0
          while (b < 64) {
            if ((h & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
            h >>>= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** FNV-1a 64-bit over a char range — stable across JVMs. */
  def hash64(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def hash64(s: String): Long = hash64(s, 0, s.length)

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
