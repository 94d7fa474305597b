package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: tokenization,
  * shingling, quality stats, language-ID heuristics, fingerprints, MinHash
  * signatures. All pure built-in expressions (codegen-friendly; no UDFs),
  * so they vectorize over a 100 TB documents table as plain projections.
  */
object TextFns {

  /** Whitespace tokenization of lowercased text, empty tokens dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** BPE-ish subword-count proxy: alphabetic runs + digit runs + each
    * punctuation mark as its own token. RE2-compatible pattern (no
    * lookarounds) so other engines' regexp_extract_all reproduces it.
    */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Adjacent token pairs ("w1 w2"), empty for docs under 2 tokens —
    * unlike [[shingles]] there is no whole-text fallback, so LM-style
    * consumers (bigram counts, perplexity proxies) never see a
    * pseudo-bigram from a 1-token document.
    */
  def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i),
          element_at(toks, (i + 1).cast("int")))))
      .otherwise(array().cast("array<string>"))

  /** Word n-gram shingles over a token array (n >= 1). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array(array_join(toks, " ")))

  /** Whitespace-normalized lowercase text — the staging step for
    * [[charNgramsFromNormalized]]. Callers MUST project this as its own
    * column before windowing over it: a free expression inside a lambda
    * re-evaluates per element, so an inlined normalize would re-run the
    * regex once per character position (measured 6× on txt_winnow).
    */
  def normalized(text: Column): Column =
    lower(regexp_replace(text, "\\s+", " "))

  /** Character n-grams over an already-STAGED normalized-text column
    * (see [[normalized]] — `s` must be a plain column attribute, not an
    * expression, or the lambda re-computes it per element).
    */
  def charNgramsFromNormalized(s: Column, n: Int): Column =
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - (n - 1)), i => s.substr(i, lit(n))))
      .otherwise(array(s))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))

  /** Ratio of tokens found in `stopwords` (small broadcast set inlined as a
    * literal array — no join needed).
    */
  def stopwordRatio(toks: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: length band + stopword presence +
    * low punctuation density + mean word length band. A deterministic,
    * explainable heuristic in the Gopher/C4-filter style.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    qualityScoreFromTokens(tokens(text), text, stopwords)

  /** [[qualityScore]] over an already-projected token column — callers
    * that stage tokens once (the no-CSE rule) pass the column reference
    * here instead of re-tokenizing inside every sub-score.
    */
  def qualityScoreFromTokens(toks: Column, text: Column, stopwords: Seq[String]): Column = {
    val nTok = size(toks)
    val meanLen = when(nTok > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok)
      .otherwise(lit(0.0))
    val punctRatio = when(length(text) > 0,
      punctCount(text).cast("double") / length(text)).otherwise(lit(0.0))
    val lenOk   = when(nTok.between(10, 100000), lit(0.25)).otherwise(lit(0.0))
    val stopOk  = when(stopwordRatio(toks, stopwords) > 0.01, lit(0.25)).otherwise(lit(0.0))
    val punctOk = when(punctRatio < 0.2, lit(0.25)).otherwise(lit(0.0))
    val wordOk  = when(meanLen.between(2.0, 12.0), lit(0.25)).otherwise(lit(0.0))
    round(lenOk + stopOk + punctOk + wordOk, 2)
  }

  /** Exact-content fingerprint: md5 of whitespace-normalized lowercase text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Per-char-k-gram md5 hashes of normalized text — materialize this as
    * its own projected column before calling [[winnowFromHashes]]: lambda
    * bodies are re-evaluated per element with no common-subexpression
    * elimination, so windowing directly over this expression would
    * recompute every hash per window (O(len²) md5 calls).
    */
  def kgramHashes(s: Column, k: Int): Column =
    transform(charNgramsFromNormalized(s, k), g => md5(g))

  /** Winnowing fingerprint set (rolling-hash document fingerprinting in
    * the MOSS style) over a precomputed hash-array column: slide a window
    * of `w` hashes, keep each window's minimum, dedupe. Guarantees any
    * shared substring of length >= k + w - 1 contributes a shared
    * fingerprint. md5-hex hashes keep the selection engine-portable.
    */
  def winnowFromHashes(hs: Column, w: Int): Column = {
    // window min as a least() chain of w element_ats — no per-position
    // w-element array copy (slice+array_min allocated one tiny array per
    // character position of the corpus)
    val wins = when(size(hs) >= w,
      transform(sequence(lit(1), size(hs) - (w - 1)),
        i => least((0 until w).map(k =>
          element_at(hs, (i + k).cast("int"))): _*)))
      .otherwise(array(array_min(hs)))
    array_distinct(wins)
  }

  /** One MinHash value: min over shingles of md5(seed:shingle).
    * Hex-string min is a valid uniform min-hash (md5 is uniform on hex
    * strings and lexicographic order on fixed-width hex = numeric order).
    * Using md5 keeps bit-exact parity with any other engine's md5.
    */
  def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(lit(s"$seed:"), s))))

  /** Full MinHash signature as an array of `k` hex hashes. */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    array((0 until k).map(minhash(shingleArr, _)): _*)

  /** SimHash-style 16-bit signature from token md5s: for each of 16 hex
    * positions, the majority bit of (hex digit >= 8) across tokens.
    * Compact locality-sensitive bit signature with engine-portable hashing.
    */
  def simhash16(toks: Column): Column =
    simhash16FromHashes(transform(toks, t => md5(t)))

  /** Same, over a precomputed md5-hash array column — callers that refer
    * to the hash array 16 times should project it once first.
    */
  def simhash16FromHashes(hashes: Column): Column = {
    val bits = (0 until 16).map { i =>
      val ones = size(filter(hashes, h =>
        substring(h, i + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f")))
      when(ones * 2 >= size(hashes), lit(1)).otherwise(lit(0)) * lit(1L << i)
    }
    bits.reduce(_ + _)
  }
}
