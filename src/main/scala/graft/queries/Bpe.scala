package graft.queries

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Char-level byte-pair-encoding induction and application — the
  * tokenizer-training step of an LLM data pipeline (Sennrich et al. 2016),
  * completing the vocab story: `vocab_merges` ranks WORD-pair collocations;
  * here `vocab_bpe` LEARNS the char-pair merge table and `txt_bpe_encode`
  * tokenizes the corpus with it.
  *
  * Reference scope: the reference has no tokenization code at all — this
  * is a north-star extension per BASELINE.json's text-analysis axis.
  *
  * Design, and why it is 100 TB-shaped:
  *  - classic BPE trains on the WORD FREQUENCY table, not the corpus: the
  *    corpus is tokenized once (content-addressed via [[graft.operators.
  *    Content.reps]], so once per DISTINCT text, weighted by replica mass
  *    `G`), collapsed to (word, n) — vocabulary-sized, ~31 rows here and
  *    maybe 10^7 rows at 100 TB. Every training round touches ONLY that
  *    table; corpus scale enters through one tokenize+groupBy pass.
  *  - each round is: adjacent-pair weighted count → argmax (count desc,
  *    pair asc — deterministic) → one fold over each word's symbols.
  *    Rounds are staged to scratch parquet ([[graft.Scratch.stagedFrame]],
  *    keyed by round and data dir) — without the stage each round's plan
  *    embeds the previous round's lineage TWICE (once through the argmax,
  *    once through the fold), doubling the plan per round: 2^R blowup at
  *    R=8. Staging also memoizes the whole learn across the two queries
  *    and across bench reruns.
  *  - the merge application is a string-encoded greedy left-to-right fold
  *    (symbols joined by a U+001F separator; a merge of (a,b) appends b
  *    onto a tail that ends with sep+a). Spark's `aggregate` and the
  *    oracle's `list_reduce` run the SAME algorithm on the same encoding,
  *    so encodings are bit-identical cross-engine — no engine-specific
  *    replace() semantics anywhere (plain substring replace is UNSOUND
  *    here: pattern sep+a+sep+b can false-match a longer symbol bc when
  *    matching b's prefix).
  *  - encoding the corpus is a broadcast join of the vocabulary-sized
  *    (word → token count) table against the exploded corpus — the only
  *    corpus-wide pass besides the initial count, again content-addressed.
  */
object Bpe {
  type Q = (SparkSession, String) => DataFrame

  /** Merge rounds learned. 8 is plenty on the synthetic corpus (31
    * distinct words); at a real 10^7-word vocabulary the same loop runs
    * to 30k rounds only if rounds stay O(vocab) — they do: each round is
    * vocab-sized work after the single corpus pass.
    */
  private val R = 8
  private val Sep = "\u001f" // ASCII unit separator, never in tokenized text

  /** (word, n): corpus-exact weighted word frequencies, computed once per
    * distinct text and once per word.
    */
  private def wordTable(s: SparkSession, d: String): DataFrame = {
    val Gc = graft.operators.Content.G
    graft.operators.Content.reps(Tables.documents(s, d), Seq("text"))
      .select(col(Gc), explode(TextFns.tokens(col("text"))).as("w"))
      .groupBy("w").agg(sum(Gc).cast("long").as("n"))
  }

  /** Weighted adjacent-pair counts over the current symbol encodings.
    * The split of "␟s1␟s2…" yields a leading empty element, so symbols
    * live at indices 2..size; the size>=3 guard keeps `sequence` from
    * generating a DESCENDING range on 1-symbol words.
    */
  private def pairsOf(words: DataFrame): DataFrame = {
    val sy = col("sy")
    words.select(col("n"), split(col("enc"), Sep).as("sy"))
      .select(col("n"), explode(when(size(sy) >= 3,
          transform(sequence(lit(2), size(sy) - 1),
            i => struct(element_at(sy, i).as("a"),
              element_at(sy, (i + 1).cast("int")).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("pr"))
      .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
      .agg(sum("n").as("cnt"))
  }

  /** Apply one merge (a, b) → ab to every word: the greedy fold. Guards:
    * the leading empty split element is skipped; the tail test
    * `ends_with(acc, sep+a)` is exact symbol identity (the separator
    * before `a` anchors it), so multi-char symbols never false-match.
    */
  private def applyMerge(words: DataFrame, best: DataFrame): DataFrame =
    words.crossJoin(broadcast(best))
      .select(col("w"), col("n"),
        aggregate(split(col("enc"), Sep), lit(""),
          (acc, x) =>
            when(x === "", acc)
              .when(acc.endsWith(concat(lit(Sep), col("a"))) && x === col("b"),
                concat(acc, x))
              .otherwise(concat(acc, lit(Sep), x))).as("enc"))

  /** The staged learn: per-round best-pair frames (1 row each) and the
    * final word-encoding table. Memoized per (session, data dir).
    */
  private def learned(s: SparkSession, d: String): (Seq[DataFrame], DataFrame) = {
    // digest, not sanitized path: replaceAll("[^A-Za-z0-9]","_") is lossy
    // (/tmp/sf0.1 and /tmp/sf0_1 collide and would silently serve one
    // dataset's vocab for another) — same contract as every other staged
    // call site
    val tag = graft.Scratch.digest(d)
    var w = graft.Scratch.stagedFrame(s, s"bpe_w0_$tag") {
      wordTable(s, d).withColumn("enc",
        regexp_replace(col("w"), "(.)", Sep + "$1"))
    }
    val merges = (1 to R).map { r =>
      val best = graft.Scratch.stagedFrame(s, s"bpe_m${r}_$tag") {
        pairsOf(w).orderBy(desc("cnt"), col("a"), col("b")).limit(1)
      }
      // Fail loudly on an exhausted vocabulary: an empty argmax would make
      // applyMerge's crossJoin silently EMPTY the word table (and the
      // oracle mirrors the same collapse, so the cross-engine gate could
      // not catch it). best is a staged <=1-row parquet, so the check is a
      // tiny read, once per memoized learn.
      require(!best.isEmpty, s"BPE round $r: no pair left to merge " +
        s"(every word is a single symbol) — lower R below $r for this corpus")
      w = graft.Scratch.stagedFrame(s, s"bpe_w${r}_$tag") { applyMerge(w, best) }
      best
    }
    (merges, w)
  }

  /** The learned merge table: round, pair, merged symbol, weighted count.
    * THE artifact a tokenizer ships; R rows.
    */
  def vocabBpe(s: SparkSession, d: String): DataFrame = {
    val (merges, _) = learned(s, d)
    merges.zipWithIndex.map { case (m, i) =>
      m.select(lit((i + 1).toLong).as("rnd"), col("a").as("left_sym"),
        col("b").as("right_sym"), concat(col("a"), col("b")).as("merged"),
        col("cnt").as("n"))
    }.reduce(_ union _).orderBy("rnd")
  }

  /** Tokenize the corpus under the learned merges: per-doc word count,
    * char count (in words), and BPE token count. One exploded corpus pass
    * joined against the broadcast vocabulary encoding; per-doc rows come
    * from the content-addressed re-expansion.
    */
  def txtBpeEncode(s: SparkSession, d: String): DataFrame = {
    val (_, wenc) = learned(s, d)
    val wtok = wenc.select(col("w"),
      length(col("w")).cast("long").as("wlen"),
      (size(split(col("enc"), Sep)) - 1).cast("long").as("wtoks"))
    graft.operators.Content.perContent(Tables.documents(s, d), Seq("text")) { reps =>
      val H = graft.operators.Content.H
      reps.select(col(H), explode(TextFns.tokens(col("text"))).as("w"))
        .join(broadcast(wtok), "w")
        .groupBy(H)
        .agg(count(lit(1)).as("n_words"), sum("wlen").as("n_chars_tok"),
          sum("wtoks").as("n_tokens_bpe"))
    }.select("doc_id", "n_words", "n_chars_tok", "n_tokens_bpe")
      .sortWithinPartitions("doc_id")
  }

  /** Pack documents into fixed TOKEN-budget bins per language — `ds_pack`
    * with the budget measured in true BPE tokens (what a training run
    * actually packs by: sequence slots are token counts, not chars),
    * composed from the certified `txt_bpe_encode` counts. Scale shape
    * inherits both parents: one corpus tokenize pass + broadcast
    * vocabulary join for the counts, then one lang exchange + per-lang
    * running total for the bins.
    */
  private val PackTokBudget = 1024L

  def dsPackTokens(s: SparkSession, d: String): DataFrame = {
    val counts = txtBpeEncode(s, d).select("doc_id", "n_tokens_bpe")
    // running total via the two-level chunked prefix sum (TextQueries.
    // packCumsum) — a flat per-lang window would serialize the biggest
    // language into one task at corpus scale
    TextQueries.packCumsum(
        Tables.documents(s, d).select("doc_id", "lang").join(counts, "doc_id"),
        "n_tokens_bpe")
      .withColumn("bin", expr(s"(cum - n_tokens_bpe) div $PackTokBudget"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens_bpe").cast("long").as("tokens"))
      .orderBy("lang", "bin")
  }

  // ---- oracle SQL (DuckDB), same algorithm spelled in its idiom ----

  private val tokSql =
    """list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                                  t -> len(t) > 0)""".stripMargin

  /** CTE chain: wt, w0, then per round r: p{r} (pair counts), m{r}
    * (argmax), w{r} (fold). Shared by both oracles.
    */
  private def cteChain: String = {
    val rounds = (1 to R).map { r =>
      s"""p$r AS (
         |  SELECT pr.a AS a, pr.b AS b, CAST(sum(n) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT n, unnest(list_transform(range(2, len(sy)),
         |             i -> struct_pack(a := sy[i], b := sy[i+1]))) AS pr
         |    FROM (SELECT n, string_split(enc, chr(31)) AS sy FROM w${r - 1})
         |  ) GROUP BY 1, 2
         |), m$r AS (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
         |w$r AS (
         |  SELECT w, n, list_reduce(string_split(enc, chr(31)),
         |    (acc, x) -> CASE WHEN ends_with(acc, chr(31) || m.a) AND x = m.b
         |                     THEN acc || x ELSE acc || chr(31) || x END) AS enc
         |  FROM w${r - 1}, m$r m
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH wt AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest($tokSql) AS w FROM documents)
       |  GROUP BY 1
       |), w0 AS (
       |  SELECT w, n, regexp_replace(w, '(.)', chr(31) || '\\1', 'g') AS enc
       |  FROM wt
       |),
       |$rounds""".stripMargin
  }

  val vocabBpeSql: String = {
    val union = (1 to R)
      .map(r => s"SELECT CAST($r AS BIGINT) AS rnd, a, b, cnt FROM m$r")
      .mkString("\n  UNION ALL ")
    s"""$cteChain
       |SELECT rnd, a AS left_sym, b AS right_sym, a || b AS merged,
       |       cnt AS n
       |FROM (
       |  $union
       |) ORDER BY rnd""".stripMargin
  }

  val txtBpeEncodeSql: String =
    s"""$cteChain,
       |tok AS (SELECT doc_id, unnest($tokSql) AS w FROM documents)
       |SELECT doc_id,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(len(w)) AS BIGINT) AS n_chars_tok,
       |       CAST(sum(len(string_split(enc, chr(31))) - 1) AS BIGINT)
       |         AS n_tokens_bpe
       |FROM tok JOIN w$R USING (w)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  val dsPackTokensSql: String =
    s"""$cteChain,
       |tok AS (SELECT doc_id, unnest($tokSql) AS w FROM documents),
       |cnts AS (
       |  SELECT doc_id,
       |         CAST(sum(len(string_split(enc, chr(31))) - 1) AS BIGINT)
       |           AS n_tokens_bpe
       |  FROM tok JOIN w$R USING (w) GROUP BY 1
       |),
       |packed AS (
       |  SELECT d.lang, c.doc_id, c.n_tokens_bpe,
       |         CAST(sum(c.n_tokens_bpe) OVER (PARTITION BY d.lang
       |              ORDER BY c.doc_id ROWS BETWEEN UNBOUNDED PRECEDING
       |              AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM cnts c JOIN documents d USING (doc_id)
       |)
       |SELECT lang,
       |       CAST((cum - n_tokens_bpe) // $PackTokBudget AS BIGINT) AS bin,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tokens_bpe) AS BIGINT) AS tokens
       |FROM packed GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin

  val queries: Map[String, Q] = Map(
    "vocab_bpe" -> (vocabBpe _),
    "txt_bpe_encode" -> (txtBpeEncode _),
    "ds_pack_tokens" -> (dsPackTokens _))

  val oracles: Map[String, String] = Map(
    "vocab_bpe" -> vocabBpeSql,
    "txt_bpe_encode" -> txtBpeEncodeSql,
    "ds_pack_tokens" -> dsPackTokensSql)
}
