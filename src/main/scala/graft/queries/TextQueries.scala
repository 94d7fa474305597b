package graft.queries

import graft.Tables
import graft.functions.TextFns
import graft.operators.TextDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis + document-dedup queries over `documents` — the
  * training-data-pipeline operator family (language-ID, quality scoring,
  * token stats, fingerprinting, exact/near-dup detection).
  *
  * All per-document work is a pure projection (no shuffle); dedup variants
  * shuffle only on compact keys (fingerprints, band hashes, block keys) —
  * never on the document text itself.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  // ---- per-document stats + quality score ----
  // tokens staged ONCE as `tk` (every sub-score references the column, no
  // re-tokenization per expression). Content-addressed
  // (Content.perContent): the tokenize + sub-score stack runs once per
  // distinct text, not per copy; the trailing orderBy's sampling pass
  // re-reads the join's materialized shuffle stages under AQE, not the
  // projection (the sort-first rule applied to the pre-collapse shape).
  def txtStats(s: SparkSession, d: String): DataFrame =
    statsDerived(s, d, salt = None).sortWithinPartitions("doc_id")

  private[graft] def statsDerived(s: SparkSession, d: String,
                                    salt: Option[org.apache.spark.sql.Column]): DataFrame =
    graft.operators.Content.perContent(
        Tables.documents(s, d), Seq("text"), salt = salt) { reps =>
      val H = graft.operators.Content.H
      reps
        .select(col(H), col("text"), TextFns.tokens(col("text")).as("tk"))
        .select(
          col(H),
          size(col("tk")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars_calc"),
          TextFns.punctCount(col("text")).cast("long").as("punct_cnt"),
          round(TextFns.stopwordRatio(col("tk"), Stopwords), 4).as("stop_ratio"),
          // zero-token guard mirrors the oracle's CASE (and under ANSI mode
          // an unguarded /0 would throw, not yield null)
          when(size(col("tk")) > 0,
            round(aggregate(col("tk"), lit(0L), (acc, t) => acc + length(t)).cast("double")
              / size(col("tk")), 4)).otherwise(0.0).as("mean_wlen"),
          TextFns.tokenCountRegex(col("text")).cast("long").as("bpe_tokens"),
          TextFns.qualityScoreFromTokens(col("tk"), col("text"), Stopwords).as("quality"))
    }

  val txtStatsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, text,
      |         list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                     t -> len(t) > 0) AS tk
      |  FROM documents
      |), base AS (
      |  SELECT doc_id, text, tk,
      |         len(tk) AS n_tok,
      |         len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS punct,
      |         CASE WHEN len(tk) > 0 THEN
      |           len(list_filter(tk, t -> t IN ('the','a','of','and','to','in','is')))::DOUBLE
      |             / len(tk) ELSE 0.0 END AS stop_r,
      |         CASE WHEN len(tk) > 0 THEN
      |           CAST(list_sum(list_transform(tk, t -> len(t))) AS DOUBLE) / len(tk)
      |           ELSE 0.0 END AS mean_w,
      |         CASE WHEN len(text) > 0 THEN
      |           (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
      |             / len(text) ELSE 0.0 END AS punct_r
      |  FROM toks
      |)
      |SELECT doc_id,
      |       CAST(n_tok AS BIGINT) AS n_tokens,
      |       CAST(len(text) AS BIGINT) AS n_chars_calc,
      |       CAST(punct AS BIGINT) AS punct_cnt,
      |       round(stop_r, 4) AS stop_ratio,
      |       round(mean_w, 4) AS mean_wlen,
      |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
      |         AS bpe_tokens,
      |       round((CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 0.25 ELSE 0.0 END) +
      |             (CASE WHEN stop_r > 0.01 THEN 0.25 ELSE 0.0 END) +
      |             (CASE WHEN punct_r < 0.2 THEN 0.25 ELSE 0.0 END) +
      |             (CASE WHEN mean_w BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END), 2)
      |         AS quality
      |FROM base ORDER BY doc_id""".stripMargin

  // ---- language-ID heuristic (marker-token voting) ----
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "y"),
    "de" -> Seq("der", "die", "und"))

  // tokens staged once, then the four marker scores staged once as
  // columns (`predicted` references each score up to four times — inlined
  // score expressions would re-run the filter+tokenize per reference);
  // sort first, projections after (see txtStats).
  def txtLangid(s: SparkSession, d: String): DataFrame = {
    val scoreCols = LangMarkers.map { case (lang, markers) =>
      size(filter(col("tk"),
        t => array_contains(array(markers.map(lit): _*), t))).as(s"${lang}_s")
    }
    val Seq(en, fr, es, de) = LangMarkers.map { case (l, _) => col(s"${l}_s") }
    val predicted =
      when(en > 0 && en >= fr && en >= es && en >= de, lit("en"))
        .when(fr > 0 && fr >= es && fr >= de, lit("fr"))
        .when(es > 0 && es >= de, lit("es"))
        .when(de > 0, lit("de"))
        .otherwise(lit("und"))
    graft.Par.sortSpread(Tables.documents(s, d), col("doc_id"))
      .select(Seq(col("doc_id"), col("lang"),
        TextFns.tokens(col("text")).as("tk")): _*)
      .select(Seq(col("doc_id"), col("lang")) ++ scoreCols: _*)
      .select(
        col("doc_id"), predicted.as("predicted"),
        en.cast("long").as("en_hits"), col("lang").as("labeled_lang"))
  }

  val txtLangidSql: String =
    """WITH sc AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(tk, t -> t IN ('the','a','is'))) AS en,
      |    len(list_filter(tk, t -> t IN ('le','la','et'))) AS fr,
      |    len(list_filter(tk, t -> t IN ('el','los','y'))) AS es,
      |    len(list_filter(tk, t -> t IN ('der','die','und'))) AS de
      |  FROM (SELECT doc_id, lang,
      |          list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                      t -> len(t) > 0) AS tk
      |        FROM documents)
      |)
      |SELECT doc_id,
      |       CASE WHEN en > 0 AND en >= fr AND en >= es AND en >= de THEN 'en'
      |            WHEN fr > 0 AND fr >= es AND fr >= de THEN 'fr'
      |            WHEN es > 0 AND es >= de THEN 'es'
      |            WHEN de > 0 THEN 'de'
      |            ELSE 'und' END AS predicted,
      |       CAST(en AS BIGINT) AS en_hits,
      |       lang AS labeled_lang
      |FROM sc ORDER BY doc_id""".stripMargin

  // ---- content fingerprint ----
  // tokens are projected ONCE (`tk`): `shingles` slices inside a
  // transform lambda, and lambda bodies re-evaluate free expressions per
  // element (no CSE) — inlining the split+filter re-tokenized the text
  // per shingle position (measured: 7.7 s → sub-second at sf0.1 together
  // with the then-current sort-first rule). Content-addressed
  // (Content.perContent): tokenize + shingle-distinct once per distinct
  // text; the trailing orderBy samples the join's materialized shuffle
  // stages, not the projection.
  def txtFingerprint(s: SparkSession, d: String): DataFrame =
    fingerprintDerived(s, d, salt = None).sortWithinPartitions("doc_id")

  private[graft] def fingerprintDerived(s: SparkSession, d: String,
                                          salt: Option[org.apache.spark.sql.Column]): DataFrame =
    graft.operators.Content.perContent(
        Tables.documents(s, d), Seq("text"), salt = salt) { reps =>
      val H = graft.operators.Content.H
      reps
        .select(col(H), TextFns.fingerprint(col("text")).as("fp"),
          TextFns.tokens(col("text")).as("tk"))
        .select(col(H), col("fp"),
          size(col("tk")).cast("long").as("n_tokens"),
          size(array_distinct(TextFns.shingles(col("tk"), 3))).cast("long").as("n_shingles3"))
    }

  val txtFingerprintSql: String =
    """WITH toks AS (
      |  SELECT doc_id, text,
      |         list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                     t -> len(t) > 0) AS tk
      |  FROM documents
      |)
      |SELECT doc_id,
      |       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
      |       CAST(len(tk) AS BIGINT) AS n_tokens,
      |       CAST(len(list_distinct(
      |         CASE WHEN len(tk) >= 3
      |           THEN list_transform(range(1, len(tk) - 1),
      |                               i -> array_to_string(tk[i:i+2], ' '))
      |           ELSE [array_to_string(tk, ' ')] END)) AS BIGINT) AS n_shingles3
      |FROM toks ORDER BY doc_id""".stripMargin

  // ---- winnowing fingerprints (rolling-hash k-gram windows) ----
  // The suite's heaviest per-character work (an md5 per character
  // position) — evaluated content-addressed: once per distinct text, not
  // per copy (Content.perContent scaladoc has the full trade). Staging
  // rules inside the derivation are unchanged: normalized text FIRST (the
  // n-gram lambda re-evaluates a free normalize per character position),
  // then the hash array projected once, then windowed.
  def txtWinnow(s: SparkSession, d: String): DataFrame =
    winnowDerived(s, d, salt = None).sortWithinPartitions("doc_id")

  private[graft] def winnowDerived(s: SparkSession, d: String,
                                     salt: Option[org.apache.spark.sql.Column]): DataFrame =
    graft.operators.Content.perContent(
        Tables.documents(s, d), Seq("text"), salt = salt) { reps =>
      val H = graft.operators.Content.H
      reps.select(col(H), TextFns.normalized(col("text")).as("ns"))
        .select(col(H), TextFns.kgramHashes(col("ns"), 8).as("h"))
        .select(col(H), TextFns.winnowFromHashes(col("h"), 4).as("fps"))
        .select(
          col(H),
          size(col("fps")).cast("long").as("n_fingerprints"),
          array_min(col("fps")).as("min_fp"),
          array_max(col("fps")).as("max_fp"))
    }

  val txtWinnowSql: String =
    """WITH hs AS (
      |  SELECT doc_id,
      |         list_transform(
      |           CASE WHEN len(s) >= 8
      |             THEN list_transform(range(1, len(s) - 6), i -> s[i:i+7])
      |             ELSE [s] END,
      |           g -> md5(g)) AS h
      |  FROM (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS s
      |        FROM documents)
      |), wins AS (
      |  SELECT doc_id,
      |         list_distinct(CASE WHEN len(h) >= 4
      |           THEN list_transform(range(1, len(h) - 2),
      |                               i -> list_min(h[i:i+3]))
      |           ELSE [list_min(h)] END) AS fps
      |  FROM hs
      |)
      |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fingerprints,
      |       list_min(fps) AS min_fp, list_max(fps) AS max_fp
      |FROM wins ORDER BY doc_id""".stripMargin

  // ---- exact dedup by fingerprint ----
  def ddExact(s: SparkSession, d: String): DataFrame =
    TextDedup.exactGroups(Tables.documents(s, d)).orderBy("fp")

  val ddExactSql: String =
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
      |       min(doc_id) AS keep_doc_id,
      |       CAST(count(*) AS BIGINT) AS dup_count
      |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin

  // ---- near-dup: exact n-gram jaccard within (lang, length) blocks ----
  def ddNgramJaccard(s: SparkSession, d: String): DataFrame =
    TextDedup.ngramJaccardPairs(Tables.documents(s, d),
        shingleN = 2, lenBand = 100, minJaccard = 0.2)
      .orderBy("doc_a", "doc_b")

  // mirrors the operator's candidate rule exactly: i<j pairs from
  // shingles with per-block df in [2, 64], PLUS star pairs (bucket-min ↔
  // member) from shingles with df in (64, 4096] — the template-cluster
  // fallback; the jaccard itself is exact over the full shingle sets
  val ddNgramJaccardSql: String =
    """WITH sh AS (
      |  SELECT doc_id, lang, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
      |         list_distinct(CASE WHEN len(tk) >= 2
      |           THEN list_transform(range(1, len(tk)),
      |                               i -> array_to_string(tk[i:i+1], ' '))
      |           ELSE [array_to_string(tk, ' ')] END) AS s
      |  FROM (SELECT doc_id, lang, n_chars,
      |          list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                      t -> len(t) > 0) AS tk
      |        FROM documents)
      |), ex AS (
      |  SELECT doc_id, lang, len_bucket, unnest(s) AS shingle FROM sh
      |), freq AS (
      |  SELECT lang, len_bucket, shingle, count(*) AS n
      |  FROM ex GROUP BY 1, 2, 3
      |), low AS (
      |  SELECT e.doc_id, e.lang, e.len_bucket, e.shingle
      |  FROM ex e JOIN freq f
      |    ON e.lang = f.lang AND e.len_bucket = f.len_bucket
      |   AND e.shingle = f.shingle
      |  WHERE f.n BETWEEN 2 AND 64
      |), mid AS (
      |  SELECT e.doc_id, e.lang, e.len_bucket, e.shingle
      |  FROM ex e JOIN freq f
      |    ON e.lang = f.lang AND e.len_bucket = f.len_bucket
      |   AND e.shingle = f.shingle
      |  WHERE f.n > 64 AND f.n <= 4096
      |), star AS (
      |  SELECT lang, len_bucket, shingle, min(doc_id) AS mn
      |  FROM mid GROUP BY 1, 2, 3
      |), cand AS (
      |  SELECT DISTINCT doc_a, doc_b FROM (
      |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |    FROM low a JOIN low b
      |      ON a.lang = b.lang AND a.len_bucket = b.len_bucket
      |     AND a.shingle = b.shingle AND a.doc_id < b.doc_id
      |    UNION
      |    SELECT s.mn AS doc_a, m.doc_id AS doc_b
      |    FROM star s JOIN mid m
      |      ON s.lang = m.lang AND s.len_bucket = m.len_bucket
      |     AND s.shingle = m.shingle
      |    WHERE m.doc_id > s.mn)
      |)
      |SELECT doc_a, doc_b, jaccard FROM (
      |  SELECT c.doc_a, c.doc_b,
      |         round(len(list_intersect(a.s, b.s))::DOUBLE /
      |               (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4)
      |           AS jaccard
      |  FROM cand c
      |  JOIN sh a ON c.doc_a = a.doc_id
      |  JOIN sh b ON c.doc_b = b.doc_id
      |  WHERE len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0
      |)
      |WHERE jaccard >= 0.2 ORDER BY doc_a, doc_b""".stripMargin

  // ---- asymmetric near-dup: shingle-set containment (doc-in-doc) ----
  // rep-level by definition (one rep per (fingerprint, lang)); see
  // TextDedup.containmentPairs for why there is NO length-band block
  // here. 4-gram grain, deliberately coarser than dd_ngram_jaccard's
  // bigrams: a shared 4-token run is quotation evidence where a shared
  // bigram is just shared vocabulary — and over THIS corpus's 31-token
  // vocabulary the bigram key space (≤31²/lang) pushes every df to the
  // cap and the candidate set toward all-pairs, while 4-grams (31⁴ keys)
  // keep dfs sparse and candidates content-driven (measured 4.4 → 2.2 s
  // at sf0.1 for the same machinery; the remainder is the collapse+stage
  // floor every dd_* query pays)
  def ddContainment(s: SparkSession, d: String): DataFrame =
    TextDedup.containmentPairs(Tables.documents(s, d),
      shingleN = 4, minContainBp = 8000, dfCap = 64, minSet = 5)

  // the oracle replays the rep-level definition directly: collapse to
  // (fingerprint, lang) reps, df-capped candidate buckets per lang, exact
  // string-shingle intersection, integer basis-point threshold
  val ddContainmentSql: String =
    """WITH reps AS (
      |  SELECT min(doc_id) AS doc_id, lang, arg_min(text, doc_id) AS text
      |  FROM documents
      |  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), lang
      |), sh AS (
      |  SELECT doc_id, lang,
      |         list_distinct(CASE WHEN len(tk) >= 4
      |           THEN list_transform(range(1, len(tk) - 2),
      |                               i -> array_to_string(tk[i:i+3], ' '))
      |           ELSE [array_to_string(tk, ' ')] END) AS s
      |  FROM (SELECT doc_id, lang,
      |          list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                      t -> len(t) > 0) AS tk
      |        FROM reps)
      |), ex AS (
      |  SELECT doc_id, lang, unnest(s) AS shingle FROM sh
      |), low AS (
      |  SELECT lang, shingle FROM ex GROUP BY 1, 2
      |  HAVING count(*) BETWEEN 2 AND 64
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM (SELECT e.* FROM ex e JOIN low f
      |          ON e.lang = f.lang AND e.shingle = f.shingle) a
      |  JOIN (SELECT e.* FROM ex e JOIN low f
      |          ON e.lang = f.lang AND e.shingle = f.shingle) b
      |    ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
      |)
      |SELECT doc_a, doc_b, containment, min_set FROM (
      |  SELECT c.doc_a, c.doc_b,
      |         round(len(list_intersect(a.s, b.s))::DOUBLE /
      |               least(len(a.s), len(b.s)), 4) AS containment,
      |         CAST(least(len(a.s), len(b.s)) AS BIGINT) AS min_set,
      |         len(list_intersect(a.s, b.s)) AS inter
      |  FROM cand c
      |  JOIN sh a ON c.doc_a = a.doc_id
      |  JOIN sh b ON c.doc_b = b.doc_id
      |)
      |WHERE min_set >= 5 AND inter * 10000 >= min_set * 8000
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---- dedup-quality evaluation: LSH recall vs exact Jaccard ----
  // The reindex-quality loop for dedup (sim_recall's sibling): how much
  // of the EXACT near-dup pair set (dd_ngram_jaccard's definition,
  // restricted to jaccard ≥ 0.8 — the regime 4×4 banding is tuned for)
  // does the shipped dd_minhash_lsh query recover, reported per jaccard
  // band in integer basis points. Composes the two SHIPPED queries
  // verbatim — this measures the system a user actually runs, including
  // the est ≥ 0.25 filter and the banding's S-curve. Both engines replay
  // the same composition, so the recall numbers themselves are
  // oracle-certified. Cost is the two sub-pipelines re-run (bounded by
  // their own scale arguments); the recall join is pair-set-sized.
  def ddLshRecall(s: SparkSession, d: String): DataFrame = {
    val bandOf = when(col("jaccard") >= 1.0, "c_exact_1.0")
      .when(col("jaccard") >= 0.9, "b_[0.9,1.0)")
      .otherwise("a_[0.8,0.9)")
    val truth = ddNgramJaccard(s, d).filter(col("jaccard") >= 0.8)
      .withColumn("jband", bandOf)
    val lsh = ddMinhashLsh(s, d).select("doc_a", "doc_b")
    // ONE pass over the truth pipeline: a marker left join (LSH pairs
    // are DISTINCT, so no fan-out) feeds both counts through a single
    // aggregation, where the semi-join formulation planned the ngram
    // sub-pipeline twice. Measured gain is modest (5.45 → 5.0 s at
    // sf0.1 — the staged shingle artifacts already amortized most of the
    // duplicate subtree); the dominant cost is the two shipped
    // sub-pipelines themselves, which is the point of the query.
    truth.join(lsh.withColumn("f", lit(1L)), Seq("doc_a", "doc_b"), "left")
      .groupBy("jband")
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("f"), lit(0L))).as("n_found"))
      .withColumn("recall_bp", expr("(n_found * 10000) div n_true"))
      .select("jband", "n_true", "n_found", "recall_bp")
      .orderBy("jband")
  }

  // the two shipped oracles embedded verbatim as subqueries (nested WITH
  // is legal in a parenthesized subquery), so this oracle can never
  // drift from the queries it evaluates. Lazy: ddMinhashLshSql is
  // declared later in this object — a strict val would capture null.
  lazy val ddLshRecallSql: String =
    s"""WITH truth AS (
       |  SELECT doc_a, doc_b,
       |         CASE WHEN jaccard >= 1.0 THEN 'c_exact_1.0'
       |              WHEN jaccard >= 0.9 THEN 'b_[0.9,1.0)'
       |              ELSE 'a_[0.8,0.9)' END AS jband
       |  FROM (
       |$ddNgramJaccardSql
       |  ) WHERE jaccard >= 0.8
       |), lshp AS (
       |  SELECT doc_a, doc_b FROM (
       |$ddMinhashLshSql
       |  )
       |), t AS (
       |  SELECT jband, CAST(count(*) AS BIGINT) AS n_true
       |  FROM truth GROUP BY 1
       |), f AS (
       |  SELECT jband, CAST(count(*) AS BIGINT) AS n_found
       |  FROM truth
       |  WHERE EXISTS (SELECT 1 FROM lshp l
       |                WHERE l.doc_a = truth.doc_a AND l.doc_b = truth.doc_b)
       |  GROUP BY 1
       |)
       |SELECT t.jband AS jband, t.n_true,
       |       CAST(coalesce(f.n_found, 0) AS BIGINT) AS n_found,
       |       CAST((coalesce(f.n_found, 0) * 10000
       |              - mod(coalesce(f.n_found, 0) * 10000, t.n_true))
       |            / t.n_true AS BIGINT) AS recall_bp
       |FROM t LEFT JOIN f ON t.jband = f.jband
       |ORDER BY t.jband""".stripMargin

  // ---- dedup-quality evaluation: recall matrix over BANDING FAMILIES ----
  // The data the rotation decision was missing (dd_band_rot ships a
  // 4×4 → 8×2 rotation, but only 4×4 had a certified recall number, and
  // the 1000× rung showed 8×2's cost degrading 90.8× under replica
  // floods): one row per (banding family × jaccard band) with the
  // family's recall of the exact near-dup truth — 4×4 and 8×2 over the
  // same 16 hashes (pure banding trade at equal signing cost: S-curve
  // threshold (1/b)^(1/r) ≈ 0.71 vs 0.59), plus 8×4 over 32 hashes (the
  // more-hashes escape when neither 16-hash shape satisfies). All three
  // run the SHIPPED pipeline (minhashLshPairs, est ≥ 0.25), so the
  // matrix certifies the system a deployment would actually rotate to;
  // the replica-flood COST curve lives in BENCH_NOTES next to it.
  def ddBandRecall(s: SparkSession, d: String): DataFrame = {
    val scratch = graft.Scratch.dir(s, "graft_bandrec_")
    val bandOf = when(col("jaccard") >= 1.0, "c_exact_1.0")
      .when(col("jaccard") >= 0.9, "b_[0.9,1.0)")
      .otherwise("a_[0.8,0.9)")
    // truth staged ONCE — all three family joins read this small file
    // instead of replaying the exact-Jaccard pipeline per family.
    // NEGATIVE RESULT (optimization r14): running this write on a second
    // driver thread so it overlaps the group/signature staging (guide
    // §2.6) measured NO gain at sf0.1 (10.27 vs 9.7-10.3 s across runs)
    // — both pipelines are AQE mini-stage chains that bottleneck at the
    // scheduler, not at executor occupancy, so there is no idle tail to
    // back-fill. Kept serial for simplicity.
    val truth = graft.Scratch.writeRead(
      ddNgramJaccard(s, d).filter(col("jaccard") >= 0.8)
        .withColumn("jband", bandOf)
        .select("doc_a", "doc_b", "jband"), s"$scratch/truth")
    // The cost columns count DOC-level candidates WITHOUT materializing
    // them: every doc-level candidate pair is either intra-group (g
    // replicas of one text collide in every band: C(g,2) pairs, est
    // 1.0) or the ga·gb expansion of a rep-level bucket collision —
    // so n_cand = Σ C(g,2) + Σ_repCands ga·gb, exactly, from the
    // rep-level frame. The first shipped version counted by expanding
    // minEst = 0 candidates to doc grain, which is the replica-flood
    // quadratic this suite's own doctrine forbids: at the 100× ladder
    // rung the three families' sub-0.25 collisions × 100·100
    // multiplicities made this one query 860 s — 62% of the whole rung
    // (BENCH_NOTES r14). Weighted rep-level counting is bounded by
    // distinct texts at any replication.
    //
    // SHARED-WORK shape (optimization r14, guide §1.2/§2.3): the first
    // shipped version ran minhashLshScaledPairs + minhashLshPairs per
    // family — SIX fingerprint collapses and SIX MinHash signings of the
    // corpus (2×16 + 1×32 hashes, twice), plus three exactGroups
    // collapses for the intra count. All six legs are functions of ONE
    // collapsed group table and ONE 32-hash signature (minhashSignature
    // seeds are 0..k-1, so the 16-hash families' signature is exactly
    // slice(sig, 1, 16) — bit-identical prefix sharing), and each
    // family's cost aggregate and recall pair set are two readers of ONE
    // rep-level banded pair file (est at minEst = 0; the shipped 0.25
    // threshold is a filter over it — est is m/k, so filtering the
    // 4-decimal rounded est is exact). Three families band in ONE fused
    // pass (union + one bucket shuffle). Measured 15.45 → 9.72 s at
    // sf0.1 (isolated min-of-3, same subset, same session); output
    // bit-identical (oracle re-gated at sf0.001 + sf0.01).
    val nPart = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val groups = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        TextFns.fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("rep_id"),
        min_by(col("text"), col("doc_id")).as("text"),
        sort_array(collect_list(col("doc_id"))).as("members"),
        count(lit(1)).as("dup_count"))
      // EXPLICIT-count repartition between the collapse and the signing:
      // the collapsed reps are tiny in BYTES, so AQE coalesces the
      // grouping exchange to one partition — and the 32-hash signing
      // projection downstream of it then runs on ONE core (measured: a
      // single-task 6.2 s stage at sf0.1, the Par.sortSpread trap). An
      // explicit count is user-specified and AQE keeps it; the count is
      // the session's shuffle parallelism, not a local constant.
      .repartition(nPart, col("rep_id"))
      // tk staged before shingles references it in a lambda, shingles
      // before the signature — the minhashBandIndex no-CSE rule
      .select(col("rep_id"), col("members"), col("dup_count"),
        TextFns.tokens(col("text")).as("tk"))
      .select(col("rep_id"), col("members"), col("dup_count"),
        TextFns.shingles(col("tk"), 2).as("sh"))
      .select(col("rep_id"), col("members"), col("dup_count"),
        TextFns.minhashSignature(col("sh"), 32).as("sig"))
    val g = graft.Scratch.writeRead(groups, s"$scratch/groups")

    val nIntra = g.agg(coalesce(sum(expr("dup_count * (dup_count - 1) div 2")),
      lit(0L)).cast("long").as("n_intra")) // integer div: g(g-1) is even
    // intra-group doc pairs (est 1.0 — admitted by every family's 0.25
    // threshold) are family-independent: staged once, read three times
    val intraPairs = graft.Scratch.writeRead(
      g.filter(size(col("members")) >= 2)
        .select(explode(TextDedup.expandSortedPairs(col("members"), (x, y) =>
          struct(x.as("doc_a"), y.as("doc_b")))).as("p"))
        .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b")),
      s"$scratch/intra")

    // all three families' banded rep rows in ONE frame → one bucket
    // shuffle; keys are (family, band, band_hash), est over the family's
    // own k hashes — bandBucketPairs' algebra verbatim per family
    val fams = Seq(("4x4", 4, 4, 16), ("8x2", 8, 2, 16), ("8x4", 8, 4, 32))
    val repPairs = graft.Scratch.writeRead(fams.map { case (nm, b, r, k) =>
      val sigK = if (k == 32) col("sig") else slice(col("sig"), 1, k)
      g.select(lit(nm).as("family"), lit(k).as("k"),
          col("rep_id").as("doc_id"), sigK.as("fsig"),
          posexplode(transform(sequence(lit(0), lit(b - 1)),
            bb => md5(array_join(
              slice(sigK, bb * lit(r) + 1, lit(r)), ",")))))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "band_hash")
    }.reduce(_.unionByName(_))
      .groupBy("family", "k", "band", "band_hash")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("fsig")))).as("ms"))
      .filter(size(col("ms")) >= 2)
      .select(col("family"),
        explode(TextDedup.expandSortedPairs(col("ms"), (x, y) =>
          struct(
            x("doc_id").as("doc_a"),
            y("doc_id").as("doc_b"),
            (size(filter(zip_with(x("fsig"), y("fsig"), (p, q) => p === q),
              eq => eq)).cast("double") / col("k")).as("est_jaccard")))).as("pr"))
      .select(col("family"), col("pr.doc_a").as("doc_a"),
        col("pr.doc_b").as("doc_b"), col("pr.est_jaccard").as("est_jaccard"))
      .distinct() // same pair can collide in several bands
      .withColumn("est_jaccard", round(col("est_jaccard"), 4)),
      s"$scratch/reppairs")

    // ONE pass per leg for ALL THREE families (the family column rides
    // the grouped keys), instead of three copies of each join/aggregate
    // branch — the final action's stage count is what the query is
    // bound by once the shared signing is in place.
    val dups = g.select(col("rep_id"), col("dup_count"))
    val m = g.select(col("rep_id"), col("members"))
    val cost3 = repPairs
      .join(dups.toDF("doc_a", "dups_a"), "doc_a")
      .join(dups.toDF("doc_b", "dups_b"), "doc_b")
      .groupBy("family")
      .agg(
        coalesce(sum(col("dups_a") * col("dups_b")), lit(0L))
          .cast("long").as("cand_cross"),
        coalesce(sum(when(col("est_jaccard") >= 0.25,
            col("dups_a") * col("dups_b")).otherwise(0L)), lit(0L))
          .cast("long").as("pairs_cross"))
      .crossJoin(broadcast(nIntra)) // 3-row × 1-row
      .select(col("family"), (col("cand_cross") + col("n_intra")).as("n_cand"),
        (col("pairs_cross") + col("n_intra")).as("n_pairs"))
    // the recall side reads the SHIPPED est ≥ 0.25 pair set at doc grain
    // (minhashLshPairs' intra ∪ expanded-cross composition per family —
    // genuine near-dups, C(g,2)-bounded). Intra pairs are identical for
    // every family (est 1.0), so they fan to the three tags by literal.
    val crossDocs = repPairs.filter(col("est_jaccard") >= 0.25)
      .join(m.toDF("doc_a", "ma"), "doc_a")
      .join(m.toDF("doc_b", "mb"), "doc_b")
      .select(col("family"), explode(flatten(transform(col("ma"), x =>
        transform(col("mb"), y =>
          struct(least(x, y).as("doc_a"), greatest(x, y).as("doc_b")))))).as("p"))
      .select(col("family"), col("p.doc_a").as("doc_a"),
        col("p.doc_b").as("doc_b"))
    val lshAll = fams.map { case (nm, _, _, _) =>
      intraPairs.select(lit(nm).as("family"), col("doc_a"), col("doc_b"))
    }.reduce(_.unionByName(_)).unionByName(crossDocs)
    // ONE inner join attributes found truth rows to (family, jband);
    // LSH pair sets are distinct per family so the count is exact, and
    // n_true is family-independent (one tiny aggregate). The grid
    // restores (family, jband) cells no family found.
    val found = truth.join(lshAll, Seq("doc_a", "doc_b"))
      .groupBy("family", "jband").agg(count(lit(1)).as("n_found"))
    val base = truth.groupBy("jband").agg(count(lit(1)).as("n_true"))
    fams.map { case (nm, _, _, _) =>
      base.select(lit(nm).as("family"), col("jband"), col("n_true"))
    }.reduce(_.unionByName(_))
      .join(found, Seq("family", "jband"), "left")
      .select(col("family"), col("jband"), col("n_true"),
        coalesce(col("n_found"), lit(0L)).as("n_found"))
      .join(broadcast(cost3), "family")
      .withColumn("recall_bp", expr("(n_found * 10000) div n_true"))
      .select("family", "jband", "n_true", "n_found", "recall_bp",
        "n_cand", "n_pairs")
      .orderBy("family", "jband")
  }

  /** One family's candidate block for the recall-matrix oracle: every
    * bucket-colliding pair with its estimate — the dd_minhash_lsh pairs
    * CTE parameterized over a banded CTE name and its k. est is always
    * over the family's full k hashes, candidate generation over its
    * (bands × rowsPerBand) shape.
    */
  private def famCandSql(bnd: String, k: Int): String =
    s"""SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         list_sum(list_transform(range(1, ${k + 1}),
       |           i -> CASE WHEN a.sg[i] = b.sg[i] THEN 1 ELSE 0 END)) / $k.0 AS est
       |  FROM $bnd a JOIN $bnd b
       |    ON a.band = b.band AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id""".stripMargin

  lazy val ddBandRecallSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id,
       |         CASE WHEN len(tk) >= 2
       |           THEN list_transform(range(1, len(tk)),
       |                               i -> array_to_string(tk[i:i+1], ' '))
       |           ELSE [array_to_string(tk, ' ')] END AS s
       |  FROM (SELECT doc_id,
       |          list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |                      t -> len(t) > 0) AS tk
       |        FROM documents)
       |), sig16 AS (
       |  SELECT doc_id,
       |         list_transform(range(0, 16),
       |           j -> list_min(list_transform(s, x -> md5(j || ':' || x)))) AS sg
       |  FROM sh
       |), sig32 AS (
       |  SELECT doc_id,
       |         list_transform(range(0, 32),
       |           j -> list_min(list_transform(s, x -> md5(j || ':' || x)))) AS sg
       |  FROM sh
       |), b44 AS (
       |  SELECT doc_id, sg, b AS band,
       |         md5(array_to_string(sg[b*4+1 : b*4+4], ',')) AS band_hash
       |  FROM sig16, (SELECT unnest(range(0, 4)) AS b)
       |), b82 AS (
       |  SELECT doc_id, sg, b AS band,
       |         md5(array_to_string(sg[b*2+1 : b*2+2], ',')) AS band_hash
       |  FROM sig16, (SELECT unnest(range(0, 8)) AS b)
       |), b84 AS (
       |  SELECT doc_id, sg, b AS band,
       |         md5(array_to_string(sg[b*4+1 : b*4+4], ',')) AS band_hash
       |  FROM sig32, (SELECT unnest(range(0, 8)) AS b)
       |), fam AS (
       |  SELECT '4x4' AS family, * FROM (${famCandSql("b44", 16)})
       |  UNION ALL
       |  SELECT '8x2' AS family, * FROM (${famCandSql("b82", 16)})
       |  UNION ALL
       |  SELECT '8x4' AS family, * FROM (${famCandSql("b84", 32)})
       |), cost AS (
       |  SELECT family, CAST(count(*) AS BIGINT) AS n_cand,
       |         CAST(sum(CASE WHEN est >= 0.25 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_pairs
       |  FROM fam GROUP BY 1
       |), truth AS (
       |  SELECT doc_a, doc_b,
       |         CASE WHEN jaccard >= 1.0 THEN 'c_exact_1.0'
       |              WHEN jaccard >= 0.9 THEN 'b_[0.9,1.0)'
       |              ELSE 'a_[0.8,0.9)' END AS jband
       |  FROM (
       |$ddNgramJaccardSql
       |  ) WHERE jaccard >= 0.8
       |), t AS (
       |  SELECT jband, CAST(count(*) AS BIGINT) AS n_true
       |  FROM truth GROUP BY 1
       |), f AS (
       |  SELECT fm.family, tr.jband, CAST(count(*) AS BIGINT) AS n_found
       |  FROM truth tr JOIN fam fm
       |    ON fm.doc_a = tr.doc_a AND fm.doc_b = tr.doc_b
       |  WHERE fm.est >= 0.25
       |  GROUP BY 1, 2
       |)
       |SELECT cost.family AS family, t.jband AS jband, t.n_true AS n_true,
       |       CAST(coalesce(f.n_found, 0) AS BIGINT) AS n_found,
       |       CAST((coalesce(f.n_found, 0) * 10000
       |              - mod(coalesce(f.n_found, 0) * 10000, t.n_true))
       |            / t.n_true AS BIGINT) AS recall_bp,
       |       cost.n_cand, cost.n_pairs
       |FROM cost CROSS JOIN t
       |LEFT JOIN f ON f.family = cost.family AND f.jband = t.jband
       |ORDER BY family, jband""".stripMargin

  // ---- near-dup: MinHash + LSH banding ----
  def ddMinhashLsh(s: SparkSession, d: String): DataFrame =
    TextDedup.minhashLshPairs(Tables.documents(s, d),
        shingleN = 2, bands = 4, rowsPerBand = 4, minEst = 0.25)
      .orderBy("doc_a", "doc_b")

  val ddMinhashLshSql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |         CASE WHEN len(tk) >= 2
      |           THEN list_transform(range(1, len(tk)),
      |                               i -> array_to_string(tk[i:i+1], ' '))
      |           ELSE [array_to_string(tk, ' ')] END AS s
      |  FROM (SELECT doc_id,
      |          list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                      t -> len(t) > 0) AS tk
      |        FROM documents)
      |), sig AS (
      |  SELECT doc_id,
      |         list_transform(range(0, 16),
      |           j -> list_min(list_transform(s, x -> md5(j || ':' || x)))) AS sg
      |  FROM sh
      |), banded AS (
      |  SELECT doc_id, sg, b AS band,
      |         md5(array_to_string(sg[b*4+1 : b*4+4], ',')) AS band_hash
      |  FROM sig, (SELECT unnest(range(0, 4)) AS b)
      |), pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         list_sum(list_transform(range(1, 17),
      |           i -> CASE WHEN a.sg[i] = b.sg[i] THEN 1 ELSE 0 END)) / 16.0 AS est
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
      |)
      |SELECT doc_a, doc_b, round(est, 4) AS est_jaccard FROM pairs
      |WHERE est >= 0.25 ORDER BY doc_a, doc_b""".stripMargin

  // ---- near-dup: collapse-first MinHash + LSH (the duplicate-flood-safe
  // composition: exact groups shrink to one representative before any
  // signature or pair work; see TextDedup.minhashLshScaledPairs) ----
  def ddMinhashScaled(s: SparkSession, d: String): DataFrame =
    TextDedup.minhashLshScaledPairs(Tables.documents(s, d),
        shingleN = 2, bands = 4, rowsPerBand = 4, minEst = 0.25)
      .orderBy("doc_a", "doc_b")

  val ddMinhashScaledSql: String =
    """WITH g AS (
      |  SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text,
      |         CAST(count(*) AS BIGINT) AS dup_count
      |  FROM documents
      |  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
      |), sh AS (
      |  SELECT doc_id,
      |         CASE WHEN len(tk) >= 2
      |           THEN list_transform(range(1, len(tk)),
      |                               i -> array_to_string(tk[i:i+1], ' '))
      |           ELSE [array_to_string(tk, ' ')] END AS s
      |  FROM (SELECT doc_id,
      |          list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                      t -> len(t) > 0) AS tk
      |        FROM g)
      |), sig AS (
      |  SELECT doc_id,
      |         list_transform(range(0, 16),
      |           j -> list_min(list_transform(s, x -> md5(j || ':' || x)))) AS sg
      |  FROM sh
      |), banded AS (
      |  SELECT doc_id, sg, b AS band,
      |         md5(array_to_string(sg[b*4+1 : b*4+4], ',')) AS band_hash
      |  FROM sig, (SELECT unnest(range(0, 4)) AS b)
      |), pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         list_sum(list_transform(range(1, 17),
      |           i -> CASE WHEN a.sg[i] = b.sg[i] THEN 1 ELSE 0 END)) / 16.0 AS est
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
      |)
      |SELECT p.doc_a, p.doc_b, round(p.est, 4) AS est_jaccard,
      |       ga.dup_count AS dups_a, gb.dup_count AS dups_b
      |FROM pairs p
      |JOIN g ga ON p.doc_a = ga.doc_id
      |JOIN g gb ON p.doc_b = gb.doc_id
      |WHERE p.est >= 0.25 ORDER BY doc_a, doc_b""".stripMargin

  // ---- incremental ingest dedup: new batch vs precomputed corpus index ----
  // The last 20% of doc_ids play the "newly crawled batch"; the first 80%
  // are the historical corpus whose band index already exists (here built
  // in the same DAG; in production it is the persisted artifact —
  // TextDedupSpec round-trips it through parquet to prove the shape
  // survives storage). Split arithmetic is integer (doc_id*5 vs
  // (max_id+1)*4), so both engines cut identically.
  def ddIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val mx = docs.agg(max("doc_id").as("mx"))
    val dd = docs.crossJoin(broadcast(mx))
    def side(pred: org.apache.spark.sql.Column) = dd.filter(pred)
      .select(col("doc_id"), col("text"), TextFns.fingerprint(col("text")).as("fp"))
    val corpus = side(col("doc_id") * 5 < (col("mx") + 1) * 4)
    val batch = side(col("doc_id") * 5 >= (col("mx") + 1) * 4)
    // Collapse BOTH sides to unique texts before any signature work —
    // provably result-preserving, not approximate: replicas of one text
    // share the signature, so every replica pair has the SAME est, and
    // the best-match rule (max est, ties to min corpus id) already picks
    // each text's min-id representative; batch replicas likewise inherit
    // their representative's verdict verbatim. What it buys: match-pair
    // volume is quadratic in duplicate multiplicities without the
    // collapse (batch copy × corpus copy per band) — measured 64 s at
    // 100× replicated data, vs ~4 s collapsed, identical output.
    def reps(s0: DataFrame) = s0.groupBy("fp")
      .agg(min("doc_id").as("doc_id"), min_by(col("text"), col("doc_id")).as("text"))
    // The corpus index is THE persisted artifact of incremental ingest
    // (TextDedup.minhashBandIndex scaladoc): stage it per (session,
    // sfDir) via Scratch.stagedFrame, so repeat invocations — bench
    // min-of-3, a suite run — measure the BATCH fold against existing
    // state, the production shape this query demonstrates (same doctrine
    // as Incremental.stagedState and Copurchase.pairCounts). This also
    // makes the shipped query itself prove the index round-trips through
    // parquet storage, which TextDedupSpec asserts separately.
    val idx = graft.Scratch.stagedFrame(s,
      "graft_incr_idx_" + graft.Scratch.digest(d)) {
      TextDedup.minhashBandIndex(reps(corpus),
        shingleN = 2, bands = 4, rowsPerBand = 4)
    }
    val verdicts = TextDedup.incrementalNearDups(idx, reps(batch),
        shingleN = 2, bands = 4, rowsPerBand = 4, minEst = 0.25)
      .withColumnRenamed("doc_id", "rep_id")
    // fan the representative verdicts back out to every batch doc
    batch.select(col("doc_id"), col("fp"))
      .join(reps(batch).select(col("fp"), col("doc_id").as("rep_id")), "fp")
      .join(verdicts, "rep_id")
      .select("doc_id", "novel", "match_id", "match_est")
      .orderBy("doc_id")
  }

  val ddIncrementalSql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |         CASE WHEN len(tk) >= 2
      |           THEN list_transform(range(1, len(tk)),
      |                               i -> array_to_string(tk[i:i+1], ' '))
      |           ELSE [array_to_string(tk, ' ')] END AS s
      |  FROM (SELECT doc_id,
      |          list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                      t -> len(t) > 0) AS tk
      |        FROM documents)
      |), sig AS (
      |  SELECT doc_id,
      |         list_transform(range(0, 16),
      |           j -> list_min(list_transform(s, x -> md5(j || ':' || x)))) AS sg
      |  FROM sh
      |), banded AS (
      |  SELECT doc_id, sg, b AS band,
      |         md5(array_to_string(sg[b*4+1 : b*4+4], ',')) AS band_hash
      |  FROM sig, (SELECT unnest(range(0, 4)) AS b)
      |), mx AS (SELECT max(doc_id) AS mx FROM documents
      |), bb AS (SELECT banded.* FROM banded, mx WHERE doc_id * 5 >= (mx + 1) * 4
      |), cb AS (SELECT banded.* FROM banded, mx WHERE doc_id * 5 < (mx + 1) * 4
      |), matches AS (
      |  SELECT DISTINCT b.doc_id AS b_id, c.doc_id AS c_id,
      |         list_sum(list_transform(range(1, 17),
      |           i -> CASE WHEN b.sg[i] = c.sg[i] THEN 1 ELSE 0 END)) / 16.0 AS est
      |  FROM bb b JOIN cb c ON b.band = c.band AND b.band_hash = c.band_hash
      |), best AS (
      |  SELECT b_id, c_id, est FROM (
      |    SELECT b_id, c_id, est,
      |           row_number() OVER (PARTITION BY b_id
      |                              ORDER BY est DESC, c_id) AS rn
      |    FROM matches WHERE est >= 0.25
      |  ) WHERE rn = 1
      |)
      |SELECT d.doc_id, best.c_id IS NULL AS novel,
      |       best.c_id AS match_id, round(best.est, 4) AS match_est
      |FROM (SELECT doc_id FROM documents, mx WHERE doc_id * 5 >= (mx + 1) * 4) d
      |LEFT JOIN best ON d.doc_id = best.b_id
      |ORDER BY d.doc_id""".stripMargin

  // ---- maintained band-index store: the oracle-gated lifecycle ----
  // The lexical twin of `sim_ivfpq_store`/`sim_ivfpq_rot`: the SAME
  // KeyedStore machinery DocStream's streaming ingest maintains in
  // production (mixed-tree read, watermark exclusion, durable
  // tombstones, hash-family rotation), exercised end to end INSIDE an
  // oracle-checked row. The store lives ingest → compact → ingest →
  // forget → replay (and, in the rot variant, a full hash-family
  // rotation) before the probe; the DuckDB oracle is the one-pass band
  // index of live ∖ forgotten corpus docs — a bug anywhere in the
  // lifecycle (a replay outranking a fold, a tombstone dropped across a
  // swap, rotation re-indexing the wrong live set) hash-mismatches the
  // row. Store rows are keyed per doc_id (the forget grain), so no
  // fingerprint collapse here — collapse-first is certified separately
  // in dd_incremental, and the oracle chain is collapse-free anyway
  // (provably result-preserving either way).

  /** Near-dup verdicts for the last-20% "batch" docs against the
    * maintained band store of the first-80% corpus, after the store's
    * full life. Built once per (session, dataset) — a production store
    * is a persisted artifact serving many probes — so bench repeats
    * time the serve+probe (the `sim_ivfpq_store` doctrine).
    */
  def ddBandStore(s: SparkSession, d: String): DataFrame =
    bandStoreServe(s, d, rotated = false)

  /** [[ddBandStore]] plus a hash-family ROTATION before the probe:
    * `DocStream.rotateBandStore` re-indexes the live docs under a new
    * banding (4x4 → 8x2 over the same 16 hashes) and atomically swaps
    * the store; the probe then signs the batch under the ROTATED family.
    * The oracle runs the one-pass 8x2 index over live ∖ forgotten —
    * rotation ≡ rebuild-on-live, gated end to end.
    */
  def ddBandRot(s: SparkSession, d: String): DataFrame =
    bandStoreServe(s, d, rotated = true)

  private def bandStoreServe(s: SparkSession, d: String,
                             rotated: Boolean): DataFrame = {
    import graft.sources.KeyedStore
    val docs = Tables.documents(s, d)
    val mx = docs.agg(max("doc_id").as("mx"))
    val dd = docs.crossJoin(broadcast(mx))
    val corpus = dd.filter(col("doc_id") * 5 < (col("mx") + 1) * 4)
      .select("doc_id", "text")
    val batch = dd.filter(col("doc_id") * 5 >= (col("mx") + 1) * 4)
      .select("doc_id", "text")
    def idx(pred: org.apache.spark.sql.Column) =
      TextDedup.minhashBandIndex(corpus.filter(pred),
        shingleN = 2, bands = 4, rowsPerBand = 4)
    val schema = idx(lit(true)).schema
    val dir = graft.Scratch.dirFor(s,
      (if (rotated) "band_rotstore_" else "band_store_")
        + graft.Scratch.digest(d)) + "/store"
    SimilarityQueries.buildOnce(s, dir) {
      // the drill: halves/quarters of the corpus arrive as base + two
      // batches with a compaction in between, a deterministic id slice
      // is forgotten, and the PRE-fold batch then replays — physically
      // resurrecting folded (and partly forgotten) rows the serve-side
      // watermark + tombstones must keep invisible
      idx(col("doc_id") % 2 === 0).write.mode("overwrite")
        .parquet(s"$dir/base")
      idx(col("doc_id") % 4 === 1).write.mode("overwrite")
        .parquet(s"$dir/batch_0")
      KeyedStore.compact(s, dir, Seq("band"), schema, "doc_id")
      idx(col("doc_id") % 4 === 3).write.mode("overwrite")
        .parquet(s"$dir/batch_1")
      KeyedStore.forget(s, dir, "doc_id",
        docs.select("doc_id").filter(col("doc_id") % 7 === 3))
      idx(col("doc_id") % 4 === 1).write.mode("overwrite")
        .parquet(s"$dir/batch_0")
      if (rotated)
        graft.streaming.DocStream.rotateBandStore(s, dir, d, schema,
          shingleN = 2, bands = 8, rowsPerBand = 2)
    }
    val (bands, rpb) = if (rotated) (8, 2) else (4, 4)
    val served = KeyedStore.serve(s, dir, Seq("band"), schema, "doc_id")
    // Probe-side collapse (the dd_incremental doctrine, result-preserving
    // and oracle-proven there): batch replicas share the signature, so
    // every replica inherits its representative's verdict verbatim.
    // Without it the bucket join is (batch copies × corpus copies) per
    // text — on the 1000×-replicated scaling rung that quadratic filled
    // the disk with sig-array shuffle before failing (BENCH_NOTES r13).
    // The STORE side deliberately stays per-doc (forget's grain), so the
    // join stays linear in corpus replicas — the store drill's price.
    val batchFp = batch.select(col("doc_id"), col("text"),
      TextFns.fingerprint(col("text")).as("fp"))
    val reps = batchFp.groupBy("fp")
      .agg(min("doc_id").as("doc_id"),
        min_by(col("text"), col("doc_id")).as("text"))
    val verdicts = TextDedup.incrementalNearDups(served,
        reps.select("doc_id", "text"),
        shingleN = 2, bands = bands, rowsPerBand = rpb, minEst = 0.25)
      .withColumnRenamed("doc_id", "rep_id")
    batchFp.select(col("doc_id"), col("fp"))
      .join(reps.select(col("fp"), col("doc_id").as("rep_id")), "fp")
      .join(verdicts, "rep_id")
      .select("doc_id", "novel", "match_id", "match_est")
      .orderBy("doc_id")
  }

  /** The one-pass oracle chain for the maintained-store rows: the
    * dd_incremental chain with the corpus side restricted to live ∖
    * forgotten docs, parameterized over the banding family so the
    * rotation variant certifies the ROTATED index (8 bands × 2 rows —
    * est still over all 16 hashes, only candidate generation changes).
    */
  private def bandStoreSql(bands: Int, rowsPerBand: Int): String =
    s"""WITH sh AS (
       |  SELECT doc_id,
       |         CASE WHEN len(tk) >= 2
       |           THEN list_transform(range(1, len(tk)),
       |                               i -> array_to_string(tk[i:i+1], ' '))
       |           ELSE [array_to_string(tk, ' ')] END AS s
       |  FROM (SELECT doc_id,
       |          list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |                      t -> len(t) > 0) AS tk
       |        FROM documents)
       |), sig AS (
       |  SELECT doc_id,
       |         list_transform(range(0, 16),
       |           j -> list_min(list_transform(s, x -> md5(j || ':' || x)))) AS sg
       |  FROM sh
       |), banded AS (
       |  SELECT doc_id, sg, b AS band,
       |         md5(array_to_string(
       |           sg[b*$rowsPerBand+1 : b*$rowsPerBand+$rowsPerBand],
       |           ',')) AS band_hash
       |  FROM sig, (SELECT unnest(range(0, $bands)) AS b)
       |), mx AS (SELECT max(doc_id) AS mx FROM documents
       |), bb AS (SELECT banded.* FROM banded, mx WHERE doc_id * 5 >= (mx + 1) * 4
       |), cb AS (SELECT banded.* FROM banded, mx
       |          WHERE doc_id * 5 < (mx + 1) * 4 AND NOT (doc_id % 7 = 3)
       |), matches AS (
       |  SELECT DISTINCT b.doc_id AS b_id, c.doc_id AS c_id,
       |         list_sum(list_transform(range(1, 17),
       |           i -> CASE WHEN b.sg[i] = c.sg[i] THEN 1 ELSE 0 END)) / 16.0 AS est
       |  FROM bb b JOIN cb c ON b.band = c.band AND b.band_hash = c.band_hash
       |), best AS (
       |  SELECT b_id, c_id, est FROM (
       |    SELECT b_id, c_id, est,
       |           row_number() OVER (PARTITION BY b_id
       |                              ORDER BY est DESC, c_id) AS rn
       |    FROM matches WHERE est >= 0.25
       |  ) WHERE rn = 1
       |)
       |SELECT d.doc_id, best.c_id IS NULL AS novel,
       |       best.c_id AS match_id, round(best.est, 4) AS match_est
       |FROM (SELECT doc_id FROM documents, mx WHERE doc_id * 5 >= (mx + 1) * 4) d
       |LEFT JOIN best ON d.doc_id = best.b_id
       |ORDER BY d.doc_id""".stripMargin

  val ddBandStoreSql: String = bandStoreSql(bands = 4, rowsPerBand = 4)
  val ddBandRotSql: String = bandStoreSql(bands = 8, rowsPerBand = 2)

  // ---- near-dup: simhash signature groups ----
  def ddSimhash(s: SparkSession, d: String): DataFrame =
    TextDedup.simhashGroups(Tables.documents(s, d)).orderBy("simhash")

  val ddSimhashSql: String =
    """WITH hs AS (
      |  SELECT doc_id, list_transform(tk, t -> md5(t)) AS h, len(tk) AS n
      |  FROM (SELECT doc_id,
      |          list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                      t -> len(t) > 0) AS tk
      |        FROM documents)
      |), sim AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(range(0, 16), i ->
      |      CASE WHEN 2 * len(list_filter(h,
      |             x -> x[i+1:i+1] IN ('8','9','a','b','c','d','e','f'))) >= n
      |           THEN CAST(round(2 ** i) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
      |  FROM hs
      |)
      |SELECT simhash, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS min_doc_id
      |FROM sim GROUP BY 1 HAVING count(*) > 1 ORDER BY simhash""".stripMargin

  // ---- dedup clustering: connected components over cheap pair sources ----
  // Edges: same exact fingerprint OR same simhash16 — both pure
  // projections, safe to recompute across the CC rounds (the operator's
  // documented contract). Transitivity: A exact-dup B, B simhash-near C
  // ⇒ {A,B,C} one cluster, one canonical keeper (min doc_id).
  def ddCluster(s: SparkSession, d: String): DataFrame =
    clusterDerived(s, d, salt = None).sortWithinPartitions("doc_id")

  // Content-addressed CC: both edge keys (fingerprint, simhash16) are
  // content-pure, so the component structure lives at CONTENT level —
  // star edges link content-min ids, the fixpoint runs over the
  // content graph, and member documents attach through the membership
  // frame afterwards. Equivalence: documents of one content share the
  // fingerprint, so they are one component with their content-min, and a
  // component's label (min doc id) is the min over its content mins.
  // Membership in the OUTPUT (naive: every doc appearing in any pair)
  // re-weights by replica mass: a content participates when one of its
  // key groups has >= 2 DOCUMENTS — which includes a single content with
  // G >= 2 (its replicas pair with each other) that contributes no
  // content-level edge at all, so participation is tracked separately
  // from the edge list. This also fixes a latent flood fragility: the
  // naive star build collect_listed member DOCS per key (a
  // billion-replica boilerplate key = a billion-element array in one
  // row); content-level lists are bounded by genuine near-dup structure.
  // STAR pair generation, not all-pairs: connectivity only needs each
  // group member linked to the group's min id — g-1 edges per group.
  private[graft] def clusterDerived(s: SparkSession, d: String,
                                    salt: Option[org.apache.spark.sql.Column],
                                    cc: DataFrame => DataFrame =
                                      // star pairs are strictly a < b, and
                                      // participants coalesce missing labels
                                      // — the ccOverEdges contract
                                      TextDedup.ccOverEdges(_)): DataFrame = {
    val docs = Tables.documents(s, d)
    val H = graft.operators.Content.H
    val Gc = graft.operators.Content.G
    val members = docs.select(col("doc_id"),
      graft.operators.Content.memberKey(docs, Seq("text"), salt).as(H))
    val contents = graft.operators.Content.repsById(docs, Seq("text"), salt = salt)
      .select(col(H), col(Gc), col("doc_id"), col("text"))
    val fp = contents.select(col("doc_id"), col(Gc),
      TextFns.fingerprint(col("text")).as("k"))
    val sh = contents
      .select(col("doc_id"), col(Gc),
        transform(TextFns.tokens(col("text")), t => md5(t)).as("h"))
      .select(col("doc_id"), col(Gc),
        TextFns.simhash16FromHashes(col("h")).cast("string").as("k"))
    def grouped(keyed: DataFrame): DataFrame =
      keyed.groupBy("k")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"),
          sum(Gc).as("nd"))
        .filter(col("nd") >= 2)
    def pairsOf(g: DataFrame): DataFrame =
      g.filter(size(col("ids")) >= 2)
        .select(explode(TextDedup.expandStarPairs(col("ids"),
          (a, b) => struct(a.as("doc_a"), b.as("doc_b")))).as("p"))
        .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
    val gFp = grouped(fp)
    val gSh = grouped(sh)
    val pairs = pairsOf(gFp).union(pairsOf(gSh)).distinct()
    // every content-min in a >= 2-doc key group is in the output, even
    // when its group contributed no content-level edge
    val participants = gFp.select(explode(col("ids")).as("doc_id"))
      .union(gSh.select(explode(col("ids")).as("doc_id"))).distinct()
    val labels = participants
      .join(cc(pairs), Seq("doc_id"), "left")
      .select(col("doc_id").as("rep_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    members
      .join(contents.select(col(H), col("doc_id").as("rep_id")), H)
      .join(labels, "rep_id")
      .select(col("doc_id"), col("cluster_id"))
  }

  /** INCREMENTAL clustering — `dd_cluster` served without ever re-running
    * connected components over the historical edge set: pairs entirely
    * among the first-80% docs are the "historical" graph whose labels
    * are the PERSISTED artifact (staged once per session/dataset, the
    * `dd_incremental` index doctrine — repeats measure the FOLD); the
    * pairs touching last-20% docs arrive as the batch and fold into
    * those labels via [[TextDedup.foldIntoComponents]] at O(batch).
    * The oracle is the full recompute over ALL pairs (the dd_cluster
    * recursive CTE verbatim): fold ≡ recompute, gated end to end.
    */
  def ddClusterIncr(s: SparkSession, d: String): DataFrame =
    clusterDerived(s, d, salt = None, cc = pairs => {
      // stage the derived pair list once — the old/new split reads it
      // twice, and the historical-CC branch must hash the same rows
      // across sessions
      val staged = graft.Scratch.stagedFrame(s,
        "graft_ccincr_pairs_" + graft.Scratch.digest(d))(pairs)
      val mx = Tables.documents(s, d).agg(max("doc_id").as("mx"))
      val pb = staged.crossJoin(broadcast(mx))
      val isOld = col("doc_a") * 5 < (col("mx") + 1) * 4 &&
        col("doc_b") * 5 < (col("mx") + 1) * 4
      val hist = graft.Scratch.stagedFrame(s,
        "graft_ccincr_labels_" + graft.Scratch.digest(d)) {
        TextDedup.ccOverEdges(
          pb.filter(isOld).select("doc_a", "doc_b"))
      }
      TextDedup.foldIntoComponents(hist,
        pb.filter(!isOld).select("doc_a", "doc_b"))
    }).sortWithinPartitions("doc_id")

  /** RIGHT-TO-FORGET through persisted cluster labels — the lifecycle
    * step [[ddClusterIncr]] left open: `dd_cluster_incr` absorbs ADDED
    * pairs at O(batch), both index stores forget keys durably, but a
    * GDPR delete against the LABEL table was unhandled (a forgotten
    * cluster-min stales every member's label; a forgotten bridge doc
    * must SPLIT its component). Persisted artifacts, staged once per
    * (session, dataset) like dd_cluster_incr's: the full label table
    * and the edge GENERATOR (the doc-level (doc_id, key) table — see
    * [[TextDedup.deleteFromComponentsKeyed]] for why a sparse pair
    * WITNESS is not deletion-stable and the generator is the honest
    * linear-size artifact). The measured pass tombstones `doc_id % 7 =
    * 3`, recomputes components ONLY over the affected clusters'
    * restricted key groups, and passes every untouched cluster through.
    * Oracle: the dd_cluster recursive CTE run as a FULL RECOMPUTE over
    * live ∖ forgotten — delete ≡ recompute, gated end to end.
    */
  def ddClusterDel(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val labels = graft.Scratch.stagedFrame(s,
      "graft_ccdel_labels_" + graft.Scratch.digest(d)) {
      clusterDerived(s, d, salt = None)
    }
    val keyed = graft.Scratch.stagedFrame(s,
      "graft_ccdel_keyed_" + graft.Scratch.digest(d)) {
      // content-addressed artifact BUILD (keys are content-pure: compute
      // once per distinct text, attach members through the membership
      // frame); the TABLE is doc-level because deletes arrive per doc.
      // Key spaces are prefixed so the union can never alias a
      // fingerprint group into a simhash group.
      val H = graft.operators.Content.H
      val members = docs.select(col("doc_id"),
        graft.operators.Content.memberKey(docs, Seq("text")).as(H))
      val contents = graft.operators.Content.repsById(docs, Seq("text"))
        .select(col(H), col("text"))
      val fp = contents.select(col(H),
        concat(lit("fp|"), TextFns.fingerprint(col("text"))).as("k"))
      val sh = contents
        .select(col(H), transform(TextFns.tokens(col("text")), t => md5(t)).as("h"))
        .select(col(H), concat(lit("sh|"),
          TextFns.simhash16FromHashes(col("h")).cast("string")).as("k"))
      members.join(fp.unionByName(sh), H).select("doc_id", "k")
    }
    val forget = docs.select("doc_id").filter(col("doc_id") % 7 === 3)
    TextDedup.deleteFromComponentsKeyed(labels, keyed, forget)
      .sortWithinPartitions("doc_id")
  }

  /** Per-document quality sidecar (the txt_stats quality column alone),
    * content-addressed: the tokenize + sub-score stack runs once per
    * distinct text. At corpus scale this is the stats table every
    * pipeline already materializes — pipe_dedup_incr stages it as one
    * of its persisted artifacts.
    */
  private def docQuality(docs: DataFrame): DataFrame =
    graft.operators.Content.perContent(docs, Seq("text")) { reps =>
      val H = graft.operators.Content.H
      reps.select(col(H), col("text"), TextFns.tokens(col("text")).as("tk"))
        .select(col(H),
          TextFns.qualityScoreFromTokens(col("tk"), col("text"), Stopwords)
            .as("quality"))
    }.select("doc_id", "quality")

  /** Per-cluster keeper decision over a (doc_id, cluster_id) membership
    * frame and a (doc_id, quality) sidecar: highest quality wins, ties
    * to the lowest doc_id — the dd_keep_best policy lifted from
    * fingerprint groups to near-dup clusters. One groupBy, no window:
    * the (quality, -doc_id) struct-max is an ordinary partial-aggregable
    * function, so the keeper of a 10⁸-member cluster costs a map-side
    * combine, never a single-task sort.
    */
  private def clusterKeepers(members: DataFrame, quality: DataFrame): DataFrame =
    members.join(quality, "doc_id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        max(struct(col("quality").as("q"), (-col("doc_id")).as("nid"))).as("b"))
      .select(col("cluster_id"), col("n_docs"),
        (-col("b.nid")).cast("long").as("keep_doc_id"),
        round(col("b.q"), 2).as("keep_quality"))

  /** THE DAILY ROW: the end-to-end incremental dedup pipeline a
    * production corpus runs per ingest batch, composed from the
    * separately-certified pieces as ONE lazy DAG inside one
    * oracle-checked query (the pipe_curate treatment). Persisted
    * artifacts — staged once per (session, dataset), the
    * dd_incremental/dd_cluster_incr doctrine: the corpus band index,
    * the corpus cluster labels, the per-doc quality sidecar, and the
    * per-cluster keeper table. The measured pass is the batch fold:
    *
    *   new batch (last-20% docs)
    *     → band-store probe  (ALL fresh batch↔corpus pairs —
    *       [[TextDedup.incrementalMatchPairs]]; best-match-only would
    *       silently drop cluster merges a batch doc bridges)
    *     → batch-internal LSH pairs (the probe's documented blind spot)
    *     → [[TextDedup.foldIntoComponents]] at O(batch)
    *     → keeper update for TOUCHED clusters only (hist keepers of
    *       untouched clusters pass through byte-identical)
    *
    * Oracle: ONE-SHOT recompute — banded LSH pairs over the full
    * corpus∪batch, recursive-CTE connected components, keeper per
    * cluster — so fold-plus-keeper-update ≡ rebuild is gated end to
    * end. Exactness of the pair split: the probe emits exactly the
    * batch↔corpus slice of the full banded self-join, minhashLshPairs
    * emits exactly the within-side slices, so hist ∪ fresh IS the full
    * pair set and the fold contract does the rest.
    */
  def pipeDedupIncr(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val mx = docs.agg(max("doc_id").as("mx"))
    val dd = docs.crossJoin(broadcast(mx))
    val corpus = dd.filter(col("doc_id") * 5 < (col("mx") + 1) * 4)
      .select("doc_id", "text")
    val batch = dd.filter(col("doc_id") * 5 >= (col("mx") + 1) * 4)
      .select("doc_id", "text")
    val key = graft.Scratch.digest(d)
    val idx = graft.Scratch.stagedFrame(s, "graft_pipedd_idx_" + key) {
      TextDedup.minhashBandIndex(corpus, shingleN = 2, bands = 4, rowsPerBand = 4)
    }
    val histLabels = graft.Scratch.stagedFrame(s, "graft_pipedd_labels_" + key) {
      TextDedup.ccOverEdges(
        TextDedup.minhashLshPairs(corpus, 2, 4, 4, minEst = 0.25)
          .select("doc_a", "doc_b"))
    }
    val histQuality = graft.Scratch.stagedFrame(s, "graft_pipedd_q_" + key) {
      docQuality(corpus)
    }
    val histKeepers = graft.Scratch.stagedFrame(s, "graft_pipedd_keep_" + key) {
      clusterKeepers(histLabels, histQuality)
    }
    // ---- the daily pass ----
    val scratch = graft.Scratch.dir(s, "graft_pipedd_run_")
    // ONE collapse + ONE signing of the batch serves BOTH fresh-pair
    // legs (optimization r14, guide §1.2/§2.3): the first shipped
    // version signed every batch doc for the corpus probe
    // (incrementalMatchPairs) and then collapsed + re-signed the reps
    // for the batch-internal LSH (minhashLshPairs). Signatures are
    // functions of the normalized text, so replicas share their rep's
    // signature verbatim: the probe's (b, c) verdicts are the rep
    // verdicts expanded through membership (distinct at rep grain ⇒
    // distinct at doc grain — each doc has exactly one rep), and the
    // batch-internal pairs are the intra ∪ expanded-cross composition
    // minhashLshPairs documents. Output row set is identical (oracle
    // re-gated); the batch is tokenized/hashed once instead of twice.
    val bg = graft.Scratch.writeRead(batch
      .select(col("doc_id"), col("text"),
        TextFns.fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("rep_id"),
        min_by(col("text"), col("doc_id")).as("text"),
        sort_array(collect_list(col("doc_id"))).as("members"))
      // explicit-count respread before the signing projection — AQE
      // coalesces the tiny collapse exchange to one partition and would
      // serialize the per-rep hash work (see ddBandRecall's note)
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt,
        col("rep_id"))
      .select(col("rep_id"), col("members"), TextFns.tokens(col("text")).as("tk"))
      .select(col("rep_id"), col("members"), TextFns.shingles(col("tk"), 2).as("sh"))
      .select(col("rep_id"), col("members"),
        TextFns.minhashSignature(col("sh"), 16).as("sig")),
      s"$scratch/bgroups")
    // rep-grain band index — minhashBandIndex's (band, band_hash) shape
    // over the staged signature
    val bIdx = bg.select(col("rep_id").as("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(3)),
          bb => md5(array_join(slice(col("sig"), bb * lit(4) + 1, lit(4)), ",")))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val mm = bg.select(col("rep_id"), col("members"))
    // corpus probe at rep grain (incrementalMatchPairs' join + est
    // algebra verbatim), expanded through batch membership
    val probePairs = bIdx
      .select(col("band"), col("band_hash"),
        col("doc_id").as("b_rep"), col("sig").as("b_sig"))
      .join(idx.select(col("band"), col("band_hash"),
        col("doc_id").as("c_id"), col("sig").as("c_sig")),
        Seq("band", "band_hash"))
      .select(col("b_rep"), col("c_id"),
        (size(filter(zip_with(col("b_sig"), col("c_sig"), (p, q) => p === q),
          eq => eq)).cast("double") / 16).as("est"))
      .distinct() // same pair can collide in several bands
      .filter(col("est") >= 0.25)
      .join(mm.toDF("b_rep", "members"), "b_rep")
      .select(explode(col("members")).as("doc_a"), col("c_id").as("doc_b"))
    // batch-internal pairs: bucket self-join over the same rep index
    // (bandBucketPairs' algebra), intra + cross expanded — the
    // minhashLshPairs composition over the shared signatures
    val repPairs = bIdx
      .groupBy("band", "band_hash")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig")))).as("ms"))
      .filter(size(col("ms")) >= 2)
      .select(explode(TextDedup.expandSortedPairs(col("ms"), (x, y) =>
        struct(
          x("doc_id").as("doc_a"),
          y("doc_id").as("doc_b"),
          (size(filter(zip_with(x("sig"), y("sig"), (p, q) => p === q),
            eq => eq)).cast("double") / 16).as("est")))).as("pr"))
      .select(col("pr.doc_a").as("doc_a"), col("pr.doc_b").as("doc_b"),
        col("pr.est").as("est"))
      .distinct()
      .filter(col("est") >= 0.25)
    val crossPairs = repPairs
      .join(mm.toDF("doc_a", "ma"), "doc_a")
      .join(mm.toDF("doc_b", "mb"), "doc_b")
      .select(explode(flatten(transform(col("ma"), x =>
        transform(col("mb"), y =>
          struct(least(x, y).as("doc_a"), greatest(x, y).as("doc_b")))))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
    val intraPairs = bg.filter(size(col("members")) >= 2)
      .select(explode(TextDedup.expandSortedPairs(col("members"), (x, y) =>
        struct(x.as("doc_a"), y.as("doc_b")))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
    // fresh pairs staged once: the fold, the endpoint set, and the
    // touched-cluster derivation all read this small batch-bounded file
    val fresh = graft.Scratch.writeRead(
      probePairs
        .unionByName(intraPairs)
        .unionByName(crossPairs), s"$scratch/fresh")
    val folded = graft.Scratch.writeRead(
      graft.operators.TextDedup.foldIntoComponents(histLabels, fresh),
      s"$scratch/folded")
    val ends = fresh.select(col("doc_a").as("doc_id"))
      .unionByName(fresh.select(col("doc_b").as("doc_id"))).distinct()
    // touched = clusters holding a fresh endpoint: their NEW labels name
    // the recompute set, their OLD labels name the keeper rows to retire
    val touchedNew = folded.join(ends, Seq("doc_id"), "left_semi")
      .select("cluster_id").distinct()
    val touchedOld = histLabels.join(ends, Seq("doc_id"), "left_semi")
      .select("cluster_id").distinct()
    val untouched = histKeepers.join(touchedOld, Seq("cluster_id"), "left_anti")
    val touchedMembers = folded.join(touchedNew, Seq("cluster_id"), "left_semi")
    // batch docs score fresh (batch-bounded); corpus members read the
    // staged sidecar — quality is never recomputed for old documents
    val qual = histQuality.unionByName(docQuality(batch))
    untouched.unionByName(clusterKeepers(touchedMembers, qual))
      .sortWithinPartitions("cluster_id")
  }

  val pipeDedupIncrSql: String =
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id,
      |         CASE WHEN len(tk) >= 2
      |           THEN list_transform(range(1, len(tk)),
      |                               i -> array_to_string(tk[i:i+1], ' '))
      |           ELSE [array_to_string(tk, ' ')] END AS s
      |  FROM (SELECT doc_id,
      |          list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                      t -> len(t) > 0) AS tk
      |        FROM documents)
      |), sig AS (
      |  SELECT doc_id,
      |         list_transform(range(0, 16),
      |           j -> list_min(list_transform(s, x -> md5(j || ':' || x)))) AS sg
      |  FROM sh
      |), banded AS (
      |  SELECT doc_id, sg, b AS band,
      |         md5(array_to_string(sg[b*4+1 : b*4+4], ',')) AS band_hash
      |  FROM sig, (SELECT unnest(range(0, 4)) AS b)
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         list_sum(list_transform(range(1, 17),
      |           i -> CASE WHEN a.sg[i] = b.sg[i] THEN 1 ELSE 0 END)) / 16.0 AS est
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.band_hash = b.band_hash
      |   AND a.doc_id < b.doc_id
      |), pairs AS (
      |  SELECT doc_a, doc_b FROM cand WHERE est >= 0.25
      |), nodes AS (
      |  SELECT DISTINCT doc_id
      |  FROM (SELECT doc_a AS doc_id FROM pairs
      |        UNION ALL SELECT doc_b FROM pairs)
      |), edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs
      |), walk(node, label) AS (
      |  SELECT doc_id, doc_id FROM nodes
      |  UNION
      |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
      |), labels AS (
      |  SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node
      |), toks AS (
      |  SELECT doc_id, text,
      |         list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                     t -> len(t) > 0) AS tk
      |  FROM documents
      |), scored AS (
      |  SELECT doc_id,
      |         round((CASE WHEN len(tk) BETWEEN 10 AND 100000 THEN 0.25 ELSE 0.0 END) +
      |               (CASE WHEN len(tk) > 0 AND
      |                  len(list_filter(tk, t -> t IN ('the','a','of','and','to','in','is')))::DOUBLE
      |                    / len(tk) > 0.01 THEN 0.25 ELSE 0.0 END) +
      |               (CASE WHEN (CASE WHEN len(text) > 0 THEN
      |                  (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
      |                    / len(text) ELSE 0.0 END) < 0.2 THEN 0.25 ELSE 0.0 END) +
      |               (CASE WHEN len(tk) > 0 AND
      |                  CAST(list_sum(list_transform(tk, t -> len(t))) AS DOUBLE) / len(tk)
      |                    BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END), 2) AS quality
      |  FROM toks
      |), ranked AS (
      |  SELECT l.cluster_id, l.doc_id, s.quality,
      |         row_number() OVER (PARTITION BY l.cluster_id
      |                            ORDER BY s.quality DESC, l.doc_id) AS rk
      |  FROM labels l JOIN scored s ON l.doc_id = s.doc_id
      |)
      |SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(max(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS keep_doc_id,
      |       max(CASE WHEN rk = 1 THEN quality END) AS keep_quality
      |FROM ranked GROUP BY cluster_id ORDER BY cluster_id""".stripMargin

  /** The dd_cluster recursive-CTE oracle parameterized over the source
    * predicate — `""` is the full corpus (dd_cluster / dd_cluster_incr),
    * and the right-to-forget row runs it over live ∖ forgotten, so the
    * delete pass is gated against a genuine FULL RECOMPUTE on the
    * surviving documents (the dd_cluster_incr doctrine inverted).
    */
  private def clusterSqlOver(where: String): String =
    s"""WITH RECURSIVE hs AS (
      |  SELECT doc_id, text, list_transform(tk, t -> md5(t)) AS h, len(tk) AS n
      |  FROM (SELECT doc_id, text,
      |          list_filter(string_split_regex(lower(trim(text)), '\\s+'),
      |                      t -> len(t) > 0) AS tk
      |        FROM documents$where)
      |), keyed AS (
      |  SELECT doc_id,
      |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
      |    CAST(CAST(list_sum(list_transform(range(0, 16), i ->
      |      CASE WHEN 2 * len(list_filter(h,
      |             x -> x[i+1:i+1] IN ('8','9','a','b','c','d','e','f'))) >= n
      |           THEN CAST(round(2 ** i) AS BIGINT) ELSE 0 END)) AS BIGINT)
      |      AS VARCHAR) AS sh
      |  FROM hs
      |), pairs AS (
      |  SELECT mn AS doc_a, doc_id AS doc_b FROM (
      |    SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS mn FROM keyed)
      |  WHERE doc_id > mn
      |  UNION
      |  SELECT mn, doc_id FROM (
      |    SELECT doc_id, min(doc_id) OVER (PARTITION BY sh) AS mn FROM keyed)
      |  WHERE doc_id > mn
      |), nodes AS (
      |  SELECT DISTINCT doc_id
      |  FROM (SELECT doc_a AS doc_id FROM pairs
      |        UNION ALL SELECT doc_b FROM pairs)
      |), edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs
      |), walk(node, label) AS (
      |  SELECT doc_id, doc_id FROM nodes
      |  UNION
      |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
      |)
      |SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id
      |FROM walk GROUP BY node ORDER BY doc_id""".stripMargin

  val ddClusterSql: String = clusterSqlOver("")
  val ddClusterDelSql: String = clusterSqlOver(" WHERE doc_id % 7 <> 3")

  // ---- keeper policy: best-quality doc per exact-dup group ----
  // the decision step after detection: within each fingerprint group keep
  // the highest-quality document (ties: lowest doc_id) — one window over
  // one shuffle-by-fingerprint; quality is the same heuristic txt_stats
  // publishes, so keep decisions are explainable from the stats table
  def ddKeepBest(s: SparkSession, d: String): DataFrame =
    keepBestDerived(s, d, salt = None).sortWithinPartitions("fp")

  // Content-addressed (Content.repsById): quality and fingerprint are
  // content-pure, so the keeper rank runs over CONTENTS. Equivalence to
  // the per-doc rank: within one content, the min doc_id beats its
  // replicas on the (quality desc, doc_id) order, so the winning content's
  // min member IS the winning document, and cross-content ties resolve by
  // min-of-mins exactly as by min-over-docs. tokens staged once
  // (qualityScore's sub-scores would otherwise each re-tokenize — no CSE
  // across projection expressions).
  private[graft] def keepBestDerived(s: SparkSession, d: String,
                                     salt: Option[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy("fp").orderBy(desc("quality"), col("doc_id"))
    graft.operators.Content.repsById(Tables.documents(s, d), Seq("text"), salt = salt)
      .select(col("doc_id"), col("text"), TextFns.tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        TextFns.fingerprint(col("text")).as("fp"),
        TextFns.qualityScoreFromTokens(col("tk"), col("text"), Stopwords).as("quality"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("fp"), col("doc_id").as("keep_doc_id"), col("quality"))
  }

  val ddKeepBestSql: String =
    """WITH toks AS (
      |  SELECT doc_id, text,
      |         list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                     t -> len(t) > 0) AS tk
      |  FROM documents
      |), scored AS (
      |  SELECT doc_id,
      |         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
      |         round((CASE WHEN len(tk) BETWEEN 10 AND 100000 THEN 0.25 ELSE 0.0 END) +
      |               (CASE WHEN len(tk) > 0 AND
      |                  len(list_filter(tk, t -> t IN ('the','a','of','and','to','in','is')))::DOUBLE
      |                    / len(tk) > 0.01 THEN 0.25 ELSE 0.0 END) +
      |               (CASE WHEN (CASE WHEN len(text) > 0 THEN
      |                  (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
      |                    / len(text) ELSE 0.0 END) < 0.2 THEN 0.25 ELSE 0.0 END) +
      |               (CASE WHEN len(tk) > 0 AND
      |                  CAST(list_sum(list_transform(tk, t -> len(t))) AS DOUBLE) / len(tk)
      |                    BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END), 2) AS quality
      |  FROM toks
      |)
      |SELECT fp, keep_doc_id, quality FROM (
      |  SELECT fp, doc_id AS keep_doc_id, quality,
      |         row_number() OVER (PARTITION BY fp
      |           ORDER BY quality DESC, doc_id) AS rk
      |  FROM scored)
      |WHERE rk = 1 ORDER BY fp""".stripMargin

  // ---- deterministic hash sampling (reproducible corpus subsetting) ----
  // md5-prefix gate: both engines hash identically, so the sample is the
  // same rows everywhere — no RNG, no seed drift, filter pushes to the
  // scan. '18' keeps 0x00..0x18 of 256 two-hex-digit prefixes (~9.8 %).
  def dsSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) <= "18")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")

  val dsSampleSql: String =
    """SELECT doc_id, lang, n_chars FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '18'
      |ORDER BY doc_id""".stripMargin

  // ---- stratified sampling: deterministic per-language quota ----
  // skew-safe: a per-stratum hash threshold (from the broadcast stratum
  // counts) prunes each language to ~8×20 expected survivors BEFORE the
  // rank window, so no single-task full-stratum sort exists at any scale
  // (see operators/Sampling). The oracle mirrors the threshold logic
  // exactly, so both engines agree even in the astronomically-unlikely
  // case a huge stratum survives with < 20 rows.
  def dsStratified(s: SparkSession, d: String): DataFrame =
    graft.operators.Sampling.stratifiedTopK(
        Tables.documents(s, d), "lang",
        md5(concat(lit("strat|"), col("doc_id").cast("string"))),
        Seq(col("doc_id")), k = 20)
      .select(col("doc_id"), col("lang"), col("rk").cast("long").as("rk"))
      .orderBy("lang", "rk")

  val dsStratifiedSql: String =
    """WITH thr AS (
      |  SELECT lang,
      |         printf('%08x', least(4294967295,
      |           CAST(floor(least(1.0, 160.0 / count(*)) * 4294967296.0) AS BIGINT)))
      |           AS t
      |  FROM documents GROUP BY lang
      |), kept AS (
      |  SELECT d.doc_id, d.lang,
      |         md5('strat|' || CAST(d.doc_id AS VARCHAR)) AS key
      |  FROM documents d JOIN thr ON d.lang = thr.lang
      |  WHERE substr(md5('strat|' || CAST(d.doc_id AS VARCHAR)), 1, 8) <= thr.t
      |)
      |SELECT doc_id, lang, rk FROM (
      |  SELECT doc_id, lang,
      |         CAST(row_number() OVER (PARTITION BY lang ORDER BY key, doc_id)
      |           AS BIGINT) AS rk
      |  FROM kept)
      |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin

  // ---- deterministic train/val/test split ----
  // the corpus-assignment step every training pipeline needs: a keyed
  // md5 prefix gates each doc into train (~80 %), val (~10 %), test
  // (~10 %) — reproducible on any engine, no RNG, and a doc never
  // migrates between splits when the corpus grows (assignment depends
  // only on its own id). Pure projection + one tiny aggregate.
  def dsSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("h",
        substring(md5(concat(lit("split|"), col("doc_id").cast("string"))), 1, 2))
      .withColumn("split",
        when(col("h") < "cd", "train").when(col("h") < "e6", "val")
          .otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("sum_chars"))
      .orderBy("split")

  val dsSplitSql: String =
    """SELECT CASE WHEN h < 'cd' THEN 'train'
      |            WHEN h < 'e6' THEN 'val' ELSE 'test' END AS split,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM (SELECT n_chars,
      |        substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) AS h
      |      FROM documents)
      |GROUP BY 1 ORDER BY split""".stripMargin

  // ---- deterministic training-order shuffle + shard assignment ----
  // the global-shuffle step every training pipeline runs before writing
  // shards, WITHOUT an RNG: the order key is a seed-keyed md5 over the
  // doc id, the shard is the key's 48-bit prefix mod ShufShards (the
  // sk_kmv hex parse, so both engines read the same integer), and the
  // within-shard position is a row_number over the order key. Reproducible
  // on any engine, and stable under corpus growth in the only sense a
  // hash shuffle can be: a doc's shard and its order RELATIVE to any
  // surviving doc never change — but NOT stable in the shard COUNT
  // (re-sharding with a different `spark.graft.shards` changes every
  // assignment; pick the count once per corpus generation). Scale shape:
  // pure projection + ONE hash shuffle by shard + a per-shard sort (set
  // `spark.graft.shards` to thousands at 100 TB so no shard is a
  // single-task sort; default 8 = the static oracle SQL) — never a
  // global single-partition row_number.
  private val ShufShardsDefault = 8
  def dsShuffle(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(concat(lit("shuf|"), col("doc_id").cast("string"))).as("h"))
      .withColumn("shard", Approx.hex48(col("h")) % Curation.shardN(s))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "pos")
      .sortWithinPartitions("shard", "pos")
  }

  val dsShuffleSql: String = {
    val hex48 = Approx.hex48Sql("h")
    s"""WITH k AS (
       |  SELECT doc_id, md5('shuf|' || CAST(doc_id AS VARCHAR)) AS h
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, h, mod($hex48, $ShufShardsDefault) AS shard FROM k
       |)
       |SELECT doc_id, shard,
       |       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
       |            AS BIGINT) AS pos
       |FROM sh ORDER BY shard, pos""".stripMargin
  }

  // ---- token-budget packing (context-window bin assignment) ----
  // greedy sequence packing for LLM training: docs are packed in doc_id
  // order into 4096-char bins per language via a running total — bin =
  // (cumsum − own) div budget. Packing is inherently sequential in VALUE,
  // but the prefix sum that drives it is not sequential in EXECUTION:
  // a per-lang `rows unbounded preceding` window would make the biggest
  // language ONE task sorting and scanning ~half the corpus at 100 TB,
  // so the running total comes from [[packCumsum]] — a fixed-depth
  // chunked prefix-sum tree with carry-in (the ev_concurrency day-carry
  // idiom, nested), bit-identical to the flat window.
  private[graft] val PackChunkW = 256L

  /** Exact per-`lang` running total of `valueCol` in `doc_id` order,
    * scale-safe at every level: a depth-3 chunk tree over
    * `doc_id div 256^k`. Each (lang, chunk) computes its LOCAL prefix
    * sum in a ≤256-row window partition; per-chunk totals roll up twice
    * more, so the two mid carry windows are ≤256 rows as well
    * ((lang, chunk2) over chunks, (lang, chunk3) over chunk2s) and the
    * only language-wide window left runs over chunk3 — corpus/256³ rows
    * (~600 at the 10¹⁰-doc design point; ≈ one executor page at any
    * plausible corpus). cum = local + within-parent + parent +
    * grandparent carries. No forced broadcast anywhere: carry tables
    * shrink 256× per level, and the planner picks broadcast exactly when
    * a level is actually small — at the 100 TB point the level-1 carry
    * (corpus/256 rows) rides the same (lang, chunk) shuffle the local
    * window already paid for, instead of a driver collect+ship.
    *
    * `lang` joins are NULL-SAFE (`<=>`): a null lang is its own window
    * partition in both Spark and the DuckDB oracle's flat window, and it
    * must stay one through the carry joins — plain equality would
    * silently drop null-lang rows. Same per-lang doc_id order as the
    * flat window (every chunk level is monotone in doc_id), same exact
    * sums — only the execution shape changes. Input must carry
    * (doc_id, lang, valueCol) with non-null doc_id.
    */
  private[graft] def packCumsum(df: DataFrame, valueCol: String): DataFrame = {
    val W = PackChunkW
    val chunked = df.withColumn("chunk", expr(s"doc_id div $W"))
    val wLocal = Window.partitionBy("lang", "chunk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // level 1: one row per (lang, chunk); exclusive prefix of chunk
    // totals WITHIN the 256-chunk parent group (bounded window)
    val t1 = chunked.groupBy("lang", "chunk")
      .agg(sum(valueCol).as("ctot1"))
      .withColumn("chunk2", expr(s"chunk div $W"))
    val w1 = Window.partitionBy("lang", "chunk2").orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val c1 = t1.withColumn("e1", coalesce(sum("ctot1").over(w1), lit(0L)))

    // level 2: one row per (lang, chunk2); exclusive prefix within the
    // 256-chunk2 grandparent group (bounded window)
    val t2 = t1.groupBy("lang", "chunk2").agg(sum("ctot1").as("ctot2"))
      .withColumn("chunk3", expr(s"chunk2 div $W"))
    val w2 = Window.partitionBy("lang", "chunk3").orderBy("chunk2")
      .rowsBetween(Window.unboundedPreceding, -1)
    val c2 = t2.withColumn("e2", coalesce(sum("ctot2").over(w2), lit(0L)))
      .select(col("lang").as("lang2"), col("chunk2").as("c2key"), col("e2"))

    // level 3: one row per (lang, chunk3) — corpus/256³; the one
    // language-spanning window, over the maximally-reduced key
    val t3 = t2.groupBy("lang", "chunk3").agg(sum("ctot2").as("ctot3"))
    val w3 = Window.partitionBy("lang").orderBy("chunk3")
      .rowsBetween(Window.unboundedPreceding, -1)
    val c3 = t3.withColumn("e3", coalesce(sum("ctot3").over(w3), lit(0L)))
      .select(col("lang").as("lang3"), col("chunk3").as("c3key"), col("e3"))

    // carry per (lang, chunk) = within-parent + parent + grandparent
    val carries = c1
      .join(c2, col("lang") <=> col("lang2") && col("chunk2") === col("c2key"))
      .join(c3, col("lang") <=> col("lang3")
        && expr(s"chunk2 div $W") === col("c3key"))
      .select(col("lang").as("langK"), col("chunk").as("chunkK"),
        (col("e1") + col("e2") + col("e3")).as("carry"))

    chunked
      .withColumn("local", sum(valueCol).over(wLocal))
      .join(carries,
        col("lang") <=> col("langK") && col("chunk") === col("chunkK"))
      .withColumn("cum", col("carry") + col("local"))
      .drop("chunk", "local", "carry", "langK", "chunkK")
  }

  def dsPack(s: SparkSession, d: String): DataFrame =
    packCumsum(Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
        "n_chars")
      .withColumn("bin", expr("(cum - n_chars) div 4096"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("chars"))
      .orderBy("lang", "bin")

  val dsPackSql: String =
    """WITH c AS (
      |  SELECT lang, n_chars,
      |         sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
      |                            ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM documents
      |)
      |SELECT lang, CAST((cum - n_chars) // 4096 AS BIGINT) AS bin,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM c GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin

  // ---- vocabulary: global token frequencies, top-k ----
  // classic wordcount: explode is a narrow map, the groupBy partial-
  // aggregates map-side so the shuffle carries (token, partial_count),
  // top-k ties broken by token for a total order
  def vocabTopk(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(TextFns.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("token")).limit(50)

  val vocabTopkSql: String =
    """SELECT token, CAST(count(*) AS BIGINT) AS freq FROM (
      |  SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                            t -> len(t) > 0)) AS token
      |  FROM documents)
      |GROUP BY token ORDER BY freq DESC, token LIMIT 50""".stripMargin

  // ---- context-window chunking (LLM training prep) ----
  // overlapping token windows: chunkSize=50 tokens, stride=40 (10-token
  // overlap). Pure projection + generator explode — a narrow map at any
  // scale; the token array is projected once (HOF no-CSE) and each window
  // is a slice of it.
  // Content-addressed (Content.perContent): tokenize + chunk-slice once
  // per distinct text; the re-expansion join fans each rep's chunk rows
  // out to its documents (output-sized — chunk volume is inherent).
  def txtChunks(s: SparkSession, d: String): DataFrame =
    chunksDerived(s, d, salt = None).sortWithinPartitions("doc_id", "chunk_no")

  private[graft] def chunksDerived(s: SparkSession, d: String,
                                     salt: Option[org.apache.spark.sql.Column]): DataFrame = {
    val chunk = 50
    val stride = 40
    graft.operators.Content.perContent(
        Tables.documents(s, d), Seq("text"), salt = salt) { reps =>
      val H = graft.operators.Content.H
      reps
        .select(col(H), TextFns.tokens(col("text")).as("tk"))
        .select(col(H), posexplode(transform(
          sequence(lit(1), greatest(size(col("tk")), lit(1)), lit(stride)),
          st => struct(
            array_join(slice(col("tk"), st, lit(chunk)), " ").as("chunk_text"),
            size(slice(col("tk"), st, lit(chunk))).cast("long").as("chunk_tokens")))))
        .select(col(H), col("pos").cast("long").as("chunk_no"),
          col("col.chunk_text").as("chunk_text"),
          col("col.chunk_tokens").as("chunk_tokens"))
    }
  }

  val txtChunksSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                     t -> len(t) > 0) AS tk
      |  FROM documents
      |), ex AS (
      |  SELECT doc_id, tk,
      |         unnest(range(1, greatest(len(tk), 1) + 1, 40)) AS st
      |  FROM toks
      |)
      |SELECT doc_id, CAST((st - 1) // 40 AS BIGINT) AS chunk_no,
      |       array_to_string(tk[st : st + 49], ' ') AS chunk_text,
      |       CAST(len(tk[st : st + 49]) AS BIGINT) AS chunk_tokens
      |FROM ex ORDER BY doc_id, chunk_no""".stripMargin

  // ---- PII scrubbing (URL -> EMAIL -> long-digit-run redaction) ----
  // RE2-safe patterns shared verbatim with the oracle; ordering matters
  // (URLs contain dots and digits). Counts are taken on the RAW text.
  private val UrlPat = "https?://\\S+"
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val LongNumPat = "[0-9]{6,}"

  def txtScrub(s: SparkSession, d: String): DataFrame =
    graft.Par.sortSpread(Tables.documents(s, d), col("doc_id"))
      .select(col("doc_id"),
        md5(regexp_replace(regexp_replace(regexp_replace(col("text"),
          UrlPat, "<URL>"), EmailPat, "<EMAIL>"), LongNumPat, "<NUM>"))
          .as("scrubbed_md5"),
        size(regexp_extract_all(col("text"), lit(UrlPat), lit(0))).cast("long")
          .as("n_urls"),
        size(regexp_extract_all(col("text"), lit(EmailPat), lit(0))).cast("long")
          .as("n_emails"),
        size(regexp_extract_all(col("text"), lit(LongNumPat), lit(0))).cast("long")
          .as("n_longnums"))

  val txtScrubSql: String =
    """SELECT doc_id,
      |  md5(regexp_replace(regexp_replace(regexp_replace(text,
      |      'https?://\S+', '<URL>', 'g'),
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '[0-9]{6,}', '<NUM>', 'g')) AS scrubbed_md5,
      |  CAST(len(regexp_extract_all(text, 'https?://\S+')) AS BIGINT) AS n_urls,
      |  CAST(len(regexp_extract_all(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_longnums
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- DD: benchmark decontamination (asymmetric n-gram overlap) ----
  // The eval-set leak check every training pipeline needs: which corpus
  // documents share >= `minShared` distinct 5-gram shingles with any
  // held-out eval document. Unlike dedup (symmetric, corpus x corpus)
  // this is corpus x EVAL-SET — the eval side is benchmark-sized at any
  // corpus scale, so its exploded inverted index BROADCASTS and the
  // corpus is touched in one narrow pass (doc_id, shingle-hash), no
  // shuffle of text, no corpus self-join. Eval membership is a
  // deterministic id rule here (doc_id % 20 == 0) standing in for the
  // benchmark id list a real pipeline would broadcast.
  def ddContaminate(s: SparkSession, d: String): DataFrame =
    contaminateDerived(s, d, salt = None)
      .sortWithinPartitions("doc_id", "eval_id")

  // Content-addressed: the shingle build and the overlap count run once
  // per distinct CONTENT PAIR; (corpus doc × eval doc) rows re-expand
  // through the per-doc membership frame, which is output-sized. Eval
  // membership is a doc-id rule, so one content can have members on both
  // sides — the content-level overlap matrix therefore includes the
  // ca == cb diagonal (identical texts share every shingle), and the
  // expansion's role filters keep exactly the naive pair set. `tk` is
  // staged before the shingle lambda references it (a free expression in
  // a lambda re-evaluates per element — an inline tokenize would
  // re-split the text once per 5-gram).
  private[graft] def contaminateDerived(s: SparkSession, d: String,
                                        salt: Option[org.apache.spark.sql.Column]): DataFrame = {
    val docs = Tables.documents(s, d)
    val H = graft.operators.Content.H
    val members = docs.select(col("doc_id"),
      graft.operators.Content.memberKey(docs, Seq("text"), salt).as(H),
      (col("doc_id") % 20 === 0).as("is_eval"))
    val sh = graft.operators.Content.reps(docs, Seq("text"), salt)
      .select(col(H), TextFns.tokens(col("text")).as("tk"))
      .select(col(H),
        explode(array_distinct(TextFns.shingles(col("tk"), 5))).as("g"))
    // contents with at least one eval member — benchmark-sized at any
    // corpus scale, so its shingle index broadcasts exactly like the
    // naive shape's eval side
    val evalContents = members.filter(col("is_eval")).select(col(H)).distinct()
    val evalSh = sh.join(broadcast(evalContents), H)
      .select(col(H).as("he"), col("g"))
    val overlap = sh
      .join(broadcast(evalSh), "g")
      .groupBy(H, "he")
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= 2)
    overlap
      .join(members.filter(!col("is_eval")).select(col(H), col("doc_id")), H)
      .join(broadcast(members.filter(col("is_eval"))
        .select(col(H).as("he"), col("doc_id").as("eval_id"))), "he")
      .select("doc_id", "eval_id", "shared_ngrams")
  }

  val ddContaminateSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                             t -> len(t) > 0) AS tk
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(tk) >= 5 THEN list_transform(range(1, len(tk) - 3),
      |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4]))
      |    ELSE [array_to_string(tk, ' ')] END)) AS g
      |  FROM toks
      |)
      |SELECT c.doc_id, e.doc_id AS eval_id, CAST(count(*) AS BIGINT) AS shared_ngrams
      |FROM sh c JOIN sh e ON c.g = e.g
      |WHERE e.doc_id % 20 = 0 AND c.doc_id % 20 <> 0
      |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2""".stripMargin

  // ---- TXT: intra-document repetition score ----
  // Boilerplate/spam signal: how many of a document's trigrams are
  // repeats. Pure per-row projection (no shuffle, codegen throughout);
  // the ratio is reported in exact integer basis points — a rounded
  // double ratio would hit the cross-engine midpoint-rounding trap.
  // Content-addressed (Content.perContent): the trigram build + distinct
  // runs once per distinct text, not per copy.
  def txtRepetition(s: SparkSession, d: String): DataFrame =
    repetitionDerived(s, d, salt = None).sortWithinPartitions("doc_id")

  private[graft] def repetitionDerived(s: SparkSession, d: String,
                                         salt: Option[org.apache.spark.sql.Column]): DataFrame =
    graft.operators.Content.perContent(
        Tables.documents(s, d), Seq("text"), salt = salt) { reps =>
      val H = graft.operators.Content.H
      reps
        .select(col(H), TextFns.tokens(col("text")).as("tk"))
        .select(col(H), TextFns.shingles(col("tk"), 3).as("sh"))
        .select(col(H),
          size(col("sh")).cast("long").as("n_ngrams"),
          // distinct-count the 64-bit HASHES, not the strings:
          // array_distinct on a string array is a quadratic pairwise
          // UTF8String compare per document; on longs it's primitive
          // equality. The count is identical unless two of a document's
          // shingles collide in 64 bits (~n²/2⁶⁵ ≈ 10⁻¹⁵ for a 400-token
          // doc — the same collision-freedom the md5 fingerprint dedup
          // already stakes correctness on). Each engine hashes with its
          // own 64-bit function; only the per-doc distinct COUNT must
          // agree, never the hash values.
          size(array_distinct(transform(col("sh"), x => xxhash64(x))))
            .cast("long").as("n_distinct"))
        // shingles() never yields an empty array, so the division is safe;
        // `div` is integral division (exact, unlike `/` which goes double)
        .withColumn("rep_bp",
          expr("CAST((n_ngrams - n_distinct) * 10000 DIV n_ngrams AS BIGINT)"))
    }

  val txtRepetitionSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                             t -> len(t) > 0) AS tk
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |         CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
      |           i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
      |         ELSE [array_to_string(tk, ' ')] END AS g
      |  FROM toks
      |)
      |SELECT doc_id, n_ngrams, n_distinct,
      |       CAST((n_ngrams - n_distinct) * 10000 // n_ngrams AS BIGINT)
      |         AS rep_bp
      |FROM (SELECT doc_id,
      |        CAST(len(g) AS BIGINT) AS n_ngrams,
      |        CAST(len(list_distinct(list_transform(g, x -> hash(x))))
      |          AS BIGINT) AS n_distinct
      |      FROM sh)
      |ORDER BY doc_id""".stripMargin

  // ---- weighted importance sampling: quality-biased corpus subset ----
  // Longer documents are kept with proportionally higher probability
  // (5 bp per char, capped at certainty for ≥2000 chars) — deterministic,
  // so the curated subset is reproducible and the oracle replays the
  // exact keep set. Pure projection + filter: no shuffle at any scale.
  def dsWeighted(s: SparkSession, d: String): DataFrame = {
    val wBp = least(lit(10000L), col("n_chars").cast("long") * 5)
    graft.operators.Sampling.weightedBernoulli(
        Tables.documents(s, d), wBp,
        md5(concat(lit("wsmp|"), col("doc_id").cast("string"))))
      .select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"), wBp.as("w_bp"))
      .orderBy("doc_id")
  }

  val dsWeightedSql: String =
    """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
      |       CAST(least(10000, n_chars * 5) AS BIGINT) AS w_bp
      |FROM documents
      |WHERE substr(md5('wsmp|' || CAST(doc_id AS VARCHAR)), 1, 8) <
      |      printf('%08x', least(4294967295,
      |        CAST(floor(least(10000, n_chars * 5) * 4294967296.0 / 10000.0)
      |             AS BIGINT)))
      |ORDER BY doc_id""".stripMargin

  // ---- perplexity proxy: mean corpus frequency of a doc's bigrams ----
  // The LM-quality signal without a float log in sight: a document whose
  // bigrams are rare in the corpus (low mean frequency) is "surprising" —
  // the integer-exact stand-in for bigram-LM perplexity, so it
  // oracle-hashes (a true sum-of-log-probs would differ in the last ulp
  // across engines' libm).
  //
  // Scale shape: occurrences compress to per-(doc, bigram) counts FIRST
  // (one shuffle on the natural doc×bigram key), then the corpus total
  // per bigram is a window SUM over the already-compact frame — the
  // tokenize/explode/count pipeline runs ONCE (a self-join formulation
  // would recompute it for both sides and add a third shuffle). Hot
  // bigrams ("of the") put at most one row per document in one window
  // partition — linear, same key distribution the join would have had.
  // Content-addressed with WEIGHTED corpus counts: the corpus total for a
  // bigram is the rep-frame count times the content's replica count
  // (Content.G) — the df-reweighting move collapse-first n-gram Jaccard
  // (R99) established. Per-document outputs are identical across a
  // content group, so the tokenize/explode/count pipeline runs once per
  // distinct text.
  def txtPplProxy(s: SparkSession, d: String): DataFrame =
    pplProxyDerived(s, d, salt = None).sortWithinPartitions("doc_id")

  private[graft] def pplProxyDerived(s: SparkSession, d: String,
                                       salt: Option[org.apache.spark.sql.Column]): DataFrame =
    graft.operators.Content.perContent(
        Tables.documents(s, d), Seq("text"), salt = salt) { reps =>
      val H = graft.operators.Content.H
      val G = graft.operators.Content.G
      // tk staged before the bigram lambda references it (free expressions
      // in a lambda re-evaluate per element — an inline tokenize would
      // re-split the text once per bigram); G is constant per content, so
      // max() under the (content, bigram) groupBy just carries it
      val bgk = reps
        .select(col(H), col(G), TextFns.tokens(col("text")).as("tk"))
        .select(col(H), col(G), explode(TextFns.bigrams(col("tk"))).as("bg"))
        .groupBy(H, "bg")
        .agg(count(lit(1)).as("k"), max(col(G)).as("g"))
      bgk
        .withColumn("n", sum(col("k") * col("g")).over(Window.partitionBy("bg")))
        .groupBy(H)
        .agg(sum(col("k") * col("n")).as("sum_freq"),
          sum(col("k")).as("n_bg"))
        // ratio of two exact BIGINTs — the one double op both engines
        // perform identically
        .select(col(H), col("n_bg"),
          (lit(1.0) * col("sum_freq") / col("n_bg")).as("mean_bg_freq"))
    }

  val txtPplProxySql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                             t -> len(t) > 0) AS tk
      |  FROM documents
      |), bgk AS (
      |  SELECT doc_id, bg, count(*) AS k FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(tk)),
      |                                         i -> tk[i] || ' ' || tk[i+1])) AS bg
      |    FROM toks
      |  ) GROUP BY 1, 2
      |), cnt AS (
      |  SELECT bg AS c_bg, CAST(sum(k) AS BIGINT) AS n FROM bgk GROUP BY 1
      |)
      |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bg,
      |       1.0 * CAST(sum(k * n) AS BIGINT) / CAST(sum(k) AS BIGINT)
      |         AS mean_bg_freq
      |FROM bgk JOIN cnt ON bg = c_bg
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- DD: exact substring-span dedup (suffix-chain style) ----
  // Lee et al. 2021 (arXiv:2107.06499) maximal shared spans — the full
  // design and the measured recall contract live on
  // TextDedup.substringSpanPairs + SubstringRecallSpec. Each engine
  // hashes with its own 64-bit function; only in-engine equality
  // matters, and a false span needs an in-corpus 64-bit collision
  // (~n²/2⁶⁵ — the same stake the md5 fingerprint dedup makes).
  def ddSubstring(s: SparkSession, d: String): DataFrame =
    TextDedup.substringSpanPairs(Tables.documents(s, d),
        anchorK = 8, minSpan = 10, dfCap = 16)
      .orderBy("doc_a", "doc_b", "start_a", "start_b")

  val ddSubstringSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                             t -> len(t) > 0) AS tk
      |  FROM documents
      |), pos AS (
      |  SELECT doc_id, unnest(range(1, len(tk) - 6)) AS pos, tk
      |  FROM toks WHERE len(tk) >= 8
      |), win AS (
      |  SELECT doc_id, pos,
      |         array_to_string(list_slice(tk, pos, pos + 7), ' ') AS g
      |  FROM pos
      |), rare AS (
      |  SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df
      |                 FROM win GROUP BY 1) WHERE df <= 16
      |), keep AS (
      |  SELECT win.* FROM win JOIN rare USING (g)
      |), pr AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
      |  FROM keep a JOIN keep b ON a.g = b.g AND a.doc_id < b.doc_id
      |), runs AS (
      |  SELECT doc_a, doc_b, pa, pb, pa - pb AS dg,
      |         pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb
      |                                 ORDER BY pa) AS isl
      |  FROM pr
      |)
      |SELECT doc_a, doc_b, CAST(min(pa) AS BIGINT) AS start_a,
      |       CAST(min(pb) AS BIGINT) AS start_b,
      |       CAST(count(*) + 7 AS BIGINT) AS span_len
      |FROM runs GROUP BY doc_a, doc_b, dg, isl
      |HAVING count(*) + 7 >= 10
      |ORDER BY doc_a, doc_b, start_a, start_b""".stripMargin

  // ---- TXT: intra-document repeated spans (self-similarity) ----
  // The other half of the Lee et al. 2021 method: training corpora
  // repeat text WITHIN documents too (quoted replies, boilerplate
  // headers, scraper artifacts), and the paper dedups those spans the
  // same way as cross-document ones. Identical machinery to
  // `ddSubstring` — anchor windows at every position, diagonal islands
  // chaining — but the pair join is a SELF-join inside one document:
  // two occurrences of the same anchor at positions pa < pb lie on
  // diagonal dg = pb − pa (the repeat period), and a repeated span of
  // L tokens is L−7 consecutive anchor pairs on that diagonal.
  // Overlapping (tandem) repeats need no special case: period-dg
  // self-overlap just chains on its own diagonal. The per-(doc, anchor)
  // occurrence cap [2, 8] bounds the C(occ, 2) pair fan-out; a window
  // repeated more than 8 times in one document is degenerate
  // repetition, which `txt_repetition` already scores — same division
  // of labor as `ddSubstring`'s df cap vs collapse-first MinHash.
  //
  // Constants are corpus-tuned where `ddSubstring`'s are paper-tuned:
  // intra-doc repeats in real scraped text (and this corpus) are short
  // phrases, so the anchor is 3 tokens and every maximal repeat >= 3
  // is reported — at production span thresholds the synthetic corpus
  // would emit zero rows and the oracle would differential-test
  // nothing. K and MinSpan scale together; the machinery is identical.
  // Content-addressed (Content.perContent): the anchor-window self-join
  // machinery is a pure function of the token array, so it runs once per
  // distinct text — per-content keys (__h) replace doc_id throughout.
  def txtSelfSpan(s: SparkSession, d: String): DataFrame =
    selfSpanDerived(s, d, salt = None)
      .sortWithinPartitions("doc_id", "start_a", "start_b")

  private[graft] def selfSpanDerived(s: SparkSession, d: String,
                                       salt: Option[org.apache.spark.sql.Column]): DataFrame =
    graft.operators.Content.perContent(
      Tables.documents(s, d), Seq("text"), salt = salt)(selfSpanFromReps)

  private def selfSpanFromReps(reps: DataFrame): DataFrame = {
    val H = graft.operators.Content.H
    val K = 3        // anchor width (tokens)
    val MinSpan = 3  // report maximal repeats of at least this many tokens
    val OccCap = 8
    val th = reps
      .select(col(H), TextFns.tokens(col("text")).as("tk"))
      .select(col(H), transform(col("tk"), t => xxhash64(t)).as("th"))
      .filter(size(col("th")) >= K)
    val win = th.select(col(H), posexplode(
        transform(sequence(lit(1), size(col("th")) - (K - 1)),
          i => xxhash64((0 until K).map(j =>
            element_at(col("th"), (i + lit(j)).cast("int"))): _*))))
      .select(col(H), (col("pos") + 1).as("pos"), col("col").as("h"))
    // occ = 1 anchors can't pair — dropping them up front shrinks the
    // self-join input to just the repeating minority
    val rep = win.groupBy(H, "h")
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ").between(2, OccCap))
      .select(H, "h")
    val keep = win.join(rep, Seq(H, "h"))
    val pairs = keep.select(col(H), col("h"), col("pos").as("pa"))
      .join(keep.select(col(H), col("h"), col("pos").as("pb")),
        Seq(H, "h"))
      .filter(col("pa") < col("pb"))
      .select(col(H), col("pa"), col("pb"))
    val diag = Window.partitionBy(col(H), col("dg")).orderBy(col("pa"))
    pairs.withColumn("dg", col("pb") - col("pa"))
      .withColumn("isl", col("pa") - row_number().over(diag))
      .groupBy(H, "dg", "isl")
      .agg(min("pa").as("start_a"), min("pb").as("start_b"),
        (count(lit(1)) + (K - 1)).cast("long").as("span_len"))
      .filter(col("span_len") >= MinSpan)
      // start_b − start_a recovers dg and a diagonal's runs are disjoint
      // in pa, so (content, start_a, start_b) is a total order
      .select(col(H),
        col("start_a").cast("long").as("start_a"),
        col("start_b").cast("long").as("start_b"), col("span_len"))
  }

  val txtSelfSpanSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                             t -> len(t) > 0) AS tk
      |  FROM documents
      |), pos AS (
      |  SELECT doc_id, unnest(range(1, len(tk) - 1)) AS pos, tk
      |  FROM toks WHERE len(tk) >= 3
      |), win AS (
      |  SELECT doc_id, pos,
      |         array_to_string(list_slice(tk, pos, pos + 2), ' ') AS g
      |  FROM pos
      |), rep AS (
      |  SELECT doc_id, g
      |  FROM (SELECT doc_id, g, count(*) AS occ FROM win GROUP BY 1, 2)
      |  WHERE occ BETWEEN 2 AND 8
      |), keep AS (
      |  SELECT win.* FROM win JOIN rep USING (doc_id, g)
      |), pr AS (
      |  SELECT a.doc_id AS doc_id, a.pos AS pa, b.pos AS pb
      |  FROM keep a JOIN keep b
      |    ON a.doc_id = b.doc_id AND a.g = b.g AND a.pos < b.pos
      |), runs AS (
      |  SELECT doc_id, pa, pb, pb - pa AS dg,
      |         pa - row_number() OVER (PARTITION BY doc_id, pb - pa
      |                                 ORDER BY pa) AS isl
      |  FROM pr
      |)
      |SELECT doc_id, CAST(min(pa) AS BIGINT) AS start_a,
      |       CAST(min(pb) AS BIGINT) AS start_b,
      |       CAST(count(*) + 2 AS BIGINT) AS span_len
      |FROM runs GROUP BY doc_id, dg, isl
      |HAVING count(*) + 2 >= 3
      |ORDER BY doc_id, start_a, start_b""".stripMargin

  // ---- TXT: repeated-span removal (the dedup ACTION) ----
  // Detection composed into the edit Lee et al. actually apply: drop
  // every LATER occurrence (the start_b side of each reported span,
  // positions [start_b, start_b + len)) and rebuild the text from the
  // surviving tokens. The first occurrence always survives, so no
  // document empties. Distinct drop positions make overlapping spans
  // (tandem repeats, triple+ occurrences — each later copy pairs with
  // the first) compose without double-drop bookkeeping. The rebuild is
  // one anti-join on (doc_id, pos) and one per-doc fold:
  // array_sort(struct(pos, tok)) makes collect_list order-independent —
  // bit-identical at any partitioning. Docs without repeats pass
  // through unchanged; docs with no tokens have nothing to rebuild and
  // are absent from both engines by construction.
  // Content-addressed (Content.perContent): span detection AND the token
  // rebuild are pure functions of the text, so the whole edit runs once
  // per distinct content. Bonus over the naive shape: the rep frame is a
  // materialized exchange, so its two consumers (span side, token side)
  // hit a ReusedExchange instead of re-scanning documents.
  def txtSelfClean(s: SparkSession, d: String): DataFrame =
    selfCleanDerived(s, d, salt = None).sortWithinPartitions("doc_id")

  private[graft] def selfCleanDerived(s: SparkSession, d: String,
                                        salt: Option[org.apache.spark.sql.Column]): DataFrame =
    graft.operators.Content.perContent(
        Tables.documents(s, d), Seq("text"), salt = salt) { reps =>
      val H = graft.operators.Content.H
      val drop = selfSpanFromReps(reps)
        .select(col(H), explode(sequence(col("start_b"),
          col("start_b") + col("span_len") - 1)).as("pos"))
        .distinct()
      val toks = reps
        .select(col(H), posexplode(TextFns.tokens(col("text"))))
        .select(col(H), (col("pos") + 1).cast("long").as("pos"),
          col("col").as("tok"))
      toks.join(drop, Seq(H, "pos"), "left_anti")
        .groupBy(H)
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            p => p.getField("tok")), " ").as("clean_text"))
        .join(toks.groupBy(H).agg(count(lit(1)).as("n_toks")), H)
        .select(col(H), col("n_kept"),
          (col("n_toks") - col("n_kept")).as("n_dropped"), col("clean_text"))
    }

  val txtSelfCleanSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                             t -> len(t) > 0) AS tk
      |  FROM documents
      |), pos AS (
      |  SELECT doc_id, unnest(range(1, len(tk) - 1)) AS pos, tk
      |  FROM toks WHERE len(tk) >= 3
      |), win AS (
      |  SELECT doc_id, pos,
      |         array_to_string(list_slice(tk, pos, pos + 2), ' ') AS g
      |  FROM pos
      |), rep AS (
      |  SELECT doc_id, g
      |  FROM (SELECT doc_id, g, count(*) AS occ FROM win GROUP BY 1, 2)
      |  WHERE occ BETWEEN 2 AND 8
      |), keep AS (
      |  SELECT win.* FROM win JOIN rep USING (doc_id, g)
      |), pr AS (
      |  SELECT a.doc_id AS doc_id, a.pos AS pa, b.pos AS pb
      |  FROM keep a JOIN keep b
      |    ON a.doc_id = b.doc_id AND a.g = b.g AND a.pos < b.pos
      |), runs AS (
      |  SELECT doc_id, pa, pb, pb - pa AS dg,
      |         pa - row_number() OVER (PARTITION BY doc_id, pb - pa
      |                                 ORDER BY pa) AS isl
      |  FROM pr
      |), spans AS (
      |  SELECT doc_id, min(pb) AS start_b, count(*) + 2 AS span_len
      |  FROM runs GROUP BY doc_id, dg, isl
      |  HAVING count(*) + 2 >= 3
      |), drop AS (
      |  SELECT DISTINCT doc_id, unnest(range(start_b, start_b + span_len)) AS pos
      |  FROM spans
      |), tokpos AS (
      |  SELECT doc_id, unnest(range(1, len(tk) + 1)) AS pos, tk
      |  FROM toks WHERE len(tk) >= 1
      |), kept AS (
      |  SELECT t.doc_id, t.pos, t.tk[t.pos] AS tok
      |  FROM tokpos t LEFT JOIN drop d
      |    ON t.doc_id = d.doc_id AND t.pos = d.pos
      |  WHERE d.doc_id IS NULL
      |)
      |SELECT k.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |       CAST(any_value(n.n_toks) - count(*) AS BIGINT) AS n_dropped,
      |       string_agg(tok, ' ' ORDER BY pos) AS clean_text
      |FROM kept k JOIN (SELECT doc_id, len(tk) AS n_toks FROM toks) n
      |  ON k.doc_id = n.doc_id
      |GROUP BY k.doc_id
      |ORDER BY k.doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "dd_substring" -> (ddSubstring _),
    "txt_self_span" -> (txtSelfSpan _),
    "txt_self_clean" -> (txtSelfClean _),
    "ds_weighted" -> (dsWeighted _),
    "txt_ppl_proxy" -> (txtPplProxy _),
    "dd_contaminate" -> (ddContaminate _),
    "txt_repetition" -> (txtRepetition _),
    "txt_chunks" -> (txtChunks _),
    "txt_scrub" -> (txtScrub _),
    "dd_cluster" -> (ddCluster _),
    "dd_cluster_incr" -> (ddClusterIncr _),
    "dd_cluster_del" -> (ddClusterDel _),
    "pipe_dedup_incr" -> (pipeDedupIncr _),
    "dd_keep_best" -> (ddKeepBest _),
    "ds_sample" -> (dsSample _),
    "ds_stratified" -> (dsStratified _),
    "ds_split" -> (dsSplit _),
    "ds_shuffle" -> (dsShuffle _),
    "ds_pack" -> (dsPack _),
    "vocab_topk" -> (vocabTopk _),
    "txt_stats" -> (txtStats _),
    "txt_langid" -> (txtLangid _),
    "txt_fingerprint" -> (txtFingerprint _),
    "txt_winnow" -> (txtWinnow _),
    "dd_exact" -> (ddExact _),
    "dd_ngram_jaccard" -> (ddNgramJaccard _),
    "dd_containment" -> (ddContainment _),
    "dd_lsh_recall" -> (ddLshRecall _),
    "dd_band_recall" -> (ddBandRecall _),
    "dd_minhash_lsh" -> (ddMinhashLsh _),
    "dd_minhash_scaled" -> (ddMinhashScaled _),
    "dd_incremental" -> (ddIncremental _),
    "dd_band_store" -> (ddBandStore _),
    "dd_band_rot" -> (ddBandRot _),
    "dd_simhash" -> (ddSimhash _)
  )

  val oracles: Map[String, String] = Map(
    "dd_substring" -> ddSubstringSql,
    "txt_self_span" -> txtSelfSpanSql,
    "txt_self_clean" -> txtSelfCleanSql,
    "ds_weighted" -> dsWeightedSql,
    "txt_ppl_proxy" -> txtPplProxySql,
    "dd_contaminate" -> ddContaminateSql,
    "txt_repetition" -> txtRepetitionSql,
    "txt_chunks" -> txtChunksSql,
    "txt_scrub" -> txtScrubSql,
    "dd_cluster" -> ddClusterSql,
    "dd_cluster_incr" -> ddClusterSql,
    "dd_cluster_del" -> ddClusterDelSql,
    "pipe_dedup_incr" -> pipeDedupIncrSql,
    "dd_keep_best" -> ddKeepBestSql,
    "ds_sample" -> dsSampleSql,
    "ds_stratified" -> dsStratifiedSql,
    "ds_split" -> dsSplitSql,
    "ds_shuffle" -> dsShuffleSql,
    "ds_pack" -> dsPackSql,
    "vocab_topk" -> vocabTopkSql,
    "txt_stats" -> txtStatsSql,
    "txt_langid" -> txtLangidSql,
    "txt_fingerprint" -> txtFingerprintSql,
    "txt_winnow" -> txtWinnowSql,
    "dd_exact" -> ddExactSql,
    "dd_ngram_jaccard" -> ddNgramJaccardSql,
    "dd_containment" -> ddContainmentSql,
    "dd_lsh_recall" -> ddLshRecallSql,
    "dd_band_recall" -> ddBandRecallSql,
    "dd_minhash_lsh" -> ddMinhashLshSql,
    "dd_minhash_scaled" -> ddMinhashScaledSql,
    "dd_incremental" -> ddIncrementalSql,
    "dd_band_store" -> ddBandStoreSql,
    "dd_band_rot" -> ddBandRotSql,
    "dd_simhash" -> ddSimhashSql
  )
}
