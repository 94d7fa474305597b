package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record-linkage and distribution-monitoring extensions — the entity-
  * resolution / drift-detection tier a production training-data pipeline
  * runs alongside dedup (the reference stops at exact-key dedup,
  * `src/transformer.py:83-90`; this tier generalizes it to fuzzy keys and
  * to distribution change over time).
  *
  * Scale doctrine (same as TextDedup): collapse to the value vocabulary
  * BEFORE any pairwise work, block the pairwise work so no all-pairs join
  * exists, and keep every statistic integer-exact so the DuckDB oracle
  * matches bit-for-bit at any scale factor.
  */
object Linkage {

  type Q = (SparkSession, String) => DataFrame

  // ---- er_name_match: blocked fuzzy entity resolution over part names ----
  // Classic record-linkage shape: collapse the fact table to its name
  // vocabulary (with multiplicity), block on a cheap deterministic key
  // (last token), and run the quadratic edit-distance comparison only
  // inside blocks. The corpus-wide work is ONE groupBy(p_name); the join
  // is vocabulary×vocabulary within a block — independent of row count,
  // so a 100 TB part table costs the same pairwise work as sf0.01.
  // Blocking is exact for the declared match definition (same last token
  // AND levenshtein ≤ 4): no candidate outside a block can qualify, so
  // unlike LSH there is no recall loss to measure.
  def erNameMatch(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("block", element_at(split(col("name"), " "), -1))
    val a = names.select(col("block"), col("name").as("name_a"), col("cnt").as("cnt_a"))
    val b = names.select(col("block"), col("name").as("name_b"), col("cnt").as("cnt_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("lev") <= 4)
      .select("name_a", "name_b", "lev", "cnt_a", "cnt_b")
      .orderBy("name_a", "name_b")
  }

  // Spark and DuckDB both implement standard unit-cost Levenshtein
  // (LinkageSpec pins kitten→sitting = 3 on the Spark side); names are
  // lowercase ASCII so the `name_a < name_b` tiebreak collates identically.
  val erNameMatchSql: String =
    """WITH n AS (
      |  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS cnt,
      |         string_split(p_name, ' ')[-1] AS block
      |  FROM part GROUP BY 1
      |)
      |SELECT a.name AS name_a, b.name AS name_b,
      |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev,
      |       a.cnt AS cnt_a, b.cnt AS cnt_b
      |FROM n a JOIN n b ON a.block = b.block AND a.name < b.name
      |WHERE levenshtein(a.name, b.name) <= 4
      |ORDER BY name_a, name_b""".stripMargin

  // ---- er_cluster: entity groups from the fuzzy-match pair graph ----
  // The resolution step after er_name_match's detection: names linked by
  // a match edge collapse into one entity (transitively — "cold widget" ~
  // "bold widget" ~ "bold gadget" is one cluster even if the ends don't
  // match directly). Node ids are each name's min p_partkey (deterministic,
  // corpus-derived); components run on graft's large-star/small-star
  // contraction — O(log d) rounds, per-node state one MIN, the same
  // machinery dd_cluster certifies. Output: every matched name with its
  // entity label (min node id in the component) and the name's part
  // multiplicity; singleton names (no match edge) are not entities and
  // stay out, like dd_cluster's n_docs ≥ 2 rule.
  def erCluster(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .groupBy(col("p_name").as("name"))
      .agg(min("p_partkey").as("name_id"), count(lit(1)).as("cnt"))
      .withColumn("block", element_at(split(col("name"), " "), -1))
    val a = names.select(col("block"), col("name").as("name_a"),
      col("name_id").as("id_a"))
    val b = names.select(col("block"), col("name").as("name_b"),
      col("name_id").as("id_b"))
    val edges = a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b") &&
        levenshtein(col("name_a"), col("name_b")) <= 4)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    // blocked edges are name_a < name_b over distinct name_ids (no
    // self-pairs) and the inner name join below only ever reads
    // edge-endpoint labels — the ccOverEdges contract
    graft.operators.TextDedup.ccOverEdges(edges)
      .select(col("doc_id").as("name_id"), col("cluster_id").as("entity_id"))
      .join(names.select("name", "name_id", "cnt"), "name_id")
      .select(col("name"), col("entity_id"), col("cnt").as("n_parts"))
      .orderBy("name")
  }

  // recursive-CTE components over the same symmetric edge set (the
  // dd_cluster oracle shape): walk labels outward, min reachable label
  // per node IS the component min because edges go both ways
  val erClusterSql: String =
    """WITH RECURSIVE n AS (
      |  SELECT p_name AS name, CAST(min(p_partkey) AS BIGINT) AS name_id,
      |         CAST(count(*) AS BIGINT) AS cnt,
      |         string_split(p_name, ' ')[-1] AS block
      |  FROM part GROUP BY 1
      |), e0 AS (
      |  SELECT a.name_id AS src, b.name_id AS dst
      |  FROM n a JOIN n b ON a.block = b.block AND a.name < b.name
      |  WHERE levenshtein(a.name, b.name) <= 4
      |), edges AS (
      |  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
      |), nodes AS (
      |  SELECT DISTINCT src AS node FROM edges
      |), walk(node, label) AS (
      |  SELECT node, node FROM nodes
      |  UNION
      |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
      |), comp AS (
      |  SELECT node AS name_id, CAST(min(label) AS BIGINT) AS entity_id
      |  FROM walk GROUP BY node
      |)
      |SELECT n.name, c.entity_id, n.cnt AS n_parts
      |FROM comp c JOIN n ON n.name_id = c.name_id
      |ORDER BY n.name""".stripMargin

  // ---- ev_markov: behavioral transition matrix over the event stream ----
  // Input for session-based behavior models: count (from_type → to_type)
  // transitions per user timeline, and publish the per-from transition
  // probability as an integer-floored parts-per-million so both engines
  // agree exactly. One shuffle by user (the lead window), one tiny agg;
  // the final per-from normalization runs over ≤ |event_type|² rows.
  def evMarkov(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, d)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    trans
      .withColumn("from_total", sum("n").over(Window.partitionBy("from_type")))
      .withColumn("ppm", expr("(n * 1000000) div from_total"))
      .select("from_type", "to_type", "n", "ppm")
      .orderBy("from_type", "to_type")
  }

  // DuckDB has no integral DIV; (x - mod(x, y)) / x is exact under both
  // integer and double division semantics (same rewrite as the hardened
  // sk_kmv oracle, Approx.scala).
  val evMarkovSql: String =
    """WITH seq AS (
      |  SELECT event_type,
      |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           AS next_type
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |), t AS (
      |  SELECT event_type AS from_type, next_type AS to_type,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
      |), w AS (
      |  SELECT *, sum(n) OVER (PARTITION BY from_type) AS from_total FROM t
      |)
      |SELECT from_type, to_type, n,
      |       CAST((n * 1000000 - mod(n * 1000000, from_total)) / from_total
      |         AS BIGINT) AS ppm
      |FROM w ORDER BY from_type, to_type""".stripMargin

  // ---- qr_drift: temporal distribution-drift monitor ----
  // Train/serve drift detection: split the corpus at the midpoint of its
  // time range and compare the event-type mix between halves. Shares are
  // integer-floored ppm and the drift statistic is the squared ppm delta —
  // all BIGINT-safe at any corpus size (ppm ≤ 1e6 ⇒ drift_sq ≤ 1e12),
  // unlike a raw (cnt_a·N_b − cnt_b·N_a)² cross-product which overflows
  // int64 already at ~3e9 rows. Two scans: a 1-row min/max broadcast to
  // fix the cutoff, then one conditional aggregation by event_type.
  def qrDrift(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("ts").isNotNull)
      .select(col("event_type"), unix_timestamp(col("ts")).as("es"))
    val cutoff = ev.agg(min("es").as("lo"), max("es").as("hi"))
      .select(expr("lo + (hi - lo) div 2").as("cutoff"))
    val perType = ev.crossJoin(broadcast(cutoff))
      .groupBy("event_type")
      .agg(
        sum(when(col("es") < col("cutoff"), 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col("es") >= col("cutoff"), 1L).otherwise(0L)).as("cnt_b"))
    val totals = perType.agg(sum("cnt_a").as("na"), sum("cnt_b").as("nb"))
    // na/nb can only be 0 on a degenerate ≤1-second corpus; share 0 there
    // keeps the monitor total (a raise would take down the whole report).
    perType.crossJoin(broadcast(totals))
      .withColumn("share_a_ppm",
        expr("CASE WHEN na = 0 THEN 0L ELSE (cnt_a * 1000000) div na END"))
      .withColumn("share_b_ppm",
        expr("CASE WHEN nb = 0 THEN 0L ELSE (cnt_b * 1000000) div nb END"))
      .withColumn("drift_sq",
        expr("(share_a_ppm - share_b_ppm) * (share_a_ppm - share_b_ppm)"))
      .select("event_type", "cnt_a", "cnt_b",
        "share_a_ppm", "share_b_ppm", "drift_sq")
      .orderBy("event_type")
  }

  val qrDriftSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es
      |  FROM events WHERE ts IS NOT NULL
      |), c AS (
      |  SELECT CAST(min(es) + ((max(es) - min(es))
      |           - mod(max(es) - min(es), 2)) / 2 AS BIGINT) AS cutoff
      |  FROM ev
      |), t AS (
      |  SELECT event_type,
      |         CAST(sum(CASE WHEN es <  c.cutoff THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
      |         CAST(sum(CASE WHEN es >= c.cutoff THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
      |  FROM ev, c GROUP BY 1
      |), g AS (
      |  SELECT CAST(sum(cnt_a) AS BIGINT) AS na,
      |         CAST(sum(cnt_b) AS BIGINT) AS nb FROM t
      |), sh AS (
      |  SELECT t.event_type, t.cnt_a, t.cnt_b,
      |         CASE WHEN g.na = 0 THEN CAST(0 AS BIGINT)
      |              ELSE CAST((t.cnt_a * 1000000 - mod(t.cnt_a * 1000000, g.na))
      |                     / g.na AS BIGINT) END AS share_a_ppm,
      |         CASE WHEN g.nb = 0 THEN CAST(0 AS BIGINT)
      |              ELSE CAST((t.cnt_b * 1000000 - mod(t.cnt_b * 1000000, g.nb))
      |                     / g.nb AS BIGINT) END AS share_b_ppm
      |  FROM t, g
      |)
      |SELECT event_type, cnt_a, cnt_b, share_a_ppm, share_b_ppm,
      |       (share_a_ppm - share_b_ppm) * (share_a_ppm - share_b_ppm) AS drift_sq
      |FROM sh ORDER BY event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "er_name_match" -> (erNameMatch _),
    "er_cluster" -> (erCluster _),
    "ev_markov" -> (evMarkov _),
    "qr_drift" -> (qrDrift _)
  )

  val oracles: Map[String, String] = Map(
    "er_name_match" -> erNameMatchSql,
    "er_cluster" -> erClusterSql,
    "ev_markov" -> evMarkovSql,
    "qr_drift" -> qrDriftSql
  )
}
