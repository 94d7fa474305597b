package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-addressed evaluation of pure per-document derivations.
  *
  * Training corpora carry heavy duplicate mass (the reason the dedup tier
  * exists at all), and every per-document computation — winnowing
  * fingerprints, n-gram repetition scores, chunking — repeats its full
  * per-character work on every copy of the same text. This combinator
  * evaluates the derivation ONCE per distinct content and re-expands to
  * per-document rows through a join on the content hash:
  *
  *   keyed = docs.select(doc_id, h = md5(content))       // narrow scan pass
  *   reps  = docs.groupBy(h).agg(first(content), count)  // one row per content
  *   out   = derive(reps)                                // the heavy work
  *   keyed join out on h                                 // re-expand, output-sized
  *
  * Scale properties, in the order they matter at 100 TB:
  *  - the groupBy's PARTIAL aggregation collapses duplicate rows map-side,
  *    so the shuffle carries ~one row per distinct content per input
  *    partition — never the raw corpus;
  *  - re-expansion is a JOIN against the (doc_id, h) key frame, not a
  *    collect_list of group members: a billion-replica flood document is a
  *    billion probe-side rows against ONE build row (AQE skew-split
  *    handles the partition width), never a billion-element array in one
  *    record — the same flood doctrine as the pair-emitting dedup paths;
  *  - the derivation runs on the rep frame, whose width is the corpus's
  *    distinct-content count — the same frame every dedup query already
  *    reduces to.
  *
  * Correctness stakes md5 collision-freedom for distinct texts — the exact
  * stake `dd_exact`/`txt_fingerprint` already make. `first(attr)` under the
  * groupBy is deterministic because the group key IS (the hash of) the
  * attributes: every row in a group carries identical attribute values.
  *
  * Measured trade (BENCH_NOTES r6 s3): at 1× (sf0.1, duplicate-poor) the
  * extra shuffle+join costs ~0.2–0.4 s per query; at the ladder's 100×
  * (every doc ~100 replicas — the stand-in for real-world duplicate mass)
  * the heavy tier drops from ~88 s to rep-frame time. The 1× cost is the
  * right price at the 100 TB design point, same verdict as collapse-first
  * n-gram Jaccard (R99).
  */
object Content {

  /** Content-hash column name carried between the combinator's stages. */
  val H = "__h"

  /** Replica count per distinct content — available to derivations that
    * need corpus-weighted statistics (e.g. a corpus bigram frequency is
    * the rep-frame count weighted by this).
    */
  val G = "__g"

  /** md5 over the attribute tuple. The rendering is UNFORGEABLE by
    * construction: each field is length-prefixed (`V<len>:<value>`, null
    * renders as `N`), so no attribute VALUE can imitate a field boundary
    * or the null marker — ("a", null) ≠ ("a", "N") ≠ ("aN", ...) all hash
    * apart, where a separator+sentinel scheme collides on values that
    * contain the separator or equal the sentinel.
    */
  def contentKey(attrs: Seq[Column]): Column =
    md5(concat(attrs.map { a =>
      val s = a.cast("string")
      when(s.isNull, lit("N"))
        .otherwise(concat(lit("V"), length(s).cast("string"), lit(":"), s))
    }: _*))

  /** Attribute columns with FLOATING-POINT NORMALIZATION matching what
    * Spark's aggregation applies to grouping keys (NormalizeFloatingNumbers
    * rewrites -0.0 to 0.0 before grouping): the rep frame's key values
    * come out of a groupBy normalized, so a member-side hash over the RAW
    * value would disagree on any row carrying a -0.0 component (e.g. in an
    * embedding array) and the re-expansion join would silently drop that
    * row. Adding +0.0 is the IEEE-exact normalization (-0.0 + 0.0 = +0.0;
    * NaN and every other value unchanged) and is idempotent, so it is safe
    * on BOTH the member side and the already-normalized rep side.
    */
  private[graft] def normKeyCols(docs: DataFrame, attrs: Seq[String]): Seq[Column] = {
    import org.apache.spark.sql.types._
    attrs.map { name =>
      docs.schema(name).dataType match {
        case FloatType => col(name) + lit(0.0f)
        case DoubleType => col(name) + lit(0.0)
        case ArrayType(FloatType, _) => transform(col(name), x => x + lit(0.0f))
        case ArrayType(DoubleType, _) => transform(col(name), x => x + lit(0.0))
        case _ => col(name)
      }
    }
  }

  /** The member-side content key over `docs` — ONE spelling of the
    * (normalized attrs + salt) hash shared by every call site that builds
    * a membership frame, so the member key provably matches the `H` the
    * rep frames emit (same normalization, same salt handling).
    */
  def memberKey(docs: DataFrame, attrs: Seq[String],
                salt: Option[Column] = None): Column =
    contentKey(normKeyCols(docs, attrs) ++ salt.toSeq)

  /** Evaluate `derive` once per distinct `attrs` tuple and re-expand to one
    * output row per (document × derived row).
    *
    * `derive` receives a frame with columns (`H`, attrs…, `G`) — one row
    * per distinct content, `G` = replica count — and must return `H` plus
    * its computed columns (it must NOT reference `doc_id`; the document
    * identity is re-attached by the combinator). Ordering of the result is
    * the caller's concern.
    *
    * `salt` folds an extra column into the content key; with a per-row
    * unique salt (doc_id) every group is a singleton and the combinator
    * degenerates to the naive per-document evaluation — the equivalence
    * specs compare exactly these two modes bit-for-bit.
    *
    * Plan-shape rules, each measured at sf0.1 (5.65 s naive-combinator →
    * sub-second, see BENCH_NOTES):
    *  - the collapse groups by the ATTRIBUTE COLUMNS themselves and
    *    computes the hash after — `groupBy(h).agg(first(text))` plans a
    *    SortAggregate (First's buffer isn't hash-mutable for strings),
    *    which local-sorts the whole corpus text twice; keying by the text
    *    keeps it a HashAggregate with a map-side partial that collapses
    *    replicas before the shuffle;
    *  - the rep frame is re-spread ROUND-ROBIN with an explicit partition
    *    count before `derive`: AQE coalesces a test-scale post-aggregation
    *    exchange to ~1 partition, serializing the heavy per-rep work (the
    *    sortSpread lesson; an explicit-count repartition survives AQE) —
    *    and a hash-partitioned respread on the same key would be collapsed
    *    into the aggregation exchange by the planner, losing that
    *    guarantee. Round-robin also balances perfectly when few distinct
    *    contents dominate. The extra exchange moves rep-frame rows only —
    *    at scale, the duplicate-collapsed minority;
    *  - callers order their output with sortWithinPartitions, never a
    *    global orderBy: a range exchange's sampling pass would re-execute
    *    the derivation (it sits in the same stage when the re-expansion
    *    join broadcasts), and the gate's comparison is order-insensitive —
    *    local sort keeps file content deterministic at zero exchanges.
    */
  def perContent(docs: DataFrame, attrs: Seq[String], idCol: String = "doc_id",
                 salt: Option[Column] = None)
                (derive: DataFrame => DataFrame): DataFrame = {
    val keyed = docs.select(col(idCol), memberKey(docs, attrs, salt).as(H))
    keyed.join(derive(reps(docs, attrs, salt)), H).drop(H)
  }

  /** The collapsed rep frame alone — (`H`, attrs…, `G`), one row per
    * distinct content — for CORPUS-AGGREGATE derivations that need no
    * per-document re-expansion (vocabulary counts, collocation scores,
    * coverage audits). A count over documents becomes `sum(G)` over reps:
    * exact, because every document of a content group contributes
    * identical occurrences — the same weighted-count move as the
    * collapse-first n-gram Jaccard dfs.
    */
  def reps(docs: DataFrame, attrs: Seq[String],
           salt: Option[Column] = None): DataFrame = {
    val n = docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val g = docs
      .groupBy(attrs.map(col) ++ salt.map(_.as("__salt")).toSeq: _*)
      .agg(count(lit(1)).as(G))
    pushdownFence(g
      .select(contentKey(normKeyCols(g, attrs) ++
          salt.map(_ => col("__salt")).toSeq).as(H) +:
        attrs.map(col) :+ col(G): _*)
      .repartition(n))
  }

  /** Rep frame keyed by id stats instead of a hash — (attrs…, `G`,
    * idCol = min member id), for derivations whose only per-document
    * dependence is "the smallest member id" (keeper policies, star-edge
    * construction, min-doc dedup): the min of a group's ids stands in for
    * the group in any min-aggregation downstream, so no re-expansion join
    * and no content hash are needed at all.
    */
  def repsById(docs: DataFrame, attrs: Seq[String], idCol: String = "doc_id",
               salt: Option[Column] = None): DataFrame = {
    val n = docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val g = docs
      .groupBy(attrs.map(col) ++ salt.map(_.as("__salt")).toSeq: _*)
      .agg(count(lit(1)).as(G), min(idCol).as(idCol))
    // H emitted here too, so membership-frame consumers never hand-roll
    // the (normalized attrs + __salt) hash spelling
    pushdownFence(g
      .select(contentKey(normKeyCols(g, attrs) ++
          salt.map(_ => col("__salt")).toSeq).as(H) +:
        attrs.map(col) :+ col(G) :+ col(idCol): _*)
      .repartition(n))
  }

  private val fenceId = new java.util.concurrent.atomic.AtomicLong()

  /** Predicate-pushdown fence over the rep frame — without it the
    * collapse silently un-collapses: a derivation's filter on a
    * content-pure expression (a quality gate, `size(tokens) >= k`) is a
    * predicate over the aggregation's GROUPING columns, so Catalyst
    * pushes it below the collapse aggregate and the heavy expression
    * runs once per DOCUMENT again (measured: the pipe_curate gate at the
    * 100× rung read 4.9 s with the pushdown vs 0.4 s fenced — the whole
    * collapse win, silently undone by an "optimization"). A zero-cost
    * row-count observation works as the fence because `CollectMetrics`
    * is not among the nodes `PushPredicateThroughNonJoin` crosses; the
    * metric itself (rep-frame width) is genuinely useful telemetry.
    * Names are uniqued per call — one query may collapse several corpora
    * (dd_lsh_recall embeds two shipped pipelines) and duplicate
    * observation names in one plan are an analysis error.
    */
  private[graft] def pushdownFence(df: DataFrame): DataFrame =
    df.observe(s"graft_content_reps_${fenceId.incrementAndGet()}", count(lit(1)))
}
