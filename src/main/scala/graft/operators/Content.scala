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
    * construction: each field hashes SEPARATELY to a fixed-width 32-hex
    * token (null renders as the single non-hex token `N`), and a
    * concatenation of {32-hex, `N`} tokens parses uniquely — so no
    * attribute VALUE can imitate a field boundary or the null marker,
    * where a separator+sentinel scheme collides on values that contain
    * the separator or equal the sentinel. Per-field hashing also
    * references each field's string rendering exactly ONCE: a
    * length-prefix scheme (`V<len>:<value>`) needs the rendering twice
    * (length + value), and complex-type casts are CodegenFallback with no
    * subexpression elimination — measured 2× the rendering cost per call
    * on array attributes.
    *
    * SCALAR spelling only: `cast(array<string> as string)` joins elements
    * with `", "`, so distinct arrays like `['a, b']` and `['a','b']`
    * render identically — an array attribute needs the per-ELEMENT
    * tokenization of [[contentKeyTyped]], which every internal call site
    * goes through. This untyped form exists for scalar-keyed callers that
    * have a `Column` but no schema.
    */
  def contentKey(attrs: Seq[Column]): Column =
    md5(concat(attrs.map(scalarToken): _*))

  private def scalarToken(c: Column): Column =
    coalesce(md5(c.cast("string")), lit("N"))

  /** The per-attribute token, TYPE-AWARE: array attributes tokenize each
    * ELEMENT to a {32-hex, `N`} token (recursing through nested arrays)
    * and hash the concatenation — restoring injectivity where the flat
    * `cast(array as string)` rendering is forgeable (`['a, b']` vs
    * `['a','b']` both render `[a, b]`). The token stream parses uniquely:
    * `N` is not a hex character and hex tokens are exactly 32 wide, so
    * element boundaries can't be imitated. A null ARRAY renders as the
    * outer `N`; an empty array as `md5("")` — distinct by construction.
    */
  private def token(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.ArrayType(e, _) =>
        coalesce(when(c.isNotNull,
          md5(concat_ws("", transform(c, x => token(x, e))))), lit("N"))
      case org.apache.spark.sql.types.StructType(fields) =>
        // same argument per FIELD: `cast(struct as string)` renders
        // `{a, b}`, forgeable exactly like the array join
        coalesce(when(c.isNotNull, md5(concat(
          fields.toSeq.map(f => token(c.getField(f.name), f.dataType)): _*))),
          lit("N"))
      case _ => scalarToken(c)
    }

  /** [[contentKey]] with per-attribute types — the spelling all internal
    * call sites share (member keys and rep-frame keys must be computed by
    * the SAME expression or the expansion join silently drops rows).
    */
  def contentKeyTyped(
      attrs: Seq[(Column, org.apache.spark.sql.types.DataType)]): Column =
    md5(concat(attrs.map { case (c, t) => token(c, t) }: _*))

  /** The member-side content key over `docs` — ONE spelling of the
    * (attrs + salt) hash shared by every call site that builds a
    * membership frame. It hashes the RAW attribute rendering; the rep
    * frames group by this same raw hash (see [[reps]]), so member and rep
    * keys match by construction — including for float ±0.0, where
    * Spark's grouping-key normalization would otherwise make a
    * value-derived rep hash disagree with the member side.
    */
  def memberKey(docs: DataFrame, attrs: Seq[String],
                salt: Option[Column] = None): Column =
    contentKeyTyped(
      attrs.map(a => (col(a), docs.schema(a).dataType)) ++
        salt.map(c => (c, docs.select(c).schema.head.dataType)).toSeq)

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
    val r = reps(docs, attrs, salt)
    membership(docs, r, attrs, idCol, salt).join(derive(r), H).drop(H)
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
           salt: Option[Column] = None): DataFrame =
    collapse(docs, attrs, salt, Seq(count(lit(1)).as(G)),
      extraOut = Seq.empty)

  /** WHITELIST of key types whose grouped value is provably bit-identical
    * to the raw value, so a member-side recomputed hash equals the rep
    * frame's post-aggregation hash. Floats fail it (Spark normalizes -0.0
    * to 0.0 in grouping keys, so a raw member hash diverges from the rep
    * hash); anything NOT whitelisted — including key types this repo has
    * never seen (nested floats, structs, maps) — takes the join-based
    * membership, which is sound for EVERY type because the engine applies
    * the same equality semantics to both sides. Inverted on review from a
    * float blacklist: a blacklist's failure mode for a new key type was
    * silent row loss; a whitelist's is a join it didn't strictly need.
    */
  private def hashStable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType | BooleanType | ByteType | ShortType | IntegerType |
           LongType | DateType | TimestampType | TimestampNTZType |
           BinaryType => true
      case _: DecimalType => true
      case ArrayType(e, _) => hashStable(e)
      case StructType(fields) => fields.forall(f => hashStable(f.dataType))
      case _ => false
    }
  }

  /** The shared collapse: group by the attrs (+salt), aggregate, attach a
    * post-aggregation `H`, fence, respread. The post-agg hash runs over
    * REP rows only — zero per-input-row hashing. `__salt` is retained in
    * the output when salted: the float membership path joins on it.
    */
  private def collapse(docs: DataFrame, attrs: Seq[String],
                       salt: Option[Column], aggs: Seq[Column],
                       extraOut: Seq[Column]): DataFrame = {
    val n = docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val g = docs
      .groupBy(attrs.map(col) ++ salt.map(_.as("__salt")).toSeq: _*)
      .agg(aggs.head, aggs.tail: _*)
    val keyCols = attrs ++ salt.map(_ => "__salt").toSeq
    pushdownFence(g
      .withColumn(H,
        contentKeyTyped(keyCols.map(k => (col(k), g.schema(k).dataType))))
      .select((Seq(col(H)) ++ attrs.map(col) ++
        salt.map(_ => col("__salt")).toSeq ++ extraOut :+ col(G)): _*)
      .repartition(n))
  }

  /** The membership frame (idCol, `H`) mapping every document to its rep,
    * TYPE-DISPATCHED on the key attributes:
    *  - hash-stable keys (text corpora): recompute the hash per document —
    *    the grouped value is bit-identical to the raw value, so the
    *    recomputed key provably equals the rep's post-agg `H`, and the
    *    downstream expansion join moves a 32-byte key, never the text;
    *  - everything else (floats — the embeddings tables — and any future
    *    key type): recomputation is UNSOUND for floats — grouping
    *    normalizes -0.0 → 0.0, so a raw member hash diverges from the
    *    rep hash and the expansion join silently drops ±0.0 rows. The
    *    membership therefore JOINS the rep frame on the attrs themselves
    *    (NULL-SAFELY: `<=>` per key, because grouping puts null keys in
    *    one group exactly like the hash path's `N` token — a plain
    *    equi-join would silently drop null-keyed rows, diverging from
    *    both), where the engine applies the same normalization to both
    *    sides. Per-row normalization before hashing was measured and
    *    rejected (BENCH_NOTES): an IEEE +0.0f array transform is an
    *    interpreted lambda (emb_quantize 1.9 → 11.8 s at 100×), a regex
    *    over the rendering reads 17.5 s, and a raw-hash GROUPING column
    *    costs an extra corpus-wide rendering (dd_semdedup 4.6 → 7.6 s);
    *    the join form has no per-row compute at all.
    */
  def membership(docs: DataFrame, reps: DataFrame, attrs: Seq[String],
                 idCol: String = "doc_id",
                 salt: Option[Column] = None): DataFrame =
    if (attrs.forall(a => hashStable(docs.schema(a).dataType)))
      docs.select(col(idCol), memberKey(docs, attrs, salt).as(H))
    else {
      val d = salt.map(c => docs.withColumn("__salt", c)).getOrElse(docs)
        .alias("__mem")
      val keys = attrs ++ salt.map(_ => "__salt").toSeq
      val r = reps.select((Seq(col(H)) ++ keys.map(col)): _*).alias("__rep")
      val cond = keys.map(k => col(s"__mem.$k") <=> col(s"__rep.$k"))
        .reduce(_ && _)
      d.join(r, cond).select(col(s"__mem.$idCol"), col(s"__rep.$H"))
    }

  /** Rep frame with id stats — (`H`, attrs…, `G`, idCol = min member id),
    * for derivations whose only per-document dependence is "the smallest
    * member id" (keeper policies, star-edge construction, min-doc dedup):
    * the min of a group's ids stands in for the group in any
    * min-aggregation downstream, so no re-expansion join is needed.
    */
  def repsById(docs: DataFrame, attrs: Seq[String], idCol: String = "doc_id",
               salt: Option[Column] = None): DataFrame =
    collapse(docs, attrs, salt,
      Seq(count(lit(1)).as(G), min(idCol).as(idCol)),
      extraOut = Seq(col(idCol)))

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
