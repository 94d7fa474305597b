package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: DERIVE the semantic-decontamination threshold
  * (`spark.graft.sem.tau`) from the corpus instead of trusting the
  * pinned default — `sbt "runMain graft.SemTauCheck <sfDir> [evalN]"`.
  *
  * The recipe the `dd_contaminate_sem` doc describes, executable: tau
  * sits at the ~0.1% quantile of the EXACT eval-to-corpus integer-L2
  * distance distribution (every corpus vector × every eval vector, the
  * eval side broadcast — the same E-bounded shape as the recall evals).
  * Prints the distribution's min / q0.001 / q0.01 / median, the
  * recommended conf value (q0.001 rounded up to 2 significant digits,
  * so the flag set is the distribution's own tail, not a magic number),
  * and what fraction of pairs the CURRENTLY pinned tau admits — re-run
  * after any embedding-space change and update `OracleDefaults` + the
  * static oracle SQL together if the recommendation moves.
  *
  * The derivation is factored out ([[derive]]) so `SemTauGateSpec` can
  * run it as a DRIFT GATE: a testdata regeneration that shifts the
  * embedding scale strands the pinned tau outside its own quantile band
  * — the gate fails the suite instead of silently flagging a different
  * tail (the `sk_kmv` lesson applied to this knob).
  */
object SemTauCheck {

  /** The derived distribution facts for one (embeddings, evalN) corpus. */
  final case class Stats(nPairs: Long, minD2: Long, q0001: Double,
                         q001: Double, median: Double, underPinned: Long) {
    /** q0.001 rounded UP to 2 significant digits — the recommended conf
      * value; None when the quantile is degenerate: <= 0 (>=0.1% of
      * pairs are exact duplicates — no distance threshold separates
      * that tail), OR rounding to a value below 1, which truncation
      * would silently turn into tau = 0 — d2 is integer-valued, so an
      * interpolated sub-1 quantile (reachable when the tail is nearly
      * all exact duplicates) is the same degenerate tail in disguise.
      */
    def recommended: Option[Long] = {
      if (q0001 <= 0) None
      else {
        val mag = math.pow(10, math.floor(math.log10(q0001)) - 1)
        val rec = (math.ceil(q0001 / mag) * mag).toLong
        if (rec < 1) None else Some(rec)
      }
    }

    /** The drift gate: a pinned tau is IN BAND while it still admits
      * the tail the recipe targets — at or above the q0.001 it was
      * derived from (rounding is upward, so the derived conf always
      * is), and no higher than q0.01 (10× the target tail: past that
      * the "0.1% quantile" doc is a lie and the flag set's size has
      * drifted an order of magnitude).
      */
    def inBand(pinned: Long): Boolean =
      nPairs > 0 && pinned >= q0001 && pinned <= q001
  }

  /** Compute [[Stats]] for `emb` (vec_id, embedding) with eval ids
    * `< evalN`; None when the pair set is EMPTY (evalN = 0, evalN past
    * the max vec_id leaving no corpus side, or an empty table) — the
    * aggregate's min/percentiles are null there and unpacking them
    * would NPE.
    */
  private[graft] def derive(spark: SparkSession, emb: DataFrame,
                            evalN: Long, pinned: Long): Option[Stats] = {
    val qv = queries.SimilarityQueries.pqQuantize(emb)
    val d2 = qv.filter(col("vec_id") >= evalN)
      .select(col("vec_id"), col("q").as("cq"))
      .crossJoin(broadcast(qv.filter(col("vec_id") < evalN)
        .select(col("vec_id").as("eval_id"), col("q").as("qq"))))
      .select(expr("aggregate(zip_with(qq, cq, (x, y) -> (x - y) * (x - y)), " +
        "0L, (a, x) -> a + x)").as("d2"))
    val row = d2.agg(
      count(lit(1)).as("n_pairs"),
      min("d2").as("min_d2"),
      expr("percentile(d2, array(0.001, 0.01, 0.5))").as("qs"),
      sum(when(col("d2") <= pinned, 1L).otherwise(0L)).as("n_under_pinned")
    ).collect()(0)
    if (row.getLong(0) == 0) None
    else {
      val qs = row.getSeq[Double](2)
      Some(Stats(row.getLong(0), row.getLong(1), qs(0), qs(1), qs(2),
        row.getLong(3)))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val evalN = if (args.length > 1) args(1).toLong
      else queries.SimilarityQueries.semEvalN(spark)
    val pinned = queries.SimilarityQueries.semTau(spark)

    derive(spark, Tables.embeddings(spark, sfDir), evalN, pinned) match {
      case None =>
        println(s"[semtau] sfDir=$sfDir evalN=$evalN n_pairs=0: no " +
          "eval-to-corpus pairs (evalN out of the table's id range, or " +
          "the table is empty) — nothing to derive")
      case Some(st) =>
        println(s"[semtau] sfDir=$sfDir evalN=$evalN n_pairs=${st.nPairs}")
        println(f"[semtau] min=${st.minD2} q0.001=${st.q0001}%.4g " +
          f"q0.01=${st.q001}%.4g median=${st.median}%.4g")
        println(f"[semtau] pinned tau=$pinned admits ${st.underPinned} of " +
          f"${st.nPairs} pairs (${st.underPinned * 100.0 / st.nPairs}%.3f%%)" +
          (if (st.inBand(pinned)) " — IN the q0.001..q0.01 band"
           else " — OUT of the q0.001..q0.01 band: re-derive"))
        st.recommended match {
          case Some(rec) =>
            println(s"[semtau] recommended spark.graft.sem.tau=$rec " +
              "(q0.001 rounded up to 2 significant digits)")
          case None =>
            // log10(0) would NaN the rounding into a silent tau=0 (and a
            // sub-1 interpolated quantile would truncate to it) — a
            // ~zero quantile is itself the signal: >=0.1% of pairs are
            // (essentially) EXACT duplicates, so the tail is degenerate
            // and no distance threshold separates contamination from it
            println("[semtau] q0.001 ~= 0: >=0.1% of eval-to-corpus pairs " +
              "are EXACT duplicates — run exact dedup/decontamination " +
              "first, then re-derive tau on the cleaned corpus (no " +
              "automatic recommendation)")
        }
    }
    spark.stop()
  }
}
