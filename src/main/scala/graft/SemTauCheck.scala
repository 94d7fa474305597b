package graft

import org.apache.spark.sql.SparkSession
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
  */
object SemTauCheck {
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

    val qv = queries.SimilarityQueries.pqQuantize(
      Tables.embeddings(spark, sfDir))
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
    val n = row.getLong(0)
    val minD2 = row.getLong(1)
    val qs = row.getSeq[Double](2)
    val under = row.getLong(3)
    // round q0.001 UP to 2 significant digits: a human-legible conf
    // value that still admits the same tail
    val q0001 = qs(0)
    println(s"[semtau] sfDir=$sfDir evalN=$evalN n_pairs=$n")
    println(f"[semtau] min=$minD2 q0.001=${qs(0)}%.4g q0.01=${qs(1)}%.4g " +
      f"median=${qs(2)}%.4g")
    println(f"[semtau] pinned tau=$pinned admits $under of $n pairs " +
      f"(${under * 100.0 / n}%.3f%%)")
    if (q0001 > 0) {
      val mag = math.pow(10, math.floor(math.log10(q0001)) - 1)
      val rec = (math.ceil(q0001 / mag) * mag).toLong
      println(s"[semtau] recommended spark.graft.sem.tau=$rec (q0.001 " +
        "rounded up to 2 significant digits)")
    } else
      // log10(0) would NaN the rounding into a silent tau=0 — and a
      // zero quantile is itself the signal: >=0.1% of pairs are EXACT
      // duplicates, so the tail is degenerate and no distance threshold
      // separates contamination from it
      println("[semtau] q0.001 = 0: >=0.1% of eval-to-corpus pairs are " +
        "EXACT duplicates — run exact dedup/decontamination first, then " +
        "re-derive tau on the cleaned corpus (no automatic recommendation)")
    spark.stop()
  }
}
