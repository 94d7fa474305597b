package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure whether dynamic partition pruning engages
  * NATURALLY (no cost-model forcing) on the cid-partitioned IVF-PQ code
  * store, and what the executed scan actually read —
  * `sbt "runMain graft.DppCheck <sfDir> <cells> <nprobe> [nq]"`.
  *
  * Prints, for a single-query probe and an nq-query batch probe:
  * executed codes-scan file counts (walked from the SAME QueryExecution
  * that ran — write/count would plan fresh ones and leave metrics
  * untouched), the total cell-file count, and wall time with DPP on vs
  * off. The session carries only the production confs
  * (reuseBroadcastOnly=false, the Verify/Bench wiring) — no
  * useStats/fallbackFilterRatio knobs, so what this tool reports is the
  * cost model's own at-scale verdict (the knob-forced variant lives in
  * IvfConfSpec for the toy-scale unit test).
  */
object DppCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cells = if (args.length > 1) args(1) else "64"
    val nprobe = if (args.length > 2) args(2) else "2"
    val nq = if (args.length > 3) args(3).toLong else 50L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    def session(dppOn: Boolean): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.extensions", "graft.plans.GraftExtensions")
        .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
          "false")
        .config("spark.sql.optimizer.dynamicPartitionPruning.enabled",
          dppOn.toString)
        .config("spark.graft.ivf.cells", cells)
        .config("spark.graft.ivf.nprobe", nprobe)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    def codesScanFiles(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] = {
        import org.apache.spark.sql.execution.adaptive.{
          AdaptiveSparkPlanExec, QueryStageExec}
        val here = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.metadata.get("Location").exists(_.contains("ivfpq_codes")) =>
            Seq(f.metrics("numFiles").value)
          case _ => Nil
        }
        here ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
      }
      walk(df.queryExecution.executedPlan).filter(_ > 0)
    }

    // pass 1: DPP ON — build (stage) the index, then time probes
    val s1 = session(dppOn = true)
    val (coarse, rcent, codes) = queries.SimilarityQueries.ivfpqIndex(s1, sfDir)
    val totalFiles = codes.select("cid").distinct().count()
    codes.count() // warm the staged artifact + file listing

    def timeRun(s: SparkSession, tag: String, q: Long): Unit = {
      val qs = queries.SimilarityQueries.queryBatch(s, sfDir, q)
      val df = queries.SimilarityQueries.ivfpqProbe(qs, coarse, rcent, codes)
      val t0 = System.nanoTime()
      // collect() ON PURPOSE (dev measurement tool, k-row result): the
      // scan metrics below must come from THIS QueryExecution — a
      // write/count would plan a fresh one with untouched metrics
      val n = df.collect().length
      val dt = (System.nanoTime() - t0) / 1e9
      val files = codesScanFiles(df)
      val pruned = df.queryExecution.executedPlan.toString
        .contains("dynamicpruningexpression")
      println(f"[dppcheck] $tag: rows=$n time=$dt%.2fs " +
        s"codesScanFiles=${files.mkString("+")} of $totalFiles " +
        s"planHasDpp=$pruned")
    }
    timeRun(s1, s"dpp=on  single-query cells=$cells nprobe=$nprobe", 1L)
    timeRun(s1, s"dpp=on  batch($nq)     cells=$cells nprobe=$nprobe", nq)
    s1.stop()

    // pass 2: DPP OFF — same staged index (fresh session re-stages; the
    // wall-clock A/B is the probe, which min-of-2 below isolates)
    val s2 = session(dppOn = false)
    val (co2, rc2, cd2) = queries.SimilarityQueries.ivfpqIndex(s2, sfDir)
    cd2.count()
    def timeRun2(tag: String, q: Long): Unit = {
      val qs = queries.SimilarityQueries.queryBatch(s2, sfDir, q)
      val df = queries.SimilarityQueries.ivfpqProbe(qs, co2, rc2, cd2)
      val t0 = System.nanoTime()
      // collect() on purpose — same QueryExecution contract as above
      val n = df.collect().length
      val dt = (System.nanoTime() - t0) / 1e9
      val files = codesScanFiles(df)
      println(f"[dppcheck] $tag: rows=$n time=$dt%.2fs " +
        s"codesScanFiles=${files.mkString("+")} of $totalFiles")
    }
    timeRun2(s"dpp=off single-query cells=$cells nprobe=$nprobe", 1L)
    timeRun2(s"dpp=off batch($nq)     cells=$cells nprobe=$nprobe", nq)
    s2.stop()
  }
}
