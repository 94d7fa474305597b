package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure the BUSY-store probe cost before/after the
  * cell-pruned serve path — `sbt "runMain graft.StoreDppCheck <sfDir>
  * [cells] [nprobe] [nq]"` (the `DppCheck` sibling for the maintained
  * store instead of the staged index).
  *
  * Builds an IVF-PQ index over `<sfDir>`'s embeddings, folds the bulk
  * of the code table into a compacted `KeyedStore` and leaves it
  * deliberately NON-quiesced — one pending `batch_*` dir (every 97th
  * vector) and one live tombstone — the steady state of a production
  * store. Then times a single-query and an nq-query probe through BOTH
  * serve paths:
  *   before — `serve()` plain: the union+anti-join reconcile hides the
  *     hive scan from DPP, so the probe reads EVERY cell file of the
  *     compacted bulk;
  *   after — `serve(partPrune = probe cells)` via `ivfpqProbeFrom`:
  *     each leg is semi-joined to the probed cells before the union,
  *     DPP reaches the hive scan, and the probe reads nprobe cells.
  * Scan-file counts are walked from the SAME QueryExecution that ran
  * (the DppCheck contract), split hive (`cid=`) vs pending batch.
  */
object StoreDppCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cells = if (args.length > 1) args(1) else "64"
    val nprobe = if (args.length > 2) args(2) else "2"
    val nq = if (args.length > 3) args(3).toLong else 50L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "false")
      .config("spark.graft.ivf.cells", cells)
      .config("spark.graft.ivf.nprobe", nprobe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    import graft.sources.KeyedStore

    val (coarse, rcent, codes) = queries.SimilarityQueries.ivfpqIndex(s, sfDir)
    val schema = codes.schema
    val dir = java.nio.file.Files.createTempDirectory("graft_storedpp")
      .toString + "/store"
    codes.filter(col("vec_id") % 97 =!= 0)
      .write.mode("overwrite").parquet(s"$dir/base")
    KeyedStore.compact(s, dir, Seq("cid"), schema, "vec_id")
    codes.filter(col("vec_id") % 97 === 0)
      .write.mode("overwrite").parquet(s"$dir/batch_1")
    KeyedStore.forget(s, dir, "vec_id", Seq(123L).toDF("vec_id"))
    val nCells = codes.select("cid").distinct().count()
    println(s"[storedpp] busy store at $dir: compacted $nCells cells + " +
      "1 pending batch + 1 live tombstone")

    def scanFiles(df: org.apache.spark.sql.DataFrame): (Seq[Long], Seq[Long]) = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[(String, Long)] = {
        import org.apache.spark.sql.execution.adaptive.{
          AdaptiveSparkPlanExec, QueryStageExec}
        val here = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.metadata.get("Location").exists(_.contains("storedpp")) =>
            Seq((f.metadata("Location"), f.metrics("numFiles").value))
          case _ => Nil
        }
        here ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
      }
      val all = walk(df.queryExecution.executedPlan).filter(_._2 > 0)
      (all.filter(_._1.contains("cid=")).map(_._2),
        all.filter(_._1.contains("batch_")).map(_._2))
    }

    def timeRun(tag: String, q: Long, pruned: Boolean): Unit = {
      val times = (1 to 2).map { _ =>
        val qs = queries.SimilarityQueries.queryBatch(s, sfDir, q)
        val df =
          if (pruned)
            queries.SimilarityQueries.ivfpqProbeFrom(qs, coarse, rcent,
              cells => KeyedStore.serve(s, dir, Seq("cid"), schema,
                "vec_id", partPrune = Some(cells)))
          else
            queries.SimilarityQueries.ivfpqProbe(qs, coarse, rcent,
              KeyedStore.serve(s, dir, Seq("cid"), schema, "vec_id"))
        val t0 = System.nanoTime()
        // collect() on purpose (dev measurement tool, k-row result): the
        // scan metrics must come from THIS QueryExecution
        val n = df.collect().length
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n, df)
      }
      val (dt, n, df) = times.minBy(_._1)
      val (hive, flat) = scanFiles(df)
      println(f"[storedpp] $tag: rows=$n minOf2=$dt%.2fs " +
        s"hiveCellFiles=${hive.mkString("+")} of $nCells " +
        s"pendingBatchFiles=${flat.mkString("+")}")
    }
    timeRun(s"before(serve plain)   single-query cells=$cells", 1L,
      pruned = false)
    timeRun(s"after (serve pruned)  single-query cells=$cells", 1L,
      pruned = true)
    timeRun(s"before(serve plain)   batch($nq)     cells=$cells", nq,
      pruned = false)
    timeRun(s"after (serve pruned)  batch($nq)     cells=$cells", nq,
      pruned = true)
    s.stop()
  }
}
