package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: demonstrate that [[operators.TextDedup.foldIntoComponents]]
  * costs O(batch), independent of the historical corpus' EDGE count —
  * `sbt "runMain graft.CcFoldCheck [labelNodes...] [batchEdges]"`.
  *
  * Builds synthetic persisted label tables of increasing node count
  * (spark.range — ids grouped into size-4 chain components, folded to
  * parquet exactly like the production artifact), then folds the SAME
  * fixed batch of fresh pairs into each and reports min-of-3 wall
  * seconds plus the full-recompute cost over the union edge set at the
  * largest size — the number the fold exists to avoid. The batch mixes
  * every merge shape: bridges between existing components, novel-only
  * chains, and novel-to-old attachments.
  *
  * Expected shape (recorded in BENCH_NOTES): fold time ~flat across
  * label-table sizes (the label table is scanned linearly twice, never
  * shuffled on its own key; the CC rounds run over the CONDENSED graph
  * bounded by the batch), while full recompute grows with the corpus
  * edge count.
  */
object CcFoldCheck {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.length > 0) args(0).split(",").map(_.toLong).toSeq
      else Seq(100000L, 1000000L, 10000000L)
    val batchEdges = if (args.length > 1) args(1).toLong else 10000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val scratch = java.nio.file.Files
      .createTempDirectory("graft_ccfold_check").toString

    // the fixed batch: for i in [0, batchEdges) — a third bridges two
    // existing chain components (4i <-> 4i+4... via 4i+1 ~ 4i+4), a
    // third attaches a novel id to an old node, a third is novel-only
    def batchFor(maxOld: Long) = s.range(batchEdges).select(
      when(col("id") % 3 === 0, (col("id") % maxOld) * 4 + 1)
        .when(col("id") % 3 === 1, (col("id") % maxOld) * 4 + 2)
        .otherwise(col("id") * 2 + maxOld * 8).as("doc_a"),
      when(col("id") % 3 === 0, ((col("id") + 1) % maxOld) * 4)
        .when(col("id") % 3 === 1, col("id") + maxOld * 8)
        .otherwise(col("id") * 2 + 1 + maxOld * 8).as("doc_b"))

    def minOf3(work: () => Long): (Double, Long) = {
      var best = Double.MaxValue
      var n = 0L
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        n = work()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, n)
    }

    sizes.foreach { nodes =>
      val comps = nodes / 4
      // historical edges: size-4 chains 4c - 4c+1 - 4c+2 - 4c+3; the
      // persisted LABEL artifact is its closed form (min = 4c), written
      // to parquet like the production table — the fold never sees the
      // historical edges, that is the point
      s.range(nodes).select(col("id").as("doc_id"),
          (col("id") - col("id") % 4).as("cluster_id"))
        .write.mode("overwrite").parquet(s"$scratch/labels_$nodes")
      val labels = s.read.parquet(s"$scratch/labels_$nodes")
      val batch = batchFor(comps)
      val (tFold, nOut) = minOf3(() =>
        operators.TextDedup.foldIntoComponents(labels, batch).count())
      println(f"[ccfold] nodes=$nodes%,d batch=$batchEdges%,d " +
        f"fold=$tFold%.2fs out=$nOut%,d")
    }

    // the avoided cost at the largest size: full CC over historical
    // edges + batch (the recompute a label-less pipeline re-runs daily)
    val nodes = sizes.max
    val hist = s.range(nodes).filter(col("id") % 4 =!= 3)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val union = hist.unionByName(batchFor(nodes / 4))
    val t0 = System.nanoTime()
    val n = operators.TextDedup.connectedComponents(union).count()
    println(f"[ccfold] full recompute at nodes=$nodes%,d: " +
      f"${(System.nanoTime() - t0) / 1e9}%.2fs labels=$n%,d")
    s.stop()
  }
}
