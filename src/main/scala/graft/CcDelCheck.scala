package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: demonstrate that
  * [[operators.TextDedup.deleteFromComponentsKeyed]] costs
  * O(affected clusters), independent of corpus size — the delete twin
  * of [[CcFoldCheck]].
  * `sbt "runMain graft.CcDelCheck [labelNodes...] [forgetClusters]"`
  *
  * Builds persisted label tables + key tables of increasing node count
  * (size-4 single-key cliques, written to parquet exactly like the
  * production artifacts), then deletes the SAME fixed forget set — the
  * MIN of each of the first `forgetClusters` clusters, the re-anchor
  * case a naive relabel gets wrong — from each and reports min-of-3
  * wall seconds, plus the full-recompute cost over the largest corpus'
  * live star pairs (the number the targeted delete exists to avoid).
  *
  * Expected shape (recorded in BENCH_NOTES): delete time ~flat across
  * label-table sizes (labels are scanned linearly through broadcast
  * joins, never shuffled on their own key; the mini-CC runs over the
  * affected clusters' restricted key groups only), while the full
  * recompute grows with corpus edge count.
  */
object CcDelCheck {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.length > 0) args(0).split(",").map(_.toLong).toSeq
      else Seq(100000L, 1000000L, 10000000L)
    val forgetClusters = if (args.length > 1) args(1).toLong else 2500L
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
      .createTempDirectory("graft_ccdel_check").toString

    // the fixed forget set: cluster min 4c of clusters c < forgetClusters
    val forget = s.range(forgetClusters).select((col("id") * 4).as("doc_id"))

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
      // size-4 cliques: ids 4c..4c+3 share key "c"; the persisted label
      // is the closed form (min = 4c) — written like production tables
      s.range(nodes).select(col("id").as("doc_id"),
          (col("id") - col("id") % 4).as("cluster_id"))
        .write.mode("overwrite").parquet(s"$scratch/labels_$nodes")
      s.range(nodes).select(col("id").as("doc_id"),
          expr("id div 4").cast("string").as("k")) // integer div: 4-cliques
        .write.mode("overwrite").parquet(s"$scratch/keyed_$nodes")
      val labels = s.read.parquet(s"$scratch/labels_$nodes")
      val keyed = s.read.parquet(s"$scratch/keyed_$nodes")
      val (t, nOut) = minOf3(() =>
        operators.TextDedup.deleteFromComponentsKeyed(labels, keyed, forget)
          .count())
      println(f"[ccdel] nodes=$nodes%,d forget=$forgetClusters%,d " +
        f"delete=$t%.2fs out=$nOut%,d")
    }

    // the avoided cost at the largest size: star pairs over the live key
    // groups + a full CC fixpoint (what a label-less pipeline re-runs
    // for every GDPR batch)
    val nodes = sizes.max
    val keyed = s.read.parquet(s"$scratch/keyed_$nodes")
    val live = keyed.join(forget, Seq("doc_id"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
    val pairs = live.withColumn("mn", min("doc_id").over(w))
      .filter(col("doc_id") > col("mn"))
      .select(col("mn").as("doc_a"), col("doc_id").as("doc_b"))
    val t0 = System.nanoTime()
    val n = operators.TextDedup.connectedComponents(pairs).count()
    println(f"[ccdel] full recompute at nodes=$nodes%,d: " +
      f"${(System.nanoTime() - t0) / 1e9}%.2fs labels=$n%,d")
    s.stop()
  }
}
