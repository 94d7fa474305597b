package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the replica-flood COST curve per banding family — the
  * measurement behind `dd_band_rot`'s 90.8× outlier at the 1000× rung
  * and the cost half of the `dd_band_recall` matrix.
  * `sbt "runMain graft.BandFloodCheck [sfDir] [replicas...]"`
  *
  * The exposed surface is the maintained band STORE's probe join: the
  * store side is per-doc (the forget grain — deliberately NOT
  * collapse-first, see ddBandStore), so corpus replicas multiply bucket
  * occupancy, and narrow bands multiply CROSS-TEXT collisions on top.
  * For each family (4×4, 8×2 over the same 16 hashes; 8×4 over 32) and
  * each replication factor k, this builds the per-doc index over the
  * k×-replicated corpus, probes it with the (collapse-first, as
  * shipped) batch representatives, and reports min-of-3 probe seconds
  * plus the candidate volume `incrementalMatchPairs` evaluates at
  * minEst = 0 — the number that blows up when a family's bands are too
  * narrow for a replicated corpus.
  */
object BandFloodCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val reps = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 10, 100)
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
      .createTempDirectory("graft_bandflood").toString

    val docs = Tables.documents(s, sfDir)
    val mx = docs.agg(max("doc_id").as("mx"))
    val dd = docs.crossJoin(broadcast(mx))
    val corpus = dd.filter(col("doc_id") * 5 < (col("mx") + 1) * 4)
      .select("doc_id", "text")
    // batch side: collapse-first reps, exactly the shipped probe shape
    val batch = dd.filter(col("doc_id") * 5 >= (col("mx") + 1) * 4)
      .select(col("doc_id"), col("text"),
        functions.TextFns.fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("doc_id"),
        min_by(col("text"), col("doc_id")).as("text"))
      .select("doc_id", "text")
    batch.write.mode("overwrite").parquet(s"$scratch/batch")
    val batchS = s.read.parquet(s"$scratch/batch")

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

    reps.foreach { k =>
      // k bit-identical replicas per corpus doc, fresh ids (the crawl
      // flood: the same boilerplate page under k URLs)
      val replicated = corpus.crossJoin(
          s.range(k).select(col("id").as("rep")))
        .select((col("doc_id") * k + col("rep")).as("doc_id"), col("text"))
      Seq(("4x4", 4, 4), ("8x2", 8, 2), ("8x4", 8, 4)).foreach {
        case (nm, b, r) =>
          val idxPath = s"$scratch/idx_${nm}_$k"
          operators.TextDedup.minhashBandIndex(replicated, 2, b, r)
            .write.mode("overwrite").parquet(idxPath)
          val idx = s.read.parquet(idxPath)
          val (t, nCand) = minOf3(() =>
            operators.TextDedup.incrementalMatchPairs(idx, batchS,
              shingleN = 2, bands = b, rowsPerBand = r, minEst = 0.0)
              .count())
          println(f"[bandflood] family=$nm k=$k%3d probe=$t%6.2fs " +
            f"cand=$nCand%,12d")
      }
    }
    s.stop()
  }
}
