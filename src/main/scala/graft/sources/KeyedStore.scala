package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Lifecycle of an append-maintained keyed index store — the shape every
  * streamed index in this engine converges to: a `base/` directory plus
  * one flat `batch_<id>/` per ingested micro-batch, periodically folded
  * into ONE Hive-partitioned layout by [[compact]], with durable
  * right-to-be-forgotten tombstones. Shared by the IVF-PQ code store
  * (`AnnStream`, key = vec_id, partitioned by cid) and the MinHash band
  * index store (`DocStream`, key = doc_id, partitioned by band) — one
  * lifecycle, two index families.
  *
  * Invariants the three entry points maintain together:
  *  - index rows must be a PURE per-key function of frozen parameters
  *    (quantizers / hash family), so replayed batches re-land identical
  *    rows and append ≡ rebuild;
  *  - a micro-batch replayed AFTER a compaction folded its rows re-lands
  *    its `batch_<id>` dir next to the compacted `col=value/` dirs —
  *    [[serve]] reconciles by broadcast anti-join (compacted-vs-recent
  *    keys; the flat half is small, only batches since the last
  *    compaction), never a store-wide dedup shuffle;
  *  - forgotten keys live in `_tombstones/` (underscore = invisible to
  *    every data read), filter every [[serve]] — including rows a replay
  *    physically resurrects — and become physical at the next
  *    [[compact]], which carries the tombstones across the swap because
  *    they must keep guarding until no replay can re-land those rows.
  */
object KeyedStore {

  private def tombstonePath(storeDir: String): String =
    s"$storeDir/_tombstones"

  private def tombstones(s: SparkSession, storeDir: String,
                         keyCol: String): Option[DataFrame] =
    Sinks.readExisting(s, tombstonePath(storeDir), Seq(keyCol))

  /** The serving view: mixed-tree read (prior compactions + appended
    * batches) under the caller's explicit schema, replay duplicates
    * reconciled, tombstoned keys filtered. This is the ONE read-side
    * path every probe of a maintained store goes through.
    */
  def serve(s: SparkSession, storeDir: String, partCols: Seq[String],
            schema: org.apache.spark.sql.types.StructType,
            keyCol: String): DataFrame = {
    val (hive, flat) =
      Sinks.readPartitionedTreeParts(s, storeDir, partCols, schema)
    val merged = (hive, flat) match {
      case (Some(h), Some(f)) =>
        h.join(broadcast(f.select(keyCol).distinct()),
            Seq(keyCol), "left_anti")
          .unionByName(f)
      case (h, f) => h.orElse(f).getOrElse(
        throw new IllegalStateException(s"empty keyed store at $storeDir"))
    }
    tombstones(s, storeDir, keyCol) match {
      case Some(t) =>
        merged.join(broadcast(t.select(keyCol).distinct()),
          Seq(keyCol), "left_anti")
      case None => merged
    }
  }

  /** Right-to-be-forgotten: record `ids` (a one-column frame named
    * `keyCol`) in the store's durable tombstone list — idempotent
    * set-union through the crash-safe upsert sink. Durable from this
    * point; physical at the next [[compact]].
    */
  def forget(s: SparkSession, storeDir: String, keyCol: String,
             ids: DataFrame): Unit =
    Sinks.replaceKeysParquet(s, ids.select(keyCol).distinct(),
      tombstonePath(storeDir), Seq(keyCol))

  /** Compaction cadence: fold the whole tree through the [[serve]]
    * reconcile into ONE partitioned layout (crash-safe two-rename swap),
    * making deletes physical and restoring one-file-per-partition-value
    * scans. Returns (dataFilesBefore, dataFilesAfter), tombstone files
    * excluded from both counts.
    */
  def compact(s: SparkSession, storeDir: String, partCols: Seq[String],
              schema: org.apache.spark.sql.types.StructType,
              keyCol: String): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    def dataFiles(): Long = {
      var n = 0L
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")
          && !f.toString.contains("/_tombstones/")) n += 1
      }
      n
    }
    val before = dataFiles()
    // the writer runs while the old tree still exists; the swap happens
    // only after the write, so lineage reading storeDir is safe
    val df = serve(s, storeDir, partCols, schema, keyCol)
    Sinks.writeSwapWith(s, storeDir) { tmp =>
      df.repartition(partCols.map(col): _*)
        .write.mode("overwrite").partitionBy(partCols: _*).parquet(tmp)
      val oldT = new org.apache.hadoop.fs.Path(tombstonePath(storeDir))
      if (fs.exists(oldT))
        org.apache.hadoop.fs.FileUtil.copy(fs, oldT, fs,
          new org.apache.hadoop.fs.Path(tombstonePath(tmp)), false,
          s.sparkContext.hadoopConfiguration)
    }
    (before, dataFiles())
  }
}
