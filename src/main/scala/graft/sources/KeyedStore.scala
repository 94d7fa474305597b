package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, input_file_name, lit, max, regexp_extract, when}
import org.apache.spark.sql.types.StructType

/** Lifecycle of an append-maintained keyed index store — the shape every
  * streamed index in this engine converges to: a `base/` directory plus
  * one flat `batch_<id>/` per ingested micro-batch, periodically folded
  * into ONE Hive-partitioned layout by [[compact]], with durable
  * right-to-be-forgotten tombstones. Shared by the IVF-PQ code store
  * (`AnnStream`, key = vec_id, partitioned by cid) and the MinHash band
  * index store (`DocStream`, key = doc_id, partitioned by band) — one
  * lifecycle, two index families.
  *
  * Invariants the entry points maintain together:
  *  - index rows must be a PURE per-key function of frozen parameters
  *    (quantizers / hash family), so replayed batches re-land identical
  *    rows and append ≡ rebuild;
  *  - across DIFFERENT batch dirs the newest batch wins wholesale per
  *    key: a key re-sent in a later micro-batch (a re-embedded vector, a
  *    re-crawled document) REPLACES its older flat rows — [[serve]]
  *    reconciles by a per-key max over the batch id parsed from the file
  *    path, an aggregate bounded by the flat half (batches since the
  *    last compaction, plus `base/` before the first);
  *  - a micro-batch replayed AFTER a compaction folded its rows re-lands
  *    its `batch_<id>` dir next to the compacted `col=value/` dirs —
  *    [[serve]] reconciles by broadcast anti-join (compacted-vs-recent
  *    keys; the flat half is small post-compaction), never a store-wide
  *    dedup shuffle;
  *  - forgotten keys live in `_tombstones/` (underscore = invisible to
  *    every data read) as (key, forgotten_at_ms) rows, filter every
  *    [[serve]] — including rows a replay physically resurrects — and
  *    become physical at the next [[compact]]. Tombstones are carried
  *    across the swap UNTIL they retire: a tombstone recorded at T
  *    guards only replays of batches that predate the forget, and the
  *    stream's checkpoint retention bounds how old a replayable batch
  *    can be — once `now - T >= retireHorizonMs` no replay can re-land
  *    those rows and the (by then physical) delete needs no guard. The
  *    tombstone anti-join carries NO broadcast hint: the set is bounded
  *    only by the retirement horizon, and the planner must stay free to
  *    shuffle it if right-to-forget traffic ever outgrows a broadcast.
  */
object KeyedStore {

  private val ForgottenAt = "forgotten_at_ms"

  private def tombstonePath(storeDir: String): String =
    s"$storeDir/_tombstones"

  private def tombstones(s: SparkSession, storeDir: String,
                         keyCol: String, withTs: Boolean): Option[DataFrame] =
    Sinks.readExisting(s, tombstonePath(storeDir),
      if (withTs) Seq(keyCol, ForgottenAt) else Seq(keyCol))

  private def hadoopFs(s: SparkSession, dir: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  /** Names of the flat (non-`col=value/`, non-underscore) dirs in the
    * store tree — the appended-batch half of the mixed layout.
    */
  private def flatDirNames(s: SparkSession, storeDir: String,
                           partCols: Seq[String]): Set[String] = {
    val (fs, p) = hadoopFs(s, storeDir)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator.filter { e =>
      val n = e.getPath.getName
      e.isDirectory && !n.startsWith("_") && !n.startsWith(".") &&
        !partCols.exists(c => n.startsWith(c + "="))
    }.map(_.getPath.getName).toSet
  }

  /** The serving view: mixed-tree read (prior compactions + appended
    * batches) under the caller's explicit schema, replay and re-send
    * duplicates reconciled, tombstoned keys filtered. This is the ONE
    * read-side path every probe of a maintained store goes through. A
    * store whose every key was forgotten and compacted away serves an
    * EMPTY frame (the directory still exists; readers must not brick).
    *
    * QUIESCED fast path: when every batch has been folded and every
    * tombstone retired ([[compact]] with a horizon), the tree is pure
    * `col=value/` dirs with no guard set, and serve returns the ONE
    * hive scan directly — no union, no anti-join — so dynamic partition
    * pruning applies to probes through the store exactly as it does to
    * the staged index (spec-locked in IvfConfSpec at the scan-metrics
    * level). The reconcile machinery prices only the store's churn.
    */
  def serve(s: SparkSession, storeDir: String, partCols: Seq[String],
            schema: StructType, keyCol: String): DataFrame = {
    val (hive, flat) =
      Sinks.readPartitionedTreeParts(s, storeDir, partCols, schema)
    // flat-vs-flat: newest batch wins wholesale per key. The batch id is
    // the part file's immediate parent dir (`batch_<id>/part-...`;
    // `base/` ranks below every batch). Bounded by the flat half — no
    // broadcast hint: before the first compaction `base/` IS the corpus
    // and the per-key max must be free to shuffle (map-side combinable).
    // the newest-wins self-join is a no-op (pure overhead on the serving
    // hot path) unless at least TWO flat dirs exist — within one writer
    // output a key appears once per its rows, so `base/`-only stores and
    // single-batch tails skip it entirely
    val nFlatDirs = flatDirNames(s, storeDir, partCols).size
    val flatLatest = flat.map { f =>
      if (nFlatDirs <= 1) f
      else {
        val m = regexp_extract(input_file_name(), "/batch_(\\d+)/[^/]+$", 1)
        // `base/` (and any non-batch dir) extracts "" — ANSI cast would
        // throw, so rank it explicitly below every batch id
        val b = when(m === "", lit(-1L)).otherwise(m.cast("long"))
        val fb = f.withColumn("__graft_batch", b)
        // null-key rows BYPASS the reconcile: they are not versions of
        // one key (a null-safe join would collapse them all to a single
        // "latest" row) and a plain equi-join would silently eat them
        // (the Sinks.replaceKeysParquet lesson) — they pass through
        // like every other read path keeps them
        val nulls = fb.filter(col(keyCol).isNull).drop("__graft_batch")
        val keyed = fb.filter(col(keyCol).isNotNull)
        val latest = keyed.groupBy(keyCol)
          .agg(max("__graft_batch").as("__graft_b2"))
          .withColumnRenamed(keyCol, "__graft_k2")
        keyed.join(latest, col(keyCol) === col("__graft_k2") &&
            col("__graft_batch") === col("__graft_b2"))
          .drop("__graft_batch", "__graft_b2", "__graft_k2")
          .unionByName(nulls)
      }
    }
    val merged = (hive, flatLatest) match {
      case (Some(h), Some(f)) =>
        // compacted-vs-recent: flat keys replace their compacted rows.
        // Keys come from the RAW flat read (same key set as the
        // reconciled frame, one scan cheaper); bounded by batches since
        // the last compaction, so the hint is safe (unlike the
        // tombstone side). Null-key hive rows never match an anti-join
        // key and correctly pass through.
        h.join(broadcast(flat.get.select(keyCol).distinct()),
            Seq(keyCol), "left_anti")
          .unionByName(f)
      case (Some(h), None) => h
      case (None, Some(f)) => f
      case (None, None) =>
        // data-less but real store (a missing DIR already failed fast in
        // the tree listing): everything forgotten + compacted away must
        // serve empty, not brick the store for readers
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema)
    }
    tombstones(s, storeDir, keyCol, withTs = false) match {
      case Some(t) =>
        merged.join(t.select(keyCol).distinct(), Seq(keyCol), "left_anti")
      case None => merged
    }
  }

  /** Right-to-be-forgotten: record `ids` (a one-column frame named
    * `keyCol`) in the store's durable tombstone list, stamped
    * `forgotten_at_ms = atMs` — idempotent set-union through the
    * crash-safe upsert sink (re-forgetting a key refreshes its stamp,
    * which only EXTENDS the guard). Durable from this point; physical at
    * the next [[compact]]; retired once the replay horizon passes.
    */
  def forget(s: SparkSession, storeDir: String, keyCol: String,
             ids: DataFrame, atMs: Long = System.currentTimeMillis()): Unit =
    Sinks.replaceKeysParquet(s,
      ids.select(keyCol).distinct().withColumn(ForgottenAt, lit(atMs)),
      tombstonePath(storeDir), Seq(keyCol))

  /** Tombstones still needed after a fold at `nowMs`: with a retirement
    * horizon, drop every tombstone old enough that no replayable batch
    * (checkpoint retention = `horizon`) can predate its forget — the
    * fold just made its delete physical, so it guards nothing.
    */
  private def unretired(t: DataFrame, retireHorizonMs: Option[Long],
                        nowMs: Long): DataFrame =
    retireHorizonMs.fold(t)(h => t.filter(col(ForgottenAt) > lit(nowMs - h)))

  /** Carry the unretired tombstones of `fromDir` into a new tree being
    * written at `tmpDir`. A FULLY-retired guard set writes nothing: its
    * absence is what re-enables the quiesced-store fast path in
    * [[serve]] (no flat dirs + no tombstone dir ⇒ serve is ONE
    * partition-prunable scan, DPP-eligible — the probe reads only its
    * probed partitions again, exactly like the staged index).
    */
  private def carryTombstones(s: SparkSession, fromDir: String,
                              tmpDir: String, keyCol: String,
                              retireHorizonMs: Option[Long],
                              nowMs: Long): Unit =
    tombstones(s, fromDir, keyCol, withTs = true).foreach { t =>
      val keep = unretired(t, retireHorizonMs, nowMs)
      if (!keep.isEmpty)
        keep.write.mode("overwrite").parquet(tombstonePath(tmpDir))
    }

  private def countDataFiles(s: SparkSession, storeDir: String): Long = {
    val (fs, p) = hadoopFs(s, storeDir)
    var n = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")
        && !f.toString.contains("/_tombstones/")) n += 1
    }
    n
  }

  /** Compaction cadence: fold the whole tree through the [[serve]]
    * reconcile into ONE partitioned layout (crash-safe two-rename swap),
    * making deletes physical and restoring one-file-per-partition-value
    * scans — `maxRecordsPerFile` bounds a hot partition value into
    * ceil(rows/max) files instead of one unbounded file (probes still
    * prune at partition granularity; only the per-file row bound
    * changes). Tombstones are carried across the swap minus the ones
    * [[unretired]] retires. A `batch_<id>` dir landed by a concurrent
    * ingest DURING the rewrite is re-listed and copied into the new tree
    * before the swap, so its committed micro-batch is not deleted with
    * the old tree; a batch landing in the hairline between that re-list
    * and the rename is still lost — pause ingest across compactions (or
    * accept replay-from-checkpoint re-landing it) if that window
    * matters. Returns (dataFilesBefore, dataFilesAfter), tombstone files
    * excluded from both counts.
    */
  def compact(s: SparkSession, storeDir: String, partCols: Seq[String],
              schema: StructType, keyCol: String,
              maxRecordsPerFile: Option[Long] = None,
              retireHorizonMs: Option[Long] = None,
              nowMs: Long = System.currentTimeMillis()): (Long, Long) =
    compactWithHook(s, storeDir, partCols, schema, keyCol,
      maxRecordsPerFile, retireHorizonMs, nowMs, () => ())

  /** [[compact]] with a test seam: `afterWrite` runs after the folded
    * data lands in the new tree but BEFORE the carry-over re-list — the
    * spec's stand-in for a concurrent ingest committing a micro-batch
    * mid-compaction.
    */
  private[graft] def compactWithHook(
      s: SparkSession, storeDir: String, partCols: Seq[String],
      schema: StructType, keyCol: String,
      maxRecordsPerFile: Option[Long],
      retireHorizonMs: Option[Long], nowMs: Long,
      afterWrite: () => Unit): (Long, Long) = {
    val before = countDataFiles(s, storeDir)
    val folded = flatDirNames(s, storeDir, partCols)
    // the writer runs while the old tree still exists; the swap happens
    // only after the write, so lineage reading storeDir is safe
    val df = serve(s, storeDir, partCols, schema, keyCol)
    Sinks.writeSwapWith(s, storeDir) { tmp =>
      writePartitioned(df, tmp, partCols, maxRecordsPerFile)
      afterWrite()
      // concurrent-ingest carry-over: batch dirs that appeared since the
      // fold snapshot move into the new tree untouched (serve reconciles
      // them like any other appended batch)
      val (fs, _) = hadoopFs(s, storeDir)
      (flatDirNames(s, storeDir, partCols) -- folded).foreach { d =>
        org.apache.hadoop.fs.FileUtil.copy(fs,
          new org.apache.hadoop.fs.Path(storeDir, d), fs,
          new org.apache.hadoop.fs.Path(tmp, d), false,
          s.sparkContext.hadoopConfiguration)
      }
      // tombstones are carried LAST — the final read before the swap —
      // so a forget() committed at any point during the long data
      // rewrite is still in the carried set ("durable from this point"
      // must survive a concurrent compaction). The hairline between
      // this read and the rename is the same one the batch carry-over
      // documents: pause forget traffic across compactions if it
      // matters, or re-issue after.
      carryTombstones(s, storeDir, tmp, keyCol, retireHorizonMs, nowMs)
    }
    (before, countDataFiles(s, storeDir))
  }

  /** Full re-index swap — the quantizer-rotation cadence: replace the
    * store's DATA wholesale with `newData` (already re-encoded against
    * fresh parameters, tombstoned keys excluded by the caller serving
    * through [[serve]]), written as one partitioned layout through the
    * same crash-safe swap as [[compact]]. Tombstones are carried minus
    * retirement — the rotation made every delete physical, but replays
    * of pre-rotation batches still need guarding until the horizon
    * passes. The store stays readable throughout: the old tree is only
    * renamed away after the new one is fully written.
    */
  /** Snapshot of the store's flat (appended-batch) dir names — take one
    * BEFORE reading the served view that feeds a re-index, and pass it
    * to [[replaceAll]] so ingest landing anywhere in the
    * serve → retrain → swap window is detected, not just during the
    * final rewrite.
    */
  private[graft] def flatSnapshot(s: SparkSession, storeDir: String,
                                  partCols: Seq[String]): Set[String] =
    flatDirNames(s, storeDir, partCols)

  def replaceAll(s: SparkSession, storeDir: String, partCols: Seq[String],
                 newData: DataFrame, keyCol: String,
                 maxRecordsPerFile: Option[Long] = None,
                 retireHorizonMs: Option[Long] = None,
                 nowMs: Long = System.currentTimeMillis(),
                 sinceSnapshot: Option[Set[String]] = None): Unit = {
    val before = sinceSnapshot.getOrElse(flatDirNames(s, storeDir, partCols))
    Sinks.writeSwapWith(s, storeDir) { tmp =>
      writePartitioned(newData, tmp, partCols, maxRecordsPerFile)
      // a re-index REQUIRES quiesced ingest (stronger than compact's
      // carry-over): a batch landed during the rewrite holds rows
      // derived under the OLD parameters — carrying it would serve
      // stale-parameter rows via the newest-wins reconcile, dropping it
      // would silently lose a committed batch. Fail the swap instead
      // (writeSwapWith aborts before any rename, old tree intact) and
      // make the caller stop ingest and re-run the rotation.
      val landed = flatDirNames(s, storeDir, partCols) -- before
      if (landed.nonEmpty)
        throw new IllegalStateException(
          s"replaceAll: ingest batches landed during the re-index " +
            s"(${landed.mkString(", ")}) — stop the ingest stream across " +
            "a rotation, then re-run it")
      carryTombstones(s, storeDir, tmp, keyCol, retireHorizonMs, nowMs)
    }
  }

  private def writePartitioned(df: DataFrame, path: String,
                               partCols: Seq[String],
                               maxRecordsPerFile: Option[Long]): Unit = {
    val w = df.repartition(partCols.map(col): _*)
      .write.mode("overwrite")
    maxRecordsPerFile.fold(w)(n => w.option("maxRecordsPerFile", n))
      .partitionBy(partCols: _*).parquet(path)
  }
}
