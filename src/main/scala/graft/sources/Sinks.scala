package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Output sinks with the reference's three write modes
  * (`README.md:112-114`, `src/bq_loader.py:139-142`):
  * append-only logs, latest-wins upsert, full truncate-rebuild.
  *
  * The warehouse is plain Parquet (the reference's own stated migration
  * path away from BigQuery). Upsert without a transactional table format
  * is read-union-dedup-rewrite: correct and idempotent, one shuffle on
  * the key. On a real lakehouse swap `upsertParquet` for a MERGE INTO.
  */
object Sinks {

  /** S5-append: append-only fact log. */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** S7: truncate-load (WRITE_TRUNCATE analogue). */
  def overwriteParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Materialize `df` at `path` safely even when `df`'s lineage READS from
    * `path`: write to a sibling temp directory first, then swap via rename.
    * The round-1 cache()+overwrite pattern could lose the table — cache
    * eviction or executor loss mid-overwrite recomputes the plan against
    * already-deleted source files. Rename is atomic on HDFS/local FS; on an
    * object store swap this for a transactional table format's commit.
    */
  private def writeSwap(df: DataFrame, path: String): Unit =
    writeSwapWith(df.sparkSession, path)(
      tmp => df.write.mode("overwrite").parquet(tmp))

  /** The swap dance with a caller-supplied writer (flat, partitioned,
    * bucketed — anything that materializes a directory at the tmp path).
    *
    * Crash recovery on entry, BEFORE any delete: (a) a previous run that
    * died between its two renames left the live table only at `.__old__`
    * — restore it first (the writer's lineage may read `path`, and the
    * salvage below needs a live tree to land in); (b) a leftover
    * `.__swap__` from a crashed `KeyedStore.compact` may hold carried
    * `batch_<id>` dirs that are the ONLY copy of a checkpoint-
    * acknowledged micro-batch (the carry-over RENAMES them out of the
    * live tree before the swap) — those are renamed back into the live
    * tree instead of deleted with the rest of the failed fold (the live
    * tree still holds everything the fold itself read, so only the
    * carried batches need rescue; a dir the live tree re-acquired via
    * replay is skipped, its rows are identical by the pure-function
    * contract).
    */
  private[graft] def writeSwapWith(spark: SparkSession, path: String)
                                  (doWrite: String => Unit): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".__swap__")
    val old = new org.apache.hadoop.fs.Path(path + ".__old__")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Hadoop rename signals failure by RETURNING false, not throwing
    // (cross-device local renames, dst-parent anomalies): every return
    // must be checked, or a failed swap would fall through to a delete
    // and remove the only remaining copy of the table.
    def renameOrDie(src: org.apache.hadoop.fs.Path,
                    dst: org.apache.hadoop.fs.Path): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(
          s"rename $src -> $dst failed; previous table left intact at $old")
    if (fs.exists(old) && !fs.exists(target)) renameOrDie(old, target)
    if (fs.exists(tmp)) {
      if (fs.exists(target)) fs.listStatus(tmp).foreach { e =>
        val n = e.getPath.getName
        if (e.isDirectory && n.matches("batch_\\d+") &&
            fs.exists(new org.apache.hadoop.fs.Path(e.getPath, "_SUCCESS")) &&
            !fs.exists(new org.apache.hadoop.fs.Path(target, n)))
          renameOrDie(e.getPath, new org.apache.hadoop.fs.Path(target, n))
      }
      fs.delete(tmp, true)
    }
    doWrite(tmp.toString)
    // two renames, never delete-before-replace: a crash between them
    // leaves the previous table recoverable at `.__old__` instead of
    // gone — data is only deleted after the new table is in place.
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target)) renameOrDie(target, old)
    renameOrDie(tmp, target)
    fs.delete(old, true); ()
  }

  /** Read the current table at `path`, or None when it does not exist
    * yet. ONLY missing-path analysis errors mean "first write" — any
    * other failure (corrupt footer, transient IO) must propagate:
    * swallowing it would make the merge rebuild from the batch alone and
    * silently drop the table's history.
    */
  private[graft] def readExisting(spark: SparkSession, path: String,
                                  cols: Seq[String]): Option[DataFrame] =
    try Some(spark.read.parquet(path)
      .select(cols.map(org.apache.spark.sql.functions.col): _*))
    catch {
      case e: org.apache.spark.sql.AnalysisException
        if e.getErrorClass == "PATH_NOT_FOUND" => None
    }

  /** [[readExisting]] without a column contract — for callers that must
    * inspect what columns an existing table HAS before deciding how to
    * read it (the KeyedStore legacy-tombstone migration: a pre-stamp
    * layout lacks `forgotten_at_ms`, and a column-selecting read would
    * fail with an unresolved-column error instead of None).
    */
  private[graft] def readExistingAny(spark: SparkSession,
                                     path: String): Option[DataFrame] =
    try Some(spark.read.parquet(path))
    catch {
      case e: org.apache.spark.sql.AnalysisException
        if e.getErrorClass == "PATH_NOT_FOUND" => None
    }

  /** S5-upsert: idempotent latest-wins upsert by key — the Mongo
    * `UpdateOne(upsert=True)` analogue. Re-running with the same batch
    * changes nothing.
    */
  def upsertParquet(spark: SparkSession, batch: DataFrame, path: String,
                    keys: Seq[String], order: Seq[Column]): Unit = {
    val existing = readExisting(spark, path, batch.columns.toSeq)
    val merged = existing match {
      case Some(old) =>
        graft.operators.Dedup.latestWins(old.unionByName(batch), keys, order)
      case None => batch
    }
    writeSwap(merged, path)
  }

  /** Grain-replace merge: delete existing rows whose key tuple is in
    * `deleteKeys` (defaults to the batch's own key tuples), insert the
    * batch — `MERGE ... WHEN MATCHED THEN UPDATE/DELETE` for recomputed
    * aggregates. Unlike `upsertParquet`, incoming rows are authoritative
    * whole-grain recomputes, not candidate versions to order among; an
    * explicit `deleteKeys` lets a caller retract grains that recomputed
    * to empty (no surviving rows to carry the key).
    */
  def replaceKeysParquet(spark: SparkSession, batch: DataFrame, path: String,
                         keys: Seq[String],
                         deleteKeys: Option[DataFrame] = None): Unit = {
    import org.apache.spark.sql.functions.col
    val existing = readExisting(spark, path, batch.columns.toSeq)
    val dk = deleteKeys.getOrElse(batch.select(keys.map(col): _*).distinct())
    val merged = existing match {
      case Some(old) =>
        // null-safe anti join: a name-based join uses plain equality, so
        // existing rows with a null key column would never match a delete
        // key and could never be replaced or retracted
        val dkk = dk.select(keys.map(c => col(c).as(s"__dk_$c")): _*).distinct()
        val cond = keys.map(c => col(c) <=> col(s"__dk_$c")).reduce(_ && _)
        old.join(dkk, cond, "left_anti")
          .unionByName(batch)
      case None => batch
    }
    writeSwap(merged, path)
  }

  /** S6: single-file CSV report sink. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Date-partitioned fact layout: one directory per partition value, so
    * date-ranged queries prune at the file listing (PartitionFilters in
    * the scan) — the default physical layout for 100 TB fact tables.
    */
  def writeDatePartitioned(df: DataFrame, path: String, dateCol: String): Unit =
    df.write.mode("overwrite").partitionBy(dateCol).parquet(path)

  /** Small-files compaction — the maintenance pass every streaming or
    * micro-batch ingest needs: thousands of KB-sized files per partition
    * turn a 100 TB scan into a file-listing + task-scheduling disaster
    * (one task per tiny file, footer reads dominating IO). Rewrites the
    * directory into ceil(rows / maxRecordsPerFile) files via one
    * round-robin repartition, swapping atomically through `writeSwap`
    * (safe even though the plan reads the path it replaces; a crash
    * leaves the previous table recoverable). Flat directories only —
    * compact date-partitioned layouts one partition directory at a time,
    * which is also the only granularity that bounds the rewrite at scale.
    * Returns (files_before, files_after).
    */
  def compactParquet(spark: SparkSession, path: String,
                     maxRecordsPerFile: Long): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Long =
      fs.listStatus(p).count(s => s.isFile
        && s.getPath.getName.endsWith(".parquet")).toLong
    val before = dataFiles()
    val df = spark.read.parquet(path)
    val target = math.max(1L,
      (df.count() + maxRecordsPerFile - 1) / maxRecordsPerFile).toInt
    writeSwap(df.repartition(target), path)
    (before, dataFiles())
  }

  /** Read an append-maintained partitioned store whose tree can MIX two
    * layouts across compaction cycles: flat appended dirs
    * (`base/`, `batch_<id>/` — partition values live IN the data files)
    * and `col=value/` dirs from a previous [[compactPartitioned]] run
    * (values live in the DIRECTORY NAMES; `partitionBy` stripped them
    * from the files). A single `recursiveFileLookup` read over such a
    * tree is wrong twice: the flag disables partition inference, so
    * directory-encoded values vanish, and Spark then either throws
    * (column missing) or fills nulls depending on which file's footer it
    * samples. So the two layouts are listed apart and read separately —
    * each under the caller's explicit `schema` (the
    * `Scratch.stagedFramePartitioned` contract: partition-column types
    * must never be re-inferred) — then unioned by name.
    */
  def readPartitionedTree(spark: SparkSession, path: String,
                          partCols: Seq[String],
                          schema: org.apache.spark.sql.types.StructType)
      : DataFrame = {
    val (hive, flat) =
      readPartitionedTreeParts(spark, path, partCols, schema)
    val parts = Seq(hive, flat).flatten
    require(parts.nonEmpty, s"readPartitionedTree: no data under $path")
    parts.reduce(_ unionByName _)
  }

  /** The two layout halves of a mixed store tree, separately:
    * `(hive-partitioned dirs from a prior compaction, flat appended
    * dirs)` — for callers that must RECONCILE the halves (a micro-batch
    * replayed after compaction re-lands rows the compacted half already
    * holds; the reconcile is an anti-join of big-compacted vs
    * small-recent, which needs the halves apart — see
    * `AnnStream.storeCodes`).
    */
  private[graft] def readPartitionedTreeParts(
      spark: SparkSession, path: String, partCols: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      // which flat dirs to read (by name) — KeyedStore.serve narrows to
      // its admitted set (committed, above the compaction watermark,
      // generation-stamped); the default reads them all
      flatAdmit: String => Boolean = _ => true)
      : (Option[DataFrame], Option[DataFrame]) = {
    import org.apache.spark.sql.functions.col
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(p).filter { e =>
      val n = e.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    val (hive, flatAll) = entries.partition(e =>
      e.isDirectory && partCols.exists(c => e.getPath.getName.startsWith(c + "=")))
    val flat = flatAll.filter(e => flatAdmit(e.getPath.getName))
    val cols = schema.fieldNames.map(col).toIndexedSeq
    (if (hive.isEmpty) None
     else Some(spark.read.schema(schema).option("basePath", path)
       .parquet(hive.map(_.getPath.toString).toIndexedSeq: _*)
       .select(cols: _*)),
     if (flat.isEmpty) None
     else Some(spark.read.schema(schema).option("recursiveFileLookup", "true")
       .parquet(flat.map(_.getPath.toString).toIndexedSeq: _*)
       .select(cols: _*)))
  }

  /** [[compactParquet]] for a PARTITIONED store: fold a directory tree
    * of appended batch outputs (the `AnnStream.ivfpqIngestStream` shape —
    * `base/` plus one flat `batch_<id>/` per micro-batch) back into ONE
    * Hive-partitioned layout, the scan-prunable form the staged-index
    * probes rely on. This is the RECURRING compaction cadence every
    * append-maintained index runs — compact, ingest more batches,
    * compact again — so the input is read through
    * [[readPartitionedTree]], which handles the mixed tree a second run
    * sees (prior run's `col=value/` dirs + fresh flat batch dirs); the
    * caller supplies the store schema explicitly, the same reason
    * `Scratch.stagedFramePartitioned` carries one. `transform` (default
    * identity) edits rows inside the same crash-safe rewrite — pass a
    * key anti-join to run a right-to-be-forgotten delete and the
    * compaction as ONE pass over the store. `maxRecordsPerFile` bounds a
    * hot partition value into ceil(rows/max) files instead of one
    * unbounded file — scans still prune at partition granularity. Same
    * two-rename swap as every other sink here. Returns
    * (dataFilesBefore, dataFilesAfter).
    */
  def compactPartitioned(spark: SparkSession, path: String,
                         partCols: Seq[String],
                         schema: org.apache.spark.sql.types.StructType,
                         transform: DataFrame => DataFrame = identity,
                         maxRecordsPerFile: Option[Long] = None)
      : (Long, Long) = {
    import org.apache.spark.sql.functions.col
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Long = {
      var n = 0L
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
    val before = dataFiles()
    // the writer below runs while the old tree still exists, so lineage
    // reading `path` is safe — the swap happens only after the write
    val df = transform(readPartitionedTree(spark, path, partCols, schema))
    writeSwapWith(spark, path) { tmp =>
      val w = df.repartition(partCols.map(col): _*)
        .write.mode("overwrite")
      maxRecordsPerFile.fold(w)(n => w.option("maxRecordsPerFile", n))
        .partitionBy(partCols: _*).parquet(tmp)
    }
    (before, dataFiles())
  }

  /** Bucketed managed tables: co-locates both sides of a recurring
    * equi-join at write time; joins between tables bucketed by the same
    * key and count run with NO shuffle exchange on either side.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }
}
