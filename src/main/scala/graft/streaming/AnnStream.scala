package graft.streaming

import graft.queries.SimilarityQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous ANN serving over the persisted PQ index — the streaming
  * twin of batch `sim_pq`.
  *
  * Production shape: the corpus is encoded ONCE (codebook + code table,
  * [[graft.queries.SimilarityQueries.pqIndex]] — the dd_incremental
  * built-once-index doctrine); query vectors then ARRIVE as a stream and
  * each micro-batch runs the identical integer ADC probe against the
  * index inside `foreachBatch`. Because the probe is a pure per-batch
  * function of (query rows, index) with no cross-batch state, streamed
  * verdicts are BIT-EQUAL to the batch query over the same query set —
  * AnnStreamSpec asserts it row-for-row (the KmvStreamSpec doctrine:
  * equality, not an error band).
  *
  * Scale shape: per micro-batch the only moving parts are the broadcast
  * Q×PqM×PqK distance table and one (m, code) equi-join against the code
  * table — the raw corpus vectors never participate after encoding, and
  * query batches never shuffle the index side.
  */
object AnnStream {

  /** Probe a parquet stream of (vec_id, embedding) query vectors against
    * the PQ index of `indexDir`'s corpus; write per-batch top-k verdicts
    * under `outDir` (one `batch_<id>` subdirectory per micro-batch — read
    * the tree back with `recursiveFileLookup`).
    *
    * Exactly-once: pass `checkpointDir` so restarts resume from the last
    * committed offset instead of reprocessing the whole `queryDir`, and
    * note the sink writes each micro-batch to its OWN subdirectory with
    * overwrite — a micro-batch replayed after a failure lands on the same
    * `batch_<id>` path and replaces itself rather than duplicating
    * verdicts (a bare `mode("append").parquet(outDir)` would be
    * at-least-once). Without `checkpointDir` Spark uses a discarded temp
    * checkpoint: fine for tests, reprocess-from-scratch on restart.
    */
  def pqProbeStream(s: SparkSession, queryDir: String, indexDir: String,
                    outDir: String,
                    maxFilesPerTrigger: Option[Int] = None,
                    checkpointDir: Option[String] = None): StreamingQuery = {
    val (cent, codes) = SimilarityQueries.pqIndex(s, indexDir)
    val reader = s.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      // query files usually arrive as per-batch DIRECTORIES (a Spark
      // writer's output); the flat file source needs the recursive flag
      // to see their part files (hidden _SUCCESS markers stay filtered)
      .option("recursiveFileLookup", "true")
    val queries = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(queryDir)
    val writer = queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SimilarityQueries
          .pqProbe(SimilarityQueries.pqCells(SimilarityQueries.pqQuantize(batch)),
            cent, codes)
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
        ()
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** Continuous IVF-PQ serving — the streaming twin of batch
    * `sim_ivfpq`, against the same built-once index (coarse centroids +
    * residual codebooks + codes). Same contract as [[pqProbeStream]]:
    * per-batch pure probe (verdicts bit-equal to batch on the same query
    * set), per-batch `batch_<id>` subdirs overwritten on replay, resume
    * via `checkpointDir`.
    */
  def ivfpqProbeStream(s: SparkSession, queryDir: String, indexDir: String,
                       outDir: String,
                       maxFilesPerTrigger: Option[Int] = None,
                       checkpointDir: Option[String] = None): StreamingQuery = {
    val (coarse, rcent, codes) = SimilarityQueries.ivfpqIndex(s, indexDir)
    val reader = s.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("recursiveFileLookup", "true")
    val queries = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(queryDir)
    val writer = queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SimilarityQueries.ivfpqProbe(batch, coarse, rcent, codes)
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
        ()
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** Streaming INDEX MAINTENANCE — the continuous twin of batch
    * [[graft.queries.SimilarityQueries.mergeIvfpqCodes]] (and the ANN
    * sibling of DocStream's incremental dedup ingest): new corpus
    * vectors ARRIVE as a stream, each micro-batch is encoded against the
    * FROZEN quantizers of the base index (trained on `indexDir`'s
    * `vec_id < baseBound` prefix), and its code rows land as one
    * idempotent partition append. The maintained store is
    * self-contained under `codesOutDir`: `base/` (written once here,
    * overwrite-idempotent) plus one `batch_<id>/` per micro-batch —
    * read it back with `recursiveFileLookup` and serve probes through
    * it directly. A replayed micro-batch overwrites its own `batch_<id>`
    * path (exactly-once with `checkpointDir`, the pqProbeStream
    * contract). Because codes are a pure per-vector function of the
    * frozen quantizers, the store is row-identical to a one-pass encode
    * of base ∪ every ingested batch — AnnStreamSpec asserts equality to
    * the batch `sim_ivfpq_incr` serving path. Per-batch cost:
    * O(batch encode) — the corpus is never touched; compact the
    * accumulated batch dirs on the `Sinks.compactParquet` cadence.
    */
  def ivfpqIngestStream(s: SparkSession, vecDir: String, indexDir: String,
                        baseBound: Long, codesOutDir: String,
                        maxFilesPerTrigger: Option[Int] = None,
                        checkpointDir: Option[String] = None): StreamingQuery = {
    val (coarse, rcent, baseCodes) =
      SimilarityQueries.ivfpqIndexOn(s, indexDir, Some(baseBound))
    baseCodes.write.mode("overwrite").parquet(s"$codesOutDir/base")
    val reader = s.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("recursiveFileLookup", "true")
    val vecs = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(vecDir)
    val writer = vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SimilarityQueries.ivfpqEncode(batch, coarse, rcent)
          .write.mode("overwrite").parquet(s"$codesOutDir/batch_$batchId")
        ()
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  // ---- maintained-store lifecycle: serve / forget / compact ----

  private def tombstonePath(storeDir: String): String =
    // underscore prefix: invisible to every parquet read of the store
    // tree (Spark skips `_*` paths), so tombstones can live INSIDE the
    // store directory and travel with it
    s"$storeDir/_tombstones"

  private def tombstones(s: SparkSession, storeDir: String)
      : Option[DataFrame] =
    graft.sources.Sinks.readExisting(s, tombstonePath(storeDir),
      Seq("vec_id"))

  /** The serving view of an [[ivfpqIngestStream]] store — the ONE
    * read-side reconcile every probe goes through. Two hazards are
    * closed here, both with broadcast-sized work:
    *
    *  - **replay duplicates**: a micro-batch replayed AFTER a compaction
    *    folded its rows re-lands its `batch_<id>` dir next to the
    *    compacted `cid=N/` copies. The flat half is authoritative (its
    *    rows are identical re-encodes under frozen quantizers) and SMALL
    *    — only batches since the last compaction — so the reconcile is a
    *    broadcast anti-join of compacted-vs-recent vec_ids, never a
    *    store-wide dedup shuffle;
    *  - **forgotten vectors**: ids in the durable tombstone list
    *    ([[forgetVectors]]) are anti-joined out, so a deleted vector can
    *    never surface even while a replayed batch dir physically carries
    *    its rows again. Tombstones are forget REQUESTS — bounded by
    *    legal/ops volume, broadcast-sized at any corpus scale.
    */
  def storeCodes(s: SparkSession, storeDir: String,
                 schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val (hive, flat) = graft.sources.Sinks
      .readPartitionedTreeParts(s, storeDir, Seq("cid"), schema)
    val merged = (hive, flat) match {
      case (Some(h), Some(f)) =>
        h.join(broadcast(f.select("vec_id").distinct()),
            Seq("vec_id"), "left_anti")
          .unionByName(f)
      case (h, f) => h.orElse(f).getOrElse(
        throw new IllegalStateException(s"empty code store at $storeDir"))
    }
    tombstones(s, storeDir) match {
      case Some(t) =>
        merged.join(broadcast(t.select("vec_id").distinct()),
          Seq("vec_id"), "left_anti")
      case None => merged
    }
  }

  /** Right-to-be-forgotten over the maintained store: record `ids` in
    * the store's durable tombstone list (idempotent set-union through
    * the crash-safe upsert sink). The DELETE is durable from this point
    * — [[storeCodes]] filters tombstoned ids on every read, including
    * rows a replayed micro-batch re-lands later — and the next
    * [[compactStore]] makes it PHYSICAL. Tombstones survive compaction
    * deliberately: they must keep guarding until no replay can
    * resurrect the rows (the checkpoint has committed past every batch
    * that carried them).
    */
  def forgetVectors(s: SparkSession, storeDir: String,
                    ids: DataFrame): Unit =
    graft.sources.Sinks.replaceKeysParquet(
      s, ids.select("vec_id").distinct(), tombstonePath(storeDir),
      Seq("vec_id"))

  /** Compaction cadence for the maintained store: fold the whole tree —
    * prior compacted `cid=N/` dirs, appended `batch_<id>` dirs, replay
    * duplicates, tombstoned rows — through the [[storeCodes]] reconcile
    * into ONE cid-partitioned layout (crash-safe swap). After this pass
    * forgotten vectors are physically gone and every probe prunes on
    * `cid` again. Returns (dataFilesBefore, dataFilesAfter).
    */
  def compactStore(s: SparkSession, storeDir: String,
                   schema: org.apache.spark.sql.types.StructType)
      : (Long, Long) = {
    import org.apache.spark.sql.functions.col
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    def dataFiles(): Long = {
      var n = 0L
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next().getPath
        // tombstones are store metadata, not data files — and they are
        // the one `_`-prefixed subtree the swap must carry over
        if (f.getName.endsWith(".parquet")
          && !f.toString.contains("/_tombstones/")) n += 1
      }
      n
    }
    val before = dataFiles()
    val df = storeCodes(s, storeDir, schema)
    graft.sources.Sinks.writeSwapWith(s, storeDir) { tmp =>
      df.repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(tmp)
      // tombstones ride along into the new tree (they must keep guarding
      // replays of already-folded batches)
      val oldT = new org.apache.hadoop.fs.Path(tombstonePath(storeDir))
      if (fs.exists(oldT))
        org.apache.hadoop.fs.FileUtil.copy(fs, oldT, fs,
          new org.apache.hadoop.fs.Path(tombstonePath(tmp)), false,
          s.sparkContext.hadoopConfiguration)
    }
    (before, dataFiles())
  }
}
