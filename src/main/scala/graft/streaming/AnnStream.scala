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
    * the PQ index of `indexDir`'s corpus; append per-batch top-k verdicts
    * to `outDir`.
    */
  def pqProbeStream(s: SparkSession, queryDir: String, indexDir: String,
                    outDir: String,
                    maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val (cent, codes) = SimilarityQueries.pqIndex(s, indexDir)
    val reader = s.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      // query files usually arrive as per-batch DIRECTORIES (a Spark
      // writer's output); the flat file source needs the recursive flag
      // to see their part files (hidden _SUCCESS markers stay filtered)
      .option("recursiveFileLookup", "true")
    val queries = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(queryDir)
    queries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        SimilarityQueries
          .pqProbe(SimilarityQueries.pqCells(SimilarityQueries.pqQuantize(batch)),
            cent, codes)
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
  }
}
