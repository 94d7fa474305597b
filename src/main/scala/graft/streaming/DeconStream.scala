package graft.streaming

import graft.functions.TextFns
import graft.queries.SimilarityQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming FUSED decontamination — the continuous twin of batch
  * `dd_decon_fused`: both families' evidence is produced per arriving
  * micro-batch, and the union-with-provenance verdict is served through
  * the SAME combiner code the batch row uses
  * ([[SimilarityQueries.fuseDecon]]), so the fusion semantics cannot
  * drift between the engines (the purchaseAttribution doctrine:
  * streamed verdicts spec-asserted row-equal to batch on the same
  * split — DeconStreamSpec).
  *
  * Why per-batch emission is EXACT here, not approximate:
  *  - lexical: a document's 5-gram set is complete within its own row,
  *    and the eval shingle index is a frozen benchmark-sized artifact
  *    staged at stream definition — so an arriving doc's
  *    (doc, eval, shared_ngrams) rows are final the moment its batch
  *    lands. No cross-batch state at all.
  *  - semantic: an arriving vector's integer ADC distance to each eval
  *    whose probed cells contain it is a pure per-vector function of
  *    the frozen quantizers + the staged eval distance tables, so
  *    per-batch candidate rows are final too; what is NOT final is the
  *    shortlist membership (an eval's top-PqR can be evicted by a later
  *    arrival), so candidates stream in Append mode and the top-PqR +
  *    exact-verify + tau reduction runs at serve time
  *    ([[fusedVerdicts]]) — exactly how `DocStream.nearDupCandidates`
  *    splits exact per-bucket candidates from the global per-doc argmax.
  *    Top-k distributes over candidate-set union, so the served
  *    shortlist equals the one-shot batch probe's.
  *
  * Scale shape per micro-batch: lexical is batch-shingles × broadcast
  * eval index (the corpus is never re-shingled); semantic is batch
  * encode + one broadcast join against the staged distance tables
  * (E·nprobe·M·K rows — benchmark-sized). The corpus is never
  * rescanned; the candidate sink grows with flagged-evidence volume,
  * bounded by E×(corpus in probed cells), the same asymptotics as the
  * batch chain's shuffle.
  */
object DeconStream {

  /** Per-batch LEXICAL evidence stream: arriving (doc_id, text) rows are
    * shingled and joined against the staged eval-set shingle index; each
    * micro-batch lands its final (doc_id, eval_id, shared_ngrams) rows
    * as one idempotent `batch_<id>` dir (replay overwrites itself —
    * the pqProbeStream sink contract). Eval membership is the same
    * deterministic rule as the batch family (`doc_id % 20 == 0`);
    * arriving eval docs are not corpus rows and are skipped.
    */
  def lexicalEvidenceStream(s: SparkSession, docDir: String, d: String,
                            outDir: String,
                            maxFilesPerTrigger: Option[Int] = None,
                            checkpointDir: Option[String] = None)
      : StreamingQuery = {
    val docs = graft.Tables.documents(s, d)
    // the frozen benchmark artifact: eval docs' distinct 5-gram index,
    // staged once at definition (benchmark-sized at any corpus scale)
    val evalShPath = graft.Scratch.dir(s, "graft_decon_evalsh_") + "/evalsh"
    val evalSh = graft.Scratch.writeRead(
      docs.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("eval_id"), TextFns.tokens(col("text")).as("tk"))
        .select(col("eval_id"),
          explode(array_distinct(TextFns.shingles(col("tk"), 5))).as("g")),
      evalShPath)
    val reader = s.readStream.schema("doc_id BIGINT, text STRING")
      .option("recursiveFileLookup", "true")
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(docDir)
    val writer = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.filter(col("doc_id") % 20 =!= 0)
          .select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
          .select(col("doc_id"),
            explode(array_distinct(TextFns.shingles(col("tk"), 5))).as("g"))
          .join(broadcast(evalSh), "g")
          .groupBy("doc_id", "eval_id")
          .agg(count(lit(1)).as("shared_ngrams"))
          .filter(col("shared_ngrams") >= 2)
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
        ()
      }
    checkpointDir.fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
  }

  /** Per-batch SEMANTIC candidate stream: arriving (vec_id, embedding)
    * corpus vectors are encoded against the frozen IVF-PQ quantizers
    * and ADC-scored against the staged eval distance tables; each
    * micro-batch lands its final (query_id, vec_id, adc_dist) candidate
    * rows idempotently. The shortlist cut (top-PqR per eval) happens at
    * serve time in [[fusedVerdicts]] — eviction by later arrivals is
    * exactly why candidates, not verdicts, are what streams.
    */
  def semanticCandidatesStream(s: SparkSession, vecDir: String, d: String,
                               outDir: String,
                               maxFilesPerTrigger: Option[Int] = None,
                               checkpointDir: Option[String] = None)
      : StreamingQuery = {
    val (coarse, rcent, _) = SimilarityQueries.ivfpqIndex(s, d)
    val evalQ = SimilarityQueries.queryBatch(s, d,
      SimilarityQueries.semEvalN(s))
    val (_, dt) = SimilarityQueries.ivfpqQueryFrames(evalQ, coarse, rcent)
    // stage the eval distance tables once — every micro-batch joins
    // against the parquet artifact, never re-deriving the probe side
    val dtPath = graft.Scratch.dir(s, "graft_decon_dt_") + "/dt"
    val dtS = graft.Scratch.writeRead(dt, dtPath)
    val reader = s.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("recursiveFileLookup", "true")
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(vecDir)
    val writer = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SimilarityQueries.adcCandidates(
            SimilarityQueries.ivfpqEncode(batch, coarse, rcent), dtS)
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
        ()
      }
    checkpointDir.fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
  }

  /** Serve the fused verdicts from the two accumulated evidence sinks:
    * top-PqR per eval over all streamed ADC candidates (≡ the one-shot
    * probe's shortlist — top-k distributes over union), the SAME
    * exact-verify + tau tail as the batch family
    * ([[SimilarityQueries.semVerifyFlags]]), the SAME per-doc lexical
    * best reduction, and the SAME union-with-provenance combiner.
    * Row-equal to `dd_decon_fused` once every corpus row has streamed
    * through (DeconStreamSpec's assertion).
    *
    * Duplicate arrivals are reduced defensively: the batch-equality
    * contract wants each vec_id streamed in exactly one micro-batch,
    * but a vector landing in TWO source files yields two identical
    * (query_id, vec_id) candidate rows — ranked naively they would
    * occupy two shortlist slots where the one-shot probe (which sums a
    * vector's code rows once) holds one, silently breaking the
    * row-equality. A min-reduce per (query_id, vec_id) before the
    * top-k restores the one-shot shape for re-sent identical content;
    * note it is NOT an upsert — two arrivals carrying DIFFERENT
    * embeddings under one vec_id keep the closer one, so re-ingest a
    * changed vector through the store path, not this sink.
    */
  def fusedVerdicts(s: SparkSession, d: String,
                    lexDir: String, semDir: String): DataFrame = {
    val evalN = SimilarityQueries.semEvalN(s)
    val lex = s.read
      .schema("doc_id BIGINT, eval_id BIGINT, shared_ngrams BIGINT")
      .option("recursiveFileLookup", "true").parquet(lexDir)
    val semCands = s.read
      .schema("query_id BIGINT, vec_id BIGINT, adc_dist BIGINT")
      .option("recursiveFileLookup", "true").parquet(semDir)
      .groupBy("query_id", "vec_id")
      .agg(min("adc_dist").as("adc_dist"))
    val short = SimilarityQueries
      .adcTopK(semCands, SimilarityQueries.PqR)
      .filter(col("neighbor_id") >= evalN)
      .select(col("query_id").as("eval_id"), col("neighbor_id").as("vec_id"))
    SimilarityQueries.fuseDecon(
      SimilarityQueries.lexBestOf(lex),
      SimilarityQueries.semVerifyFlags(s, d, short))
  }
}
