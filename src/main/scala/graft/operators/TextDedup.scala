package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication suite for training-data pipelines.
  *
  * Scale design notes (the point of each variant):
  *  - exact: one hash-shuffle on a 32-byte fingerprint — the cheapest
  *    possible global dedup; at 100 TB the shuffle carries only
  *    (fingerprint, doc_id), not the text.
  *  - minhashLsh: MinHash signatures are a per-row projection (no shuffle);
  *    LSH banding turns all-pairs O(n²) into a self-join on (band, hash)
  *    buckets — shuffle is by band key, candidate pairs only within
  *    buckets. Signature hashing uses md5 so any engine reproduces it.
  *  - ngramJaccard: exact verification on candidate pairs only.
  *  - simhash: 16-bit signature groups near-identical token multisets.
  */
object TextDedup {

  /** Exact dedup by normalized-content fingerprint: keep min doc_id per
    * fingerprint, count duplicates.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextFns.fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("dup_count"))

  /** Candidate near-dup pairs via MinHash + LSH banding, with signature-
    * estimated Jaccard. k = bands * rowsPerBand minhashes.
    * Returns (doc_a, doc_b, est_jaccard) for pairs sharing >= 1 band,
    * est_jaccard >= minEst, doc_a < doc_b.
    */
  def minhashLshPairs(docs: DataFrame, shingleN: Int, bands: Int,
                      rowsPerBand: Int, minEst: Double): DataFrame = {
    val k = bands * rowsPerBand
    val sigd = docs
      .select(col("doc_id"),
        TextFns.shingles(TextFns.tokens(col("text")), shingleN).as("sh"))
      .select(col("doc_id"), TextFns.minhashSignature(col("sh"), k).as("sig"))

    // explode into (band, bandHash) bucket keys — one shuffle by bucket
    val banded = sigd.select(
      col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(array_join(slice(col("sig"), b * lit(rowsPerBand) + 1, lit(rowsPerBand)), ",")))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

    val a = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))

    a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          eq => eq)).cast("double") / k).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minEst)
      .withColumn("est_jaccard", round(col("est_jaccard"), 4))
  }

  /** Exact n-gram Jaccard over candidate pairs bucketed by (lang, length
    * band) — a deterministic blocking strategy that bounds the pair count.
    */
  def ngramJaccardPairs(docs: DataFrame, shingleN: Int, lenBand: Int,
                        minJaccard: Double): DataFrame = {
    val withSets = docs.select(
      col("doc_id"), col("lang"),
      (col("n_chars") / lenBand).cast("long").as("len_bucket"),
      array_distinct(TextFns.shingles(TextFns.tokens(col("text")), shingleN)).as("sh"))
    val a = withSets.select(col("lang"), col("len_bucket"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = withSets.select(col("lang"), col("len_bucket"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("lang", "len_bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_distinct(array_union(col("sh_a"), col("sh_b")))))
      .filter(col("uni") > 0)
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** SimHash grouping: docs sharing a 16-bit simhash signature. */
  def simhashGroups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextFns.simhash16(TextFns.tokens(col("text"))).as("simhash"))
      .groupBy("simhash")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc_id"))
      .filter(col("n_docs") > 1)
}
