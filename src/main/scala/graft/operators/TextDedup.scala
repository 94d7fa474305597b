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
    val parallelism = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val sigd = docs
      .repartition(parallelism) // k md5s per shingle: spread the hash work
      .select(col("doc_id"),
        TextFns.shingles(TextFns.tokens(col("text")), shingleN).as("sh"))
      .select(col("doc_id"), TextFns.minhashSignature(col("sh"), k).as("sig"))
      // both legs of the self-join read this — persist so signatures are
      // computed once, not once per leg
      .persist()

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
    *
    * Inverted-index formulation: explode shingles, self-join on
    * (block, shingle), count shared shingles per pair, then
    * |A∪B| = |A| + |B| − |A∩B|. Compared to a pairwise array-intersect
    * join this never materializes O(pairs) shingle arrays — the shuffle
    * carries (block, shingle, doc_id) rows and the pair work is a count,
    * so it parallelizes across shingle buckets instead of serializing on
    * a handful of block keys. Pairs with zero shared shingles never
    * surface (their Jaccard is 0, below any useful threshold).
    */
  def ngramJaccardPairs(docs: DataFrame, shingleN: Int, lenBand: Int,
                        minJaccard: Double): DataFrame = {
    val parallelism = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val withSets = docs
      .repartition(parallelism) // spread shingle construction; scans are 1 task
      .select(
        col("doc_id"), col("lang"),
        (col("n_chars") / lenBand).cast("long").as("len_bucket"),
        array_distinct(TextFns.shingles(TextFns.tokens(col("text")), shingleN)).as("sh"))
    val sizes = withSets.select(col("doc_id"), size(col("sh")).as("sz"))
    // join on a 64-bit shingle hash instead of the string (collision odds
    // ~2^-64 per candidate pair — immaterial); persist so both self-join
    // legs share one computation of the shingle explosion
    val exploded = withSets.select(col("doc_id"), col("lang"), col("len_bucket"),
        explode(col("sh")).as("shingle"))
      .select(col("doc_id"), col("lang"), col("len_bucket"),
        xxhash64(col("shingle")).as("sh_h"))
      .persist()
    val a = exploded.select(col("lang"), col("len_bucket"), col("sh_h"),
      col("doc_id").as("doc_a"))
    val b = exploded.select(col("lang"), col("len_bucket"), col("sh_h"),
      col("doc_id").as("doc_b"))
    // shuffle-hash beats sort-merge: no point sorting 3-part keys to
    // produce an unordered pair-count aggregate
    a.join(b.hint("shuffle_hash"), Seq("lang", "len_bucket", "sh_h"))
      .filter(col("doc_a") < col("doc_b"))
      // pack the pair into one long: halves the groupBy key width and
      // hashing cost on the widest shuffle of the query (doc ids < 2^31)
      .select((col("doc_a") * 4294967296L + col("doc_b")).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("inter"))
      .select((col("pair") / 4294967296L).cast("long").as("doc_a"),
        pmod(col("pair"), lit(4294967296L)).cast("long").as("doc_b"), col("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .filter(col("uni") > 0)
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** SimHash grouping: docs sharing a 16-bit simhash signature.
    * The token-md5 array is projected in its own step so the 16 bit
    * extractors reference one computed column instead of re-hashing the
    * token list per bit (CollapseProject keeps non-cheap multi-referenced
    * projections separate); repartition spreads the hashing.
    */
  def simhashGroups(docs: DataFrame): DataFrame = {
    val parallelism = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    docs.repartition(parallelism)
      .select(col("doc_id"),
        transform(TextFns.tokens(col("text")), t => md5(t)).as("h"))
      .select(col("doc_id"), TextFns.simhash16FromHashes(col("h")).as("simhash"))
      .groupBy("simhash")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc_id"))
      .filter(col("n_docs") > 1)
  }
}
