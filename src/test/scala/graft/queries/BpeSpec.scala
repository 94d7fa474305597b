package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Structural contracts of the BPE learn/apply pair that the oracle's
  * row-hash can't name. The value-level cross-engine check is the DuckDB
  * oracle (`vocab_bpe`, `txt_bpe_encode`).
  */
class BpeSpec extends SparkSuite {

  test("vocab_bpe: R rounds, argmax counts nonincreasing, merged = left||right") {
    val m = Bpe.vocabBpe(spark, sf).orderBy("rnd").collect()
    assert(m.length == 8)
    assert(m.map(_.getLong(0)).toSeq == (1L to 8L))
    // greedy BPE's chosen count never increases round over round: merging
    // (a,b) only removes (a,b) pairs and creates (x,ab)/(ab,y) pairs whose
    // count is bounded by the count just merged
    val counts = m.map(_.getLong(4))
    assert(counts.zip(counts.tail).forall { case (p, n) => n <= p },
      s"argmax counts increased: ${counts.mkString(",")}")
    assert(counts.forall(_ > 0))
    assert(m.forall(r => r.getString(3) == r.getString(1) + r.getString(2)))
  }

  test("txt_bpe_encode: word <= bpe <= char token counts, merges strictly compress") {
    val e = Bpe.txtBpeEncode(spark, sf).cache()
    try {
      // each word is >=1 token and <= its char count under ANY merge table
      assert(e.filter(col("n_tokens_bpe") < col("n_words") ||
        col("n_tokens_bpe") > col("n_chars_tok")).count() == 0)
      // 8 merges on this corpus must shave the char-level total somewhere
      val t = e.agg(sum("n_tokens_bpe").as("bpe"), sum("n_chars_tok").as("ch"))
        .head()
      assert(t.getLong(0) < t.getLong(1), s"no compression: $t")
      // every doc with at least one token is present exactly once
      val docs = graft.Tables.documents(spark, sf)
        .filter(size(graft.functions.TextFns.tokens(col("text"))) > 0)
      assert(e.count() == docs.count())
      assert(e.select("doc_id").distinct().count() == e.count())
    } finally { e.unpersist(); () }
  }

  test("encode agrees with a driver-side re-application of the merge table") {
    // independent witness: apply the learned merges with plain Scala
    // string lists and compare a sample of per-doc token counts
    val merges = Bpe.vocabBpe(spark, sf).orderBy("rnd")
      .select("left_sym", "right_sym").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def encode(word: String): Int = {
      var syms = word.map(_.toString).toList
      for ((a, b) <- merges) {
        val out = scala.collection.mutable.ListBuffer.empty[String]
        for (x <- syms) {
          if (out.nonEmpty && out.last == a && x == b)
            out(out.length - 1) = a + b
          else out += x
        }
        syms = out.toList
      }
      syms.length
    }
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") < 20)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .map(encode).sum.toLong).toMap
    val got = Bpe.txtBpeEncode(spark, sf).filter(col("doc_id") < 20)
      .select("doc_id", "n_tokens_bpe").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == docs, "fold-based encode diverges from reference re-application")
  }
}
