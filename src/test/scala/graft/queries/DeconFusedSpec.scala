package graft.queries

import graft.SparkSuite

/** `dd_decon_fused` / `dd_decon_recall` — the structural facts the
  * oracle's hash can't articulate: the fused set IS the union of the
  * two families (no join-dropped rows, no dedup losses), the provenance
  * column tells the truth row by row, and fusion-by-union never loses
  * recall against either family alone (`rag_hybrid_recall` proved
  * rank-FUSION can lose; set-union decontamination must not, and this
  * makes that a checked fact rather than a construction argument).
  */
class DeconFusedSpec extends SparkSuite {

  test("the fused flag set is exactly lexical ∪ semantic, and src " +
    "provenance is row-accurate with NULL evidence where a family " +
    "did not fire") {
    val fused = SimilarityQueries.ddDeconFused(spark, sf).collect()
    val lexIds = TextQueries.ddContaminate(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val semIds = SimilarityQueries.ddContaminateSem(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(fused.map(_.getLong(0)).toSet == (lexIds ++ semIds),
      "fused must flag exactly the union of the two families")
    assert(fused.map(_.getLong(0)).distinct.length == fused.length,
      "one row per flagged doc")
    fused.foreach { r =>
      val id = r.getLong(0)
      val src = r.getString(1)
      val expect =
        if (lexIds(id) && semIds(id)) "both"
        else if (lexIds(id)) "lexical" else "semantic"
      assert(src == expect, s"doc $id: src=$src, families say $expect")
      // evidence nullity mirrors provenance
      assert(r.isNullAt(r.fieldIndex("lex_eval_id")) == !lexIds(id))
      assert(r.isNullAt(r.fieldIndex("lex_shared")) == !lexIds(id))
      assert(r.isNullAt(r.fieldIndex("sem_eval_id")) == !semIds(id))
      assert(r.isNullAt(r.fieldIndex("sem_d2")) == !semIds(id))
    }
    assert(fused.nonEmpty)
  }

  test("fused recall >= each family alone on the union truth, and " +
    "every fused flag is true (flags ⊆ truth: both families only " +
    "ever flag inside their own truth sets)") {
    val r = SimilarityQueries.ddDeconRecall(spark, sf).collect()(0)
    val (nTrue, nFlagged, nHit) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    val (recall, lexOnly, semOnly) =
      (r.getLong(3), r.getLong(4), r.getLong(5))
    info(s"n_true=$nTrue n_flagged=$nFlagged n_hit=$nHit " +
      s"recall=$recall lex_only=$lexOnly sem_only=$semOnly (bp)")
    assert(nHit == nFlagged, "no false positives: fused flags ⊆ truth")
    assert(nHit <= nTrue)
    assert(recall >= lexOnly && recall >= semOnly,
      s"set-union fusion must not lose recall: $recall vs " +
        s"($lexOnly, $semOnly)")
    assert(recall > 0 && nTrue > 0)
  }
}
