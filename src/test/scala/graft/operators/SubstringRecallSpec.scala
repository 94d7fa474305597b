package graft.operators

import graft.SparkSuite

/** Measured recall of the df-capped substring-span dedup against the
  * EXACT definition (dfCap = ∞ is the complete pigeonhole generator) on
  * a planted corpus — the capped operator's loss is quantified, not
  * hand-waved.
  *
  * Plant: 6 copy-regime spans (15 tokens, each shared by exactly one doc
  * pair — df = 2 per anchor) and one template-regime span (12 tokens,
  * shared by 24 docs — df = 24 > cap 16, so every C(24,2) = 276 template
  * pair is capped away by design). Filler tokens are unique per document,
  * so no accidental anchors exist.
  *
  * Measured on this plant: recall 6/282 ≈ 2.1% OVERALL, but 6/6 = 100%
  * on the copy regime — the cap's loss is exactly the template pairs it
  * is documented to hand off to collapse-first MinHash, never a copy
  * pair. The set-level assertion is stronger than the ratio: capped
  * output == exact output minus precisely the template-pair spans.
  */
class SubstringRecallSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  test("recall vs exact: 100% of df<=16 copy spans kept, only df>16 template spans lost (6/282 overall on the plant)") {
    val span = (1 to 15).map(i => s"copy$i")
    val template = (1 to 12).map(i => s"tmpl$i")
    def filler(doc: Long, n: Int, tag: String) =
      (1 to n).map(i => s"f${tag}d${doc}x$i")
    // copy regime: 6 disjoint pairs (docs 1..12), each pair shares its own
    // 15-token span (suffix s distinguishes the six spans so they cannot
    // cross-pair)
    val copyDocs = (0 until 6).flatMap { s =>
      val sp = span.map(t => s"${t}s$s")
      val a = 1L + 2 * s; val b = 2L + 2 * s
      Seq(
        (a, (filler(a, 5, "pre") ++ sp ++ filler(a, 5, "post")).mkString(" ")),
        (b, (filler(b, 7, "pre") ++ sp ++ filler(b, 3, "post")).mkString(" ")))
    }
    // template regime: 24 docs (101..124) all embed the same 12-token block
    val tmplDocs = (101L to 124L).map(d =>
      (d, (filler(d, 4, "pre") ++ template ++ filler(d, 6, "post")).mkString(" ")))
    val corpus = docs(copyDocs ++ tmplDocs)

    val capped = TextDedup.substringSpanPairs(corpus, dfCap = 16)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val exact = TextDedup.substringSpanPairs(corpus, dfCap = Int.MaxValue)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    // exact finds all 6 copy spans + all 276 template pair spans
    val copySpans = exact.filter(_._1 <= 12L)
    val templateSpans = exact.filter(_._1 >= 101L)
    assert(copySpans.size == 6)
    assert(copySpans.forall(_._5 == 15L))
    assert(templateSpans.size == 276) // C(24,2)
    assert(templateSpans.forall(_._5 == 12L))
    assert(exact == copySpans ++ templateSpans)

    // the capped loss is EXACTLY the template pairs: set equality, then
    // the headline ratios pinned as measured numbers
    assert(capped == copySpans)
    assert(capped.size * 47 == exact.size) // 6/282 = 1/47 overall recall
  }

  test("a span shared by exactly dfCap docs is still fully recovered (boundary)") {
    // 16 docs share one span: df = 16 == cap, so all C(16,2) = 120 pairs
    // must survive — the cap is inclusive, copy regime extends to df = cap
    val span = (1 to 11).map(i => s"edge$i")
    def filler(doc: Long, n: Int) = (1 to n).map(i => s"fd${doc}x$i")
    val corpus = docs((1L to 16L).map(d =>
      (d, (filler(d, 3) ++ span ++ filler(d, 3)).mkString(" "))))
    val capped = TextDedup.substringSpanPairs(corpus, dfCap = 16)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(capped.size == 120)
    assert(capped.forall(_._5 == 11L))
  }
}
