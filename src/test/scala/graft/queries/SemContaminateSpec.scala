package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Structural contracts of `dd_contaminate_sem` (semantic
  * decontamination through the persisted IVF-PQ index); the value-level
  * cross-engine check is the DuckDB oracle, which runs the identical
  * probe → shortlist → exact-verify chain.
  */
class SemContaminateSpec extends SparkSuite {

  test("flags are corpus-side, thresholded, exactly verified, and " +
    "deduplicated to the closest eval match") {
    val r = SimilarityQueries.ddContaminateSem(spark, sf).cache()
    try {
      assert(r.count() > 0, "threshold should flag something on this corpus")
      assert(r.filter(col("vec_id") < 25).count() == 0,
        "eval vectors must never be flagged as contaminated corpus docs")
      assert(r.filter(col("eval_id") >= 25).count() == 0,
        "matches must point at eval-set ids")
      assert(r.filter(col("d2") > 1400000000000L).count() == 0,
        "every flag must be inside the contamination radius")
      assert(r.groupBy("vec_id").count().filter(col("count") > 1).count() == 0,
        "one verdict per corpus vector (its closest eval match)")
      // the reported d2 IS the exact integer-L2 on the quantized grid —
      // recompute independently via the naive fold and compare
      import graft.plans.DotProductL.dotL
      val qv = SimilarityQueries.pqQuantize(graft.Tables.embeddings(spark, sf))
      val recomputed = r
        .join(qv.select(col("vec_id"), col("q").as("cq")), "vec_id")
        .join(qv.select(col("vec_id").as("eval_id"), col("q").as("qq")),
          "eval_id")
        .select(col("vec_id"), col("d2"),
          (dotL(col("qq"), col("qq")) - lit(2L) * dotL(col("qq"), col("cq"))
            + dotL(col("cq"), col("cq"))).as("d2x"))
      assert(recomputed.filter(col("d2") =!= col("d2x")).count() == 0,
        "reported distance must equal the exact integer-L2")
    } finally { r.unpersist(); () }
  }
}
