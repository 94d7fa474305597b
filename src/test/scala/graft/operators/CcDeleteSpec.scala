package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-forget through persisted component labels
  * (TextDedup.deleteFromComponentsPairs / deleteFromComponentsKeyed):
  * delete ≡ full recompute over the live graph, including the cases a
  * naive min-relabel gets wrong — a forgotten BRIDGE node must SPLIT its
  * component, and a forgotten cluster-min must re-anchor every member.
  */
class CcDeleteSpec extends SparkSuite {
  import spark.implicits._

  private def pairsOf(ps: (Long, Long)*): DataFrame =
    ps.toDF("doc_a", "doc_b")

  private def labelsOf(pairs: DataFrame): DataFrame =
    TextDedup.connectedComponents(pairs)

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap

  test("pairs: forgetting a bridge node splits its component") {
    // path 1-2-3-4-5: one component labeled 1; doc 3 is the only bridge
    val pairs = pairsOf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val labels = labelsOf(pairs)
    assert(asMap(labels) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    val out = TextDedup.deleteFromComponentsPairs(
      labels, pairs, Seq(3L).toDF("doc_id"))
    // naive min-relabel would keep {4,5} under label 1; the true live
    // graph is two components {1,2} and {4,5}
    assert(asMap(out) === Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("pairs: forgetting the cluster min re-anchors the members") {
    val pairs = pairsOf((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L))
    val labels = labelsOf(pairs)
    val out = TextDedup.deleteFromComponentsPairs(
      labels, pairs, Seq(1L).toDF("doc_id"))
    // {2,3} stays connected by its own edge and takes the new min 2;
    // untouched cluster {10,11} passes through bit-identically
    assert(asMap(out) === Map(2L -> 2L, 3L -> 2L, 10L -> 10L, 11L -> 10L))
  }

  test("pairs: a member left edge-free stays as its own singleton") {
    // star around 1: forgetting the hub isolates 2 and 3 entirely
    val pairs = pairsOf((1L, 2L), (1L, 3L))
    val out = TextDedup.deleteFromComponentsPairs(
      labelsOf(pairs), pairs, Seq(1L).toDF("doc_id"))
    assert(asMap(out) === Map(2L -> 2L, 3L -> 3L))
  }

  test("pairs: delete ≡ full recompute on a mixed random graph") {
    // deterministic pseudo-random graph: 400 edges over ~160 nodes gives
    // a mix of chains, merged blobs, and singleton-producing deletions
    val pairs = spark.range(400).select(
      (xxhash64(col("id")) % 160 + 160).cast("long").as("doc_a"),
      (xxhash64(col("id") + 1000) % 160 + 160).cast("long").as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
    val labels = labelsOf(pairs)
    val forget = spark.range(500).select((col("id") * 5 + 160).as("doc_id"))
      .filter(col("doc_id") < 480)
    val out = TextDedup.deleteFromComponentsPairs(labels, pairs, forget)
    // the oracle: CC over live edges, plus live label-table nodes with
    // no remaining edge as singletons
    val livePairs = pairs
      .join(forget.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_anti")
      .join(forget.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_anti")
    val cc = labelsOf(livePairs).withColumnRenamed("cluster_id", "cid")
    val expect = labels.join(forget, Seq("doc_id"), "left_anti")
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cid"), col("doc_id")).as("cluster_id"))
    assert(out.except(expect).isEmpty && expect.except(out).isEmpty)
  }

  test("keyed: bridge doc forgotten → both sides drop participation") {
    // 10 -k1- 11 -k2- 12: doc 11 bridges two key groups; forgetting it
    // leaves both restricted groups at size 1, so 10 and 12 are no
    // longer participants at all (the full-recompute convention)
    val keyed = Seq((10L, "k1"), (11L, "k1"), (11L, "k2"), (12L, "k2"),
      (20L, "k3"), (21L, "k3")).toDF("doc_id", "k")
    val labels = Seq((10L, 10L), (11L, 10L), (12L, 10L),
      (20L, 20L), (21L, 20L)).toDF("doc_id", "cluster_id")
    val out = TextDedup.deleteFromComponentsKeyed(
      labels, keyed, Seq(11L).toDF("doc_id"))
    assert(asMap(out) === Map(20L -> 20L, 21L -> 20L))
  }

  test("keyed: forgetting the group min re-anchors via the live window min") {
    val keyed = Seq((20L, "k1"), (21L, "k1"), (22L, "k1")).toDF("doc_id", "k")
    val labels = Seq((20L, 20L), (21L, 20L), (22L, 20L))
      .toDF("doc_id", "cluster_id")
    val out = TextDedup.deleteFromComponentsKeyed(
      labels, keyed, Seq(20L).toDF("doc_id"))
    // a star witness anchored at 20 would disconnect 21 and 22 — the
    // regenerated group edge keeps them one cluster under the new min
    assert(asMap(out) === Map(21L -> 21L, 22L -> 21L))
  }

  test("keyed: delete ≡ full recompute over a random key table") {
    // ~120 docs × 2 keys from small key spaces → overlapping groups,
    // multi-key bridges, and cross-group merges
    val keyed = spark.range(120).select(col("id").as("doc_id"),
        concat(lit("a"), (xxhash64(col("id")) % 40).cast("string")).as("k"))
      .unionByName(spark.range(120).select(col("id").as("doc_id"),
        concat(lit("b"), (xxhash64(col("id") + 7) % 40).cast("string")).as("k")))
    def recompute(kt: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      val st = kt.withColumn("mn", min("doc_id").over(w))
        .withColumn("gn", count(lit(1)).over(w))
      val edges = st.filter(col("doc_id") > col("mn"))
        .select(col("mn").as("doc_a"), col("doc_id").as("doc_b")).distinct()
      val parts = st.filter(col("gn") >= 2).select("doc_id").distinct()
      parts.join(labelsOf(edges).withColumnRenamed("cluster_id", "cid"),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("cid"), col("doc_id")).as("cluster_id"))
    }
    val labels = recompute(keyed)
    val forget = spark.range(120).select(col("id").as("doc_id"))
      .filter(col("doc_id") % 7 === 3)
    val out = TextDedup.deleteFromComponentsKeyed(labels, keyed, forget)
    val expect = recompute(
      keyed.join(forget, Seq("doc_id"), "left_anti"))
    assert(out.except(expect).isEmpty && expect.except(out).isEmpty)
  }

  test("empty forget set is the identity on the label table") {
    val pairs = pairsOf((1L, 2L), (2L, 3L))
    val labels = labelsOf(pairs)
    val out = TextDedup.deleteFromComponentsPairs(labels, pairs,
      spark.emptyDataset[Long].toDF("doc_id"))
    assert(out.except(labels).isEmpty && labels.except(out).isEmpty)
  }
}
