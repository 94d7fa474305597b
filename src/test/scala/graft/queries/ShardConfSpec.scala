package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** `spark.graft.shards` lifts the training-shard count out of the code:
  * the default (8) is what the static oracle SQL certifies; a production
  * run sets thousands. These specs run `ds_shuffle` and `pipe_shards` at
  * a second count and assert the invariants a re-shard must preserve —
  * the corpus itself (same docs, same per-doc mass), dense positions per
  * shard, and shard ids inside [0, N). Assignment is deliberately NOT
  * stable in N (hex48 % N moves docs when N changes) — the docs say pick
  * N once per corpus generation.
  */
class ShardConfSpec extends SparkSuite {

  private def withShards[A](n: Option[Int])(body: => A): A = {
    val key = "spark.graft.shards"
    val old = spark.conf.getOption(key)
    n.fold(spark.conf.unset(key))(v => spark.conf.set(key, v.toString))
    try body
    finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("ds_shuffle: same corpus, dense per-shard positions at 8 and 5 shards") {
    val at8 = withShards(None)(TextQueries.dsShuffle(spark, sf)).collect()
    val at5 = withShards(Some(5))(TextQueries.dsShuffle(spark, sf)).collect()
    assert(at8.map(_.getLong(0)).toSet == at5.map(_.getLong(0)).toSet,
      "re-sharding must not add or drop docs")
    assert(at8.map(_.getLong(1)).forall(s => s >= 0 && s < 8))
    assert(at5.map(_.getLong(1)).forall(s => s >= 0 && s < 5))
    // positions are a permutation 1..size within every shard
    for (rows <- Seq(at8, at5); (_, grp) <- rows.groupBy(_.getLong(1)))
      assert(grp.map(_.getLong(2)).sorted.toSeq == (1L to grp.length).toSeq,
        "within-shard positions must be dense from 1")
    assert(at5.map(_.getLong(1)).distinct.length == 5,
      "all 5 shards should be populated on this corpus")
  }

  test("pipe_shards: gate+dedup mass is shard-count invariant at 8 and 5") {
    def totals(rows: Array[org.apache.spark.sql.Row]) =
      (rows.map(_.getLong(2)).sum, rows.map(_.getLong(3)).sum)
    val at8 = withShards(None)(Curation.pipeShards(spark, sf)).collect()
    val at5 = withShards(Some(5))(Curation.pipeShards(spark, sf)).collect()
    assert(totals(at8) == totals(at5),
      "total kept docs/chars must not depend on the shard count")
    assert(at8.map(_.getLong(0)).forall(s => s >= 0 && s < 8))
    assert(at5.map(_.getLong(0)).forall(s => s >= 0 && s < 5))
    // bins start at 0 and strictly increase within every shard (a doc
    // larger than the bin budget legitimately SKIPS bins, so dense-from-0
    // is not an invariant — monotone-from-0 is)
    for ((_, grp) <- at5.groupBy(_.getLong(0))) {
      val bins = grp.map(_.getLong(1)).sorted.toSeq
      assert(bins.head == 0L && bins.distinct == bins,
        "bins must start at 0 and be strictly increasing within a shard")
    }
  }

  test("spark.graft.shards rejects non-positive counts") {
    intercept[IllegalArgumentException] {
      withShards(Some(0))(Curation.pipeShards(spark, sf))
    }
  }
}
