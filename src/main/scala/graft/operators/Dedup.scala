package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed deduplication operators (reference `src/transformer.py:40,88,126`,
  * `src/bootstrap_loader.py:92-105`).
  *
  * All variants are a single hash-shuffle on the key columns (one exchange,
  * then a per-partition sort for the window variants). At cluster scale the
  * shuffle is unavoidable for a global dedup; what matters is that there is
  * exactly ONE exchange and the window sort is local. The pandas reference
  * relies on input order for tie-breaks; we require an explicit total order
  * (SURVEY §2.10.5).
  */
object Dedup {

  /** D1: latest-wins — keep the row with the greatest `orderBy` per key.
    * Null order timestamps lose to any non-null (desc_nulls_last), matching
    * the reference's nulls-first ascending sort + keep-last.
    */
  def latestWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** D2: first-wins — deterministic `dropDuplicates` with an explicit order. */
  def firstWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    latestWins(df, keys, order) // same mechanism; caller passes asc order

  /** D3: ingest-time dedup — collapse replays/duplicates of the same
    * event_id, keeping the latest ingest. Idempotent: running twice ≡ once.
    */
  def ingestDedup(df: DataFrame, eventId: String, ingestedAt: String, tiebreak: Seq[Column] = Nil): DataFrame =
    latestWins(df, Seq(eventId), col(ingestedAt).desc_nulls_last +: tiebreak)
}
