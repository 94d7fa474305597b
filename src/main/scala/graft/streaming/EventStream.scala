package graft.streaming

import graft.normalize.Drift
import graft.pipeline.CommercePulse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming upgrade of the daily-batch ingest (SURVEY §2.8).
  *
  * The reference processes dated JSONL directories in batch; the same
  * envelope flows here as an unbounded stream: file source → event-time
  * watermark → exactly-once-style dedup on event_id → windowed aggregates
  * / upsert sink via foreachBatch.
  *
  * Scale notes: dedup state is bounded by the watermark (7 days — the
  * generator's max lateness); the daily aggregate uses a 1-day tumbling
  * window on event time, so state per key is one window row. foreachBatch
  * runs the same latest-wins upsert as batch — replays are idempotent.
  */
object EventStream {

  /** Streaming file source over envelope JSONL directories (S2, streaming). */
  def readLiveStream(spark: SparkSession, pathGlob: String): DataFrame =
    spark.readStream
      .schema(CommercePulse.EnvelopeSchema)
      .json(pathGlob)
      .filter(col("event_id").isNotNull)

  /** Event-time column + watermark + D3 dedup. Late data beyond
    * `lateness` is dropped; duplicate event_ids within the watermark
    * horizon collapse to the first arrival.
    */
  def dedupWithWatermark(events: DataFrame, lateness: String = "7 days"): DataFrame =
    events
      .withColumn("event_ts", Drift.parseTimestampMulti(col("event_time")))
      .filter(col("event_ts").isNotNull)
      .withWatermark("event_ts", lateness)
      .dropDuplicates("event_id")

  /** 1-day tumbling-window per-vendor counts/amounts over the deduped
    * stream — the streaming analogue of fact_order_daily's grain.
    */
  def dailyWindowAgg(deduped: DataFrame): DataFrame =
    deduped
      .groupBy(window(col("event_ts"), "1 day").as("day"), col("vendor"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("day.start").cast("date").as("event_date"),
        col("vendor"), col("n_events"))

  /** Sliding-window per-vendor counts: windows of `size` every `slide`
    * (size > slide ⇒ overlapping windows; each event lands in
    * size/slide windows).
    */
  def slidingWindowAgg(deduped: DataFrame, size: String, slide: String): DataFrame =
    deduped
      .groupBy(window(col("event_ts"), size, slide).as("w"), col("vendor"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("vendor"), col("n_events"))

  /** Session windows: events for one vendor that arrive within `gap` of
    * each other merge into one session row (state closes `gap` past the
    * watermark).
    */
  def sessionAgg(deduped: DataFrame, gap: String): DataFrame =
    deduped
      .groupBy(session_window(col("event_ts"), gap).as("s"), col("vendor"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("s.start").as("session_start"), col("s.end").as("session_end"),
        col("vendor"), col("n_events"))

  /** Stream-static enrichment: join the live stream against a static
    * dimension snapshot (broadcast per micro-batch; no stream state).
    */
  def enrichWithDim(deduped: DataFrame, dim: DataFrame, key: String): DataFrame =
    deduped.join(broadcast(dim), Seq(key), "left")

  /** Incremental fact_order_daily refresh: each micro-batch re-derives the
    * daily aggregate for the batch's affected (date, vendor) grains and
    * upserts them — the streaming continuation of the batch aggregate,
    * sharing its exact semantics via the same library call.
    */
  def startDailyRefresh(spark: SparkSession, deduped: DataFrame, outPath: String,
                        checkpoint: String): StreamingQuery =
    deduped.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val daily = CommercePulse.factOrderDaily(
          CommercePulse.normalizeOrders(batch),
          CommercePulse.normalizePayments(batch),
          CommercePulse.normalizeRefunds(batch))
        graft.sources.Sinks.upsertParquet(spark, daily, outPath,
          Seq("order_date", "vendor"),
          Seq(col("order_count").desc)) // latest batch state wins per grain
      }
      .start()

  /** foreachBatch upsert of normalized current-order state — streaming
    * writes through the same idempotent sink as batch.
    */
  def startOrderUpsert(spark: SparkSession, deduped: DataFrame, outPath: String,
                       checkpoint: String): StreamingQuery =
    deduped.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val orders = CommercePulse.normalizeOrders(batch)
        graft.sources.Sinks.upsertParquet(spark, orders, outPath,
          Seq("order_id"),
          Seq(col("created_at").desc_nulls_last, col("event_id").desc))
      }
      .start()
}
