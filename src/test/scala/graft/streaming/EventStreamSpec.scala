package graft.streaming

import graft.SparkSuite
import java.nio.file.{Files, Paths}

class EventStreamSpec extends SparkSuite {

  private def writeFixture(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    val lines = Seq(
      """{"event_id":"s1","event_type":"order_created","event_time":"2024-01-01T10:00:00","vendor":"vendor_a","payload":"{\"orderRef\":\"A-1\",\"created\":\"2024-01-01 10:00\",\"total\":100.0}","ingested_at":"2024-01-01T11:00:00"}""",
      """{"event_id":"s1","event_type":"order_created","event_time":"2024-01-01T10:00:00","vendor":"vendor_a","payload":"{\"orderRef\":\"A-1\",\"created\":\"2024-01-01 10:00\",\"total\":100.0}","ingested_at":"2024-01-01T12:00:00"}""",
      """{"event_id":"s2","event_type":"order_created","event_time":"2024-01-02T10:00:00","vendor":"vendor_b","payload":"{\"order_id\":\"B-1\",\"created_at\":\"2024-01-02T10:00:00\",\"totalAmount\":200.0}","ingested_at":"2024-01-02T11:00:00"}""",
      """{"event_id":"s3","event_type":"payment_succeeded","event_time":"2024-01-02T12:00:00","vendor":"vendor_b","payload":"{\"order_id\":\"B-1\",\"paid_at\":\"2024-01-02T12:00:00\",\"payment_status\":\"success\",\"amountPaid\":200.0,\"transaction_id\":\"TX-1\"}","ingested_at":"2024-01-02T13:00:00"}"""
    )
    Files.writeString(Paths.get(s"$dir/events.jsonl"), lines.mkString("\n"))
  }

  test("streaming dedup + windowed daily agg matches batch semantics") {
    val dir = Files.createTempDirectory("stream_in").toString
    writeFixture(dir)
    val stream = EventStream.readLiveStream(spark, dir)
    assert(stream.isStreaming)
    val agg = EventStream.dailyWindowAgg(EventStream.dedupWithWatermark(stream))
    val q = agg.writeStream
      .format("memory").queryName("daily_agg").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT event_date, vendor, n_events FROM daily_agg ORDER BY 1, 2")
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
    // duplicate s1 collapsed -> 1 event on 01-01; two distinct events on 01-02
    assert(got.toSeq == Seq(
      ("2024-01-01", "vendor_a", 1L),
      ("2024-01-02", "vendor_b", 2L)))
  }

  test("sliding and session windows over the deduped stream") {
    val dir = Files.createTempDirectory("stream_in3").toString
    writeFixture(dir)
    val deduped = EventStream.dedupWithWatermark(EventStream.readLiveStream(spark, dir))

    val sq = EventStream.slidingWindowAgg(deduped, "2 days", "1 day").writeStream
      .format("memory").queryName("sliding").outputMode("complete").start()
    sq.processAllAvailable(); sq.stop()
    val sliding = spark.sql("SELECT vendor, sum(n_events) FROM sliding GROUP BY 1 ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // size/slide = 2 -> every event counted twice across overlapping windows
    assert(sliding.toSeq == Seq(("vendor_a", 2L), ("vendor_b", 4L)))

    val ssq = EventStream.sessionAgg(deduped, "6 hours").writeStream
      .format("memory").queryName("sessions").outputMode("complete").start()
    ssq.processAllAvailable(); ssq.stop()
    val sessions = spark.sql("SELECT vendor, count(*) FROM sessions GROUP BY 1 ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // vendor_b's two events are 2h apart -> one merged session
    assert(sessions.toSeq == Seq(("vendor_a", 1L), ("vendor_b", 1L)))
  }

  test("streaming HLL window: per-day approx distinct orders tracks exact within 5%") {
    val dir = Files.createTempDirectory("stream_hll").toString
    Files.createDirectories(Paths.get(dir))
    // day 1: 300 events over 120 distinct refs; day 2: 30 distinct refs
    val lines =
      (1 to 300).map(i =>
        s"""{"event_id":"h$i","event_type":"order_created","event_time":"2024-01-01T10:00:00","vendor":"vendor_b","payload":"{\\"order_id\\":\\"R-${i % 120}\\"}","ingested_at":"2024-01-01T11:00:00"}""") ++
      (1 to 30).map(i =>
        s"""{"event_id":"g$i","event_type":"order_created","event_time":"2024-01-02T10:00:00","vendor":"vendor_b","payload":"{\\"order_id\\":\\"S-$i\\"}","ingested_at":"2024-01-02T11:00:00"}""")
    Files.writeString(Paths.get(s"$dir/events.jsonl"), lines.mkString("\n"))
    val agg = EventStream.dailyApproxOrders(
      EventStream.dedupWithWatermark(EventStream.readLiveStream(spark, dir)))
    val q = agg.writeStream
      .format("memory").queryName("hll_daily").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT event_date, approx_orders FROM hll_daily ORDER BY 1")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    assert(got.map(_._1) == Seq("2024-01-01", "2024-01-02"))
    val exact = Map("2024-01-01" -> 120L, "2024-01-02" -> 30L)
    got.foreach { case (d, a) =>
      val n = exact(d)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong),
        s"day $d: approx $a vs exact $n")
    }
  }

  test("stream-static dim enrichment joins without stream state") {
    val dir = Files.createTempDirectory("stream_in4").toString
    writeFixture(dir)
    import SparkSuite.session.implicits._
    val dim = Seq(("vendor_a", "Alpha Corp"), ("vendor_b", "Beta GmbH"))
      .toDF("vendor", "vendor_name")
    val enriched = EventStream.enrichWithDim(
      EventStream.dedupWithWatermark(EventStream.readLiveStream(spark, dir)),
      dim, "vendor")
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT DISTINCT vendor, vendor_name FROM enriched ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("vendor_a", "Alpha Corp"), ("vendor_b", "Beta GmbH")))
  }

  test("streaming daily refresh upserts the same grains as the batch aggregate") {
    val dir = Files.createTempDirectory("stream_in5").toString
    writeFixture(dir)
    val out = Files.createTempDirectory("stream_daily").toString
    val cp = Files.createTempDirectory("stream_daily_cp").toString
    val q = EventStream.startDailyRefresh(spark,
      EventStream.dedupWithWatermark(EventStream.readLiveStream(spark, dir)),
      s"$out/fact_order_daily", cp)
    q.awaitTermination(60000)
    val daily = spark.read.parquet(s"$out/fact_order_daily")
    val rows = daily.collect().map(r =>
      (r.getAs[java.sql.Date]("order_date").toString, r.getAs[String]("vendor"),
        r.getAs[Double]("gross_revenue"))).toSet
    // A-1 on 01-01 (no payment rows attributed besides TX-1 -> gross 200 on B-1's date)
    assert(rows.map(t => (t._1, t._2)) ==
      Set(("2024-01-01", "vendor_a"), ("2024-01-02", "vendor_b")))
    val b = rows.find(_._2 == "vendor_b").get
    assert(b._3 == 200.0)
  }

  test("daily refresh merges grains spanning micro-batches (equals batch recompute)") {
    val dir = Files.createTempDirectory("stream_in7").toString
    Files.createDirectories(Paths.get(dir))
    // one (2024-01-02, vendor_b) grain split across two files; with
    // maxFilesPerTrigger=1 each file is its own micro-batch
    Files.writeString(Paths.get(s"$dir/a.jsonl"), Seq(
      """{"event_id":"m1","event_type":"order_created","event_time":"2024-01-02T10:00:00","vendor":"vendor_b","payload":"{\"order_id\":\"B-1\",\"created_at\":\"2024-01-02T10:00:00\",\"totalAmount\":200.0}","ingested_at":"2024-01-02T11:00:00"}""",
      """{"event_id":"m2","event_type":"payment_succeeded","event_time":"2024-01-02T12:00:00","vendor":"vendor_b","payload":"{\"order_id\":\"B-1\",\"paid_at\":\"2024-01-02T12:00:00\",\"payment_status\":\"success\",\"amountPaid\":200.0,\"transaction_id\":\"TX-1\"}","ingested_at":"2024-01-02T13:00:00"}"""
    ).mkString("\n"))
    Files.writeString(Paths.get(s"$dir/b.jsonl"), Seq(
      """{"event_id":"m3","event_type":"order_created","event_time":"2024-01-02T14:00:00","vendor":"vendor_b","payload":"{\"order_id\":\"B-2\",\"created_at\":\"2024-01-02T14:00:00\",\"totalAmount\":100.0}","ingested_at":"2024-01-02T15:00:00"}""",
      """{"event_id":"m4","event_type":"payment_succeeded","event_time":"2024-01-02T16:00:00","vendor":"vendor_b","payload":"{\"order_id\":\"B-2\",\"paid_at\":\"2024-01-02T16:00:00\",\"payment_status\":\"success\",\"amountPaid\":100.0,\"transaction_id\":\"TX-2\"}","ingested_at":"2024-01-02T17:00:00"}"""
    ).mkString("\n"))
    val out = Files.createTempDirectory("stream_daily2").toString
    val cp = Files.createTempDirectory("stream_daily2_cp").toString
    val q = EventStream.startDailyRefresh(spark,
      EventStream.dedupWithWatermark(
        EventStream.readLiveStream(spark, dir, maxFilesPerTrigger = Some(1))),
      s"$out/fact_order_daily", cp)
    q.awaitTermination(120000)
    val daily = spark.read.parquet(s"$out/fact_order_daily").collect()
    assert(daily.length == 1)
    val r = daily(0)
    // round 1 kept the LARGEST PARTIAL (one order, gross 200); the merged
    // recompute must equal the batch aggregate over all events
    assert(r.getAs[Long]("order_count") == 2L)
    assert(r.getAs[Double]("gross_revenue") == 300.0)
    assert(r.getAs[Long]("paid_count") == 2L)
    val batchRecompute = {
      val all = graft.pipeline.CommercePulse.readLive(spark, s"$dir/*.jsonl")
      graft.pipeline.CommercePulse.factOrderDaily(
        graft.pipeline.CommercePulse.normalizeOrders(all),
        graft.pipeline.CommercePulse.normalizePayments(all),
        graft.pipeline.CommercePulse.normalizeRefunds(all)).collect()(0)
    }
    assert(r.getAs[Double]("gross_revenue") == batchRecompute.getAs[Double]("gross_revenue"))
    assert(r.getAs[Long]("order_count") == batchRecompute.getAs[Long]("order_count"))
  }

  test("daily refresh retracts a grain when a late update moves the order's date") {
    val dir = Files.createTempDirectory("stream_in8").toString
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/a.jsonl"),
      """{"event_id":"g1","event_type":"order_created","event_time":"2024-01-02T10:00:00","vendor":"vendor_b","payload":"{\"order_id\":\"C-1\",\"created_at\":\"2024-01-02T10:00:00\",\"totalAmount\":50.0}","ingested_at":"2024-01-02T11:00:00"}""")
    // later version of the SAME order with a later created_at: the order
    // migrates from the 01-02 grain to 01-05 — the old grain must vanish
    Files.writeString(Paths.get(s"$dir/b.jsonl"),
      """{"event_id":"g2","event_type":"order_updated","event_time":"2024-01-05T10:00:00","vendor":"vendor_b","payload":"{\"order_id\":\"C-1\",\"created_at\":\"2024-01-05T10:00:00\",\"totalAmount\":50.0}","ingested_at":"2024-01-05T11:00:00"}""")
    val out = Files.createTempDirectory("stream_daily3").toString
    val cp = Files.createTempDirectory("stream_daily3_cp").toString
    val q = EventStream.startDailyRefresh(spark,
      EventStream.dedupWithWatermark(
        EventStream.readLiveStream(spark, dir, maxFilesPerTrigger = Some(1))),
      s"$out/fact_order_daily", cp)
    q.awaitTermination(120000)
    val daily = spark.read.parquet(s"$out/fact_order_daily").collect()
    assert(daily.length == 1)
    assert(daily(0).getAs[java.sql.Date]("order_date").toString == "2024-01-05")
  }

  test("orderLifecycle: flatMapGroupsWithState folds per-order state across batches") {
    val dir = Files.createTempDirectory("stream_in9").toString
    Files.createDirectories(Paths.get(dir))
    // A-1 created then paid (across two batches); B-1 created, paid,
    // refunded; C-1 only created
    Files.writeString(Paths.get(s"$dir/a.jsonl"), Seq(
      """{"event_id":"l1","event_type":"order_created","event_time":"2024-01-02T10:00:00","vendor":"v","payload":"{\"order_id\":\"A-1\"}","ingested_at":"2024-01-02T10:01:00"}""",
      """{"event_id":"l2","event_type":"order_created","event_time":"2024-01-02T10:05:00","vendor":"v","payload":"{\"order_id\":\"B-1\"}","ingested_at":"2024-01-02T10:06:00"}""",
      """{"event_id":"l3","event_type":"payment_succeeded","event_time":"2024-01-02T11:00:00","vendor":"v","payload":"{\"order_id\":\"B-1\",\"transaction_id\":\"T1\"}","ingested_at":"2024-01-02T11:01:00"}"""
    ).mkString("\n"))
    Files.writeString(Paths.get(s"$dir/b.jsonl"), Seq(
      """{"event_id":"l4","event_type":"payment_succeeded","event_time":"2024-01-02T12:00:00","vendor":"v","payload":"{\"order_id\":\"A-1\",\"transaction_id\":\"T2\"}","ingested_at":"2024-01-02T12:01:00"}""",
      """{"event_id":"l5","event_type":"refund_issued","event_time":"2024-01-02T13:00:00","vendor":"v","payload":"{\"order_id\":\"B-1\"}","ingested_at":"2024-01-02T13:01:00"}""",
      """{"event_id":"l6","event_type":"order_created","event_time":"2024-01-02T13:30:00","vendor":"v","payload":"{\"order_id\":\"C-1\"}","ingested_at":"2024-01-02T13:31:00"}"""
    ).mkString("\n"))
    val q = EventStream.orderLifecycle(
        EventStream.dedupWithWatermark(
          EventStream.readLiveStream(spark, dir, maxFilesPerTrigger = Some(1))))
      .writeStream.format("memory").queryName("lifecycle")
      .outputMode("update").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // memory sink in update mode appends each state emission; the LAST
    // row per order is its final state
    val finals = spark.sql(
        """SELECT order_id, status, n_order_events, n_payments, n_refunds
          |FROM (SELECT *, row_number() OVER (PARTITION BY order_id
          |        ORDER BY n_order_events + n_payments + n_refunds DESC) AS rn
          |      FROM lifecycle) WHERE rn = 1""".stripMargin)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(finals("A-1") == (("paid", 1L, 1L, 0L)))
    assert(finals("B-1") == (("refunded", 1L, 1L, 1L)))
    assert(finals("C-1") == (("open", 1L, 0L, 0L)))
  }

  test("orderLifecycle: first-batch state survives watermark advancement") {
    // regression: the first micro-batch runs with watermark 0; setting a
    // timeout of 0+ttl (1970) evicted every first-batch-only order as
    // soon as the watermark went live
    val dir = Files.createTempDirectory("stream_in10").toString
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/a.jsonl"),
      """{"event_id":"w1","event_type":"order_created","event_time":"2024-01-02T10:00:00","vendor":"v","payload":"{\"order_id\":\"X-1\"}","ingested_at":"2024-01-02T10:01:00"}""")
    // advances the watermark well past batch 1's event times
    Files.writeString(Paths.get(s"$dir/b.jsonl"),
      """{"event_id":"w2","event_type":"order_created","event_time":"2024-01-20T10:00:00","vendor":"v","payload":"{\"order_id\":\"Y-1\"}","ingested_at":"2024-01-20T10:01:00"}""")
    Files.writeString(Paths.get(s"$dir/c.jsonl"),
      """{"event_id":"w3","event_type":"payment_succeeded","event_time":"2024-01-21T10:00:00","vendor":"v","payload":"{\"order_id\":\"X-1\",\"transaction_id\":\"TW\"}","ingested_at":"2024-01-21T10:01:00"}""")
    val q = EventStream.orderLifecycle(
        EventStream.dedupWithWatermark(
          EventStream.readLiveStream(spark, dir, maxFilesPerTrigger = Some(1))))
      .writeStream.format("memory").queryName("lifecycle_wm")
      .outputMode("update").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val x = spark.sql(
        """SELECT n_order_events, n_payments, status FROM lifecycle_wm
          |WHERE order_id = 'X-1'
          |ORDER BY n_order_events + n_payments DESC LIMIT 1""".stripMargin)
      .collect()(0)
    // the payment folded into the SURVIVING batch-1 state, not a reset one
    assert(x.getLong(0) == 1L && x.getLong(1) == 1L && x.getString(2) == "paid")
  }

  test("corrupt line accounting matches the reference's skip counting") {
    val dir = Files.createTempDirectory("stream_in6").toString
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/events.jsonl"), Seq(
      """{"event_id":"ok1","event_type":"order_created","event_time":"2024-01-01T10:00:00","vendor":"v","payload":"{}","ingested_at":"2024-01-01T11:00:00"}""",
      """{broken""",
      """{"event_type":"no_id","vendor":"v","payload":"{}"}""",
      """{"event_id":"ok2","event_type":"order_created","event_time":"2024-01-01T10:00:00","vendor":"v","payload":"{}","ingested_at":"2024-01-01T11:00:00"}"""
    ).mkString("\n"))
    assert(graft.pipeline.CommercePulse.corruptLineCount(spark, s"$dir/events.jsonl") == 2)
    assert(graft.pipeline.CommercePulse.readLive(spark, s"$dir/events.jsonl").count() == 2)
  }

  test("stream-stream join: payments attach within the horizon, both sides watermarked") {
    val dir = Files.createTempDirectory("stream_in_ssj").toString
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/events.jsonl"), Seq(
      // A-1 ordered 10:00; its only payment lands NEXT DAY — outside the 2h horizon
      """{"event_id":"j1","event_type":"order_created","event_time":"2024-01-01T10:00:00","vendor":"vendor_a","payload":"{\"orderRef\":\"A-1\",\"total\":100.0}","ingested_at":"2024-01-01T11:00:00"}""",
      """{"event_id":"j2","event_type":"payment_succeeded","event_time":"2024-01-02T10:00:00","vendor":"vendor_a","payload":"{\"orderRef\":\"A-1\",\"amount\":100.0}","ingested_at":"2024-01-02T11:00:00"}""",
      // B-1 ordered 10:00, paid 11:30 — inside the horizon (order_id dialect)
      """{"event_id":"j3","event_type":"order_created","event_time":"2024-01-02T10:00:00","vendor":"vendor_b","payload":"{\"order_id\":\"B-1\",\"totalAmount\":200.0}","ingested_at":"2024-01-02T10:30:00"}""",
      """{"event_id":"j4","event_type":"payment_succeeded","event_time":"2024-01-02T11:30:00","vendor":"vendor_b","payload":"{\"order_id\":\"B-1\",\"amountPaid\":200.0}","ingested_at":"2024-01-02T12:00:00"}"""
    ).mkString("\n"))
    val stream = EventStream.readLiveStream(spark, dir)
    val joined = EventStream.orderPaymentJoin(stream, stream)
    assert(joined.isStreaming)
    val q = joined.writeStream
      .format("memory").queryName("ssj").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT o_ref, vendor, payment_event_id FROM ssj ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(("B-1", "vendor_b", "j4")))
  }

  test("foreachBatch order upsert: streaming writes the same warehouse state as batch") {
    val dir = Files.createTempDirectory("stream_in2").toString
    writeFixture(dir)
    val out = Files.createTempDirectory("stream_out").toString
    val cp = Files.createTempDirectory("stream_cp").toString
    val stream = EventStream.readLiveStream(spark, dir)
    val q = EventStream.startOrderUpsert(spark,
      EventStream.dedupWithWatermark(stream), s"$out/fact_orders", cp)
    q.awaitTermination(60000)
    val orders = spark.read.parquet(s"$out/fact_orders")
    val ids = orders.select("order_id").collect().map(_.getString(0)).toSet
    assert(ids == Set("A-1", "B-1"))
    assert(orders.count() == 2) // duplicate envelope did not double A-1
  }
}
