package graft.pipeline

import java.time.{LocalDate, LocalDateTime}
import java.time.format.DateTimeFormatter
import scala.util.Random

/** Seeded noisy-event generator — the Scala analogue of the reference's
  * `src/live_event_generator.py:38-237`: three vendor payload dialects,
  * ~5 % exact duplicates (half with a bumped ingested_at), ~10 % late
  * arrivals (1–7 days), ~15 % schema drift (key renames within a dialect),
  * unknown-order noise, and sha1-12 content-derived event ids. Same
  * distributional semantics, not the same RNG stream — reproducibility
  * comes from the seed, so property suites can run the normalize / dedup /
  * aggregate invariants over 10k+ adversarial events instead of
  * hand-written fixtures.
  */
object EventGenerator {

  final case class Config(
      events: Int = 2000,
      dupRate: Double = 0.05,
      lateRate: Double = 0.10,
      driftRate: Double = 0.15,
      seed: Long = 42L,
      day: LocalDate = LocalDate.of(2026, 2, 19))

  /** One generated envelope line plus generator-side ground truth the
    * property tests compare the pipeline's extraction against.
    */
  final case class GenEvent(
      line: String,
      eventId: String,
      eventType: String,
      vendor: String,
      orderId: String,
      paymentId: Option[String],
      isDup: Boolean)

  private val Vendors = Seq("vendor_a", "vendor_b", "vendor_c")
  private val Regions = Seq("Lagos", "Abuja", "Kano", "Kaduna", "PH")
  private val EventTypes = Seq("order_created", "payment_succeeded",
    "refund_issued", "shipment_updated", "order_updated")
  private val TypeWeights = Seq(0.20, 0.33, 0.12, 0.25, 0.10)
  private val Methods = Seq("card", "bank_transfer", "ussd")
  private val Reasons = Seq("customer_request", "duplicate", "damaged", "late_delivery")
  private val Amounts = Seq(5000, 9000, 12000, 18000, 25000, 40000, 65000)

  // ---- tiny JSON writer (payloads are maps/seqs/scalars) ----
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jval(v: Any): String = v match {
    case null => "null"
    case s: String => jstr(s)
    case d: Double => BigDecimal(d).underlying.stripTrailingZeros.toPlainString
    case i: Int => i.toString
    case l: Long => l.toString
    case b: Boolean => b.toString
    case m: Seq[_] if m.nonEmpty && m.head.isInstanceOf[(_, _)] =>
      m.asInstanceOf[Seq[(String, Any)]]
        .map { case (k, x) => jstr(k) + ":" + jval(x) }.mkString("{", ",", "}")
    case m: Seq[_] => m.map(jval).mkString("[", ",", "]")
    case other => jstr(other.toString)
  }

  private def sha1Hex12(s: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)

  private def iso(dt: LocalDateTime): String =
    dt.format(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")) + "Z"

  private def weighted[A](r: Random, items: Seq[A], weights: Seq[Double]): A = {
    val x = r.nextDouble() * weights.sum
    var acc = 0.0
    items.zip(weights).collectFirst {
      case (a, w) if { acc += w; x < acc } => a
    }.getOrElse(items.last)
  }

  /** Vendor payload dialects (`src/live_event_generator.py:38-163`):
    * vendor_a humpback-free legacy keys, vendor_b snake/camel mix with the
    * `state`-means-region homonym, vendor_c nested/abbreviated. Drift
    * renames a key within the dialect.
    */
  private def payload(r: Random, et: String, vendor: String, orderId: String,
                      dt: LocalDateTime, baseAmount: Int, drift: Boolean,
                      currency: String, amount: Double): (Seq[(String, Any)], Option[String]) = {
    def items(n: Int): Seq[Any] = (1 to n).map(_ => Seq[(String, Any)](
      "sku" -> f"SKU-${r.nextInt(220)}%04d", "qty" -> (1 + r.nextInt(3)),
      "price" -> Seq(2500, 4000, 6500, 9000, 12000)(r.nextInt(5))))
    def pick[A](xs: Seq[A]): A = xs(r.nextInt(xs.length))
    val fmtA = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm")
    val fmtPaidA = DateTimeFormatter.ofPattern("yyyy/MM/dd HH:mm:ss")
    val fmtNaive = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
    val epoch = dt.toEpochSecond(java.time.ZoneOffset.UTC)

    (vendor, et) match {
      case ("vendor_a", "order_created") =>
        val base = Seq[(String, Any)](
          "orderRef" -> orderId, "created" -> dt.format(fmtA),
          (if (drift) "buyer" else "customer") ->
            Seq[(String, Any)]("email" -> s"user${1 + r.nextInt(2500)}@example.com"),
          (if (drift) "totalAmount" else "total") -> amount,
          "currency" -> currency, "region" -> pick(Regions),
          "items" -> items(1 + r.nextInt(4)))
        (base, None)
      case ("vendor_a", "payment_succeeded") =>
        val tx = "TX-" + sha1Hex12(s"$orderId|$dt|$amount")
        (Seq[(String, Any)](
          "orderRef" -> orderId, "paidAt" -> dt.format(fmtPaidA),
          (if (drift) "payment_status" else "status") -> "SUCCESS",
          "amount" -> amount, "currency" -> currency,
          "method" -> pick(Methods), "txRef" -> tx), Some(tx))
      case ("vendor_a", "refund_issued") =>
        (Seq[(String, Any)](
          "orderRef" -> orderId, "refundedAt" -> dt.format(fmtNaive),
          "amount" -> amount, "currency" -> currency,
          "reason" -> pick(Reasons),
          (if (drift) "refunded_items" else "items") -> null), None)
      case ("vendor_a", "shipment_updated") =>
        (Seq[(String, Any)](
          "orderRef" -> orderId, "tracking" -> ("TRK-" + sha1Hex12(s"$orderId|$vendor")),
          "status" -> pick(Seq("CREATED", "PICKED_UP", "IN_TRANSIT", "DELIVERED")),
          (if (drift) "update_time" else "updateTime") -> iso(dt)), None)
      case ("vendor_a", _) =>
        (Seq[(String, Any)](
          "orderRef" -> orderId,
          (if (drift) "updated_at" else "updatedAt") -> iso(dt),
          "change" -> pick(Seq("address_change", "qty_change", "phone_change")),
          "notes" -> "customer requested update"), None)

      case ("vendor_b", "order_created") =>
        (Seq[(String, Any)](
          "order_id" -> orderId, "created_at" -> iso(dt),
          "buyerEmail" -> s"user${1 + r.nextInt(2500)}@mail.com",
          "totalAmount" -> amount,
          (if (drift) "currency" else "currencyCode") -> currency,
          "state" -> pick(Regions), // the region-homonym trap
          "line_items" -> items(1 + r.nextInt(4))), None)
      case ("vendor_b", "payment_succeeded") =>
        val tx = sha1Hex12(s"$orderId|$dt|$amount")
        (Seq[(String, Any)](
          "order_id" -> orderId, "paid_at" -> iso(dt), "payment_status" -> "SUCCESS",
          (if (drift) "amount_paid" else "amountPaid") -> amount,
          "currencyCode" -> currency, "channel" -> pick(Methods),
          "transaction_id" -> tx), Some(tx))
      case ("vendor_b", "refund_issued") =>
        (Seq[(String, Any)](
          "order_id" -> orderId, "refunded_at" -> iso(dt), "refundAmount" -> amount,
          "currencyCode" -> currency,
          (if (drift) "reason" else "refund_reason") -> pick(Reasons)), None)
      case ("vendor_b", "shipment_updated") =>
        (Seq[(String, Any)](
          "order_id" -> orderId, "tracking_code" -> ("TRK" + (1000000 + r.nextInt(9000000))),
          (if (drift) "status" else "shipment_status") ->
            pick(Seq("CREATED", "PICKED_UP", "IN_TRANSIT", "DELIVERED")),
          "time" -> iso(dt)), None)
      case ("vendor_b", _) =>
        (Seq[(String, Any)](
          "order_id" -> orderId, "updated_at" -> iso(dt),
          (if (drift) "change" else "change_type") ->
            pick(Seq("address_change", "qty_change", "phone_change"))), None)

      case (_, "order_created") =>
        (Seq[(String, Any)](
          "order" -> Seq[(String, Any)]("id" -> orderId, "ts" -> epoch),
          "email" -> s"user${1 + r.nextInt(2500)}@pulse.africa",
          "amount" -> amount, "ccy" -> currency,
          "geo" -> Seq[(String, Any)]("region" -> pick(Regions)),
          "items" -> items(1 + r.nextInt(4))), None)
      case (_, "payment_succeeded") =>
        val tx = "TRX" + (100000 + r.nextInt(900000))
        (Seq[(String, Any)](
          "order" -> orderId, "timestamp" -> epoch,
          (if (drift) "payment_state" else "state") -> "SUCCESS",
          "amt" -> amount, "ccy" -> currency,
          "paymentMethod" -> pick(Methods), "txn" -> tx), Some(tx))
      case (_, "refund_issued") =>
        (Seq[(String, Any)](
          "order" -> orderId, "ts" -> epoch, "amt" -> amount,
          "ccy" -> currency, "reason" -> pick(Reasons)), None)
      case (_, "shipment_updated") =>
        (Seq[(String, Any)](
          "order" -> Seq[(String, Any)]("id" -> orderId),
          "tracking" -> (100000000 + r.nextInt(900000000)).toString,
          (if (drift) "status" else "state") ->
            pick(Seq("CREATED", "PICKED_UP", "IN_TRANSIT", "DELIVERED")),
          "ts" -> epoch), None)
      case _ =>
        (Seq[(String, Any)](
          "order" -> orderId, "ts" -> epoch,
          "change" -> pick(Seq("address_change", "qty_change", "phone_change")),
          (if (drift) "note" else "notes") -> "legacy update"), None)
    }
  }

  def generate(cfg: Config): Seq[GenEvent] = {
    val r = new Random(cfg.seed)
    val dayStart = cfg.day.atStartOfDay()
    val newOrders = scala.collection.mutable.Queue(
      (1 to math.max(1, (cfg.events * 0.15).toInt)).map(i =>
        f"ORD-${cfg.day.format(DateTimeFormatter.ofPattern("yyMMdd"))}-$i%05d"): _*)
    val pool = scala.collection.mutable.ArrayBuffer[String](newOrders.toSeq: _*)

    val out = scala.collection.mutable.ArrayBuffer[GenEvent]()
    (1 to cfg.events).foreach { _ =>
      val vendor = Vendors(r.nextInt(Vendors.length))
      val et = weighted(r, EventTypes, TypeWeights)
      val orderId =
        if (et == "order_created" && newOrders.nonEmpty) newOrders.dequeue()
        else if (r.nextDouble() < 0.03) s"ORD-UNKNOWN-${1000 + r.nextInt(9000)}"
        else pool(r.nextInt(pool.length))
      val ingestedAt = dayStart.plusSeconds(r.nextInt(86399).toLong)
      val eventTime =
        if (r.nextDouble() < cfg.lateRate)
          ingestedAt.minusDays((1 + r.nextInt(7)).toLong).minusHours((1 + r.nextInt(18)).toLong)
        else ingestedAt.minusMinutes(r.nextInt(121).toLong)
      val drift = r.nextDouble() < cfg.driftRate
      val baseAmount = Amounts(r.nextInt(Amounts.length))
      val currency = if (r.nextDouble() < 0.12) "USD" else "NGN"
      val amount =
        if (currency == "USD")
          math.round(baseAmount / (950.0 + r.nextInt(201) - 80) * 100) / 100.0
        else baseAmount.toDouble
      val (pl, paymentId) =
        payload(r, et, vendor, orderId, eventTime, baseAmount, drift, currency, amount)
      val plJson = jval(pl)
      val eventId = sha1Hex12(s"$vendor|$et|$orderId|${iso(eventTime)}|$plJson")
      val line = jval(Seq[(String, Any)](
        "event_id" -> eventId, "event_type" -> et, "event_time" -> iso(eventTime),
        "vendor" -> vendor, "payload" -> pl, "ingested_at" -> iso(ingestedAt)))
      out += GenEvent(line, eventId, et, vendor, orderId, paymentId, isDup = false)
      if (r.nextDouble() < cfg.dupRate) {
        val dupIngested =
          if (r.nextDouble() < 0.5) iso(ingestedAt.plusMinutes((1 + r.nextInt(180)).toLong))
          else iso(ingestedAt)
        val dupLine = jval(Seq[(String, Any)](
          "event_id" -> eventId, "event_type" -> et, "event_time" -> iso(eventTime),
          "vendor" -> vendor, "payload" -> pl, "ingested_at" -> dupIngested))
        out += GenEvent(dupLine, eventId, et, vendor, orderId, paymentId, isDup = true)
      }
    }
    out.toSeq
  }

  /** Write a generated corpus as a dated JSONL directory (the reference's
    * on-disk layout).
    */
  def writeJsonl(cfg: Config, outRoot: String): String = {
    val dir = java.nio.file.Paths.get(outRoot, cfg.day.toString)
    java.nio.file.Files.createDirectories(dir)
    val path = dir.resolve("events.jsonl")
    java.nio.file.Files.write(path,
      generate(cfg).map(_.line).mkString("\n").getBytes("UTF-8"))
    path.toString
  }
}
