package graft.normalize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Schema-drift normalization: pure Column-expression builders.
  *
  * The reference resolves vendor payload drift with per-field key-fallback
  * chains (reference `src/transformer.py:52-74,100-111`), lowercases and
  * buckets status strings (`src/transformer.py:66-72`), parses
  * heterogeneous timestamp formats leniently (`src/transformer.py:33`,
  * formats from `src/live_event_generator.py:50,62,71,129`), and derives
  * deterministic ids by hashing natural keys
  * (`src/bootstrap_loader.py:22-24,43`, `src/live_event_generator.py:27-29`).
  *
  * Everything here is a built-in Catalyst expression — no UDFs — so the
  * whole normalization layer stays inside whole-stage codegen and is
  * pushdown/pruning-transparent at any scale.
  */
object Drift {

  /** First non-null among candidate JSON paths of a JSON-string column.
    * Null-only semantics (SQL COALESCE), deliberately NOT Python-falsy
    * (SURVEY §2.10.4): empty string / 0 are real values here.
    */
  def jsonCoalesce(jsonCol: Column, paths: Seq[String]): Column =
    coalesce(paths.map(p => get_json_object(jsonCol, s"$$.$p")): _*)

  /** First non-null among candidate columns (drift key fallback). */
  def coalesceKeys(cols: Seq[Column]): Column = coalesce(cols: _*)

  /** Lowercase + bucket payment-status dialects into canonical
    * {failed, success, <passthrough>} (reference `src/transformer.py:66-72`).
    */
  def normalizeStatus(c: Column): Column = {
    val lc = lower(trim(c))
    when(lc.isin("failed", "fail", "error"), lit("failed"))
      .when(lc.isin("success", "successful", "completed", "paid"), lit("success"))
      .otherwise(lc)
  }

  /** Timestamp formats observed across vendor dialects. */
  val TimestampFormats: Seq[String] = Seq(
    "yyyy-MM-dd'T'HH:mm:ssXXX", // ISO-8601 with Z / offset
    "yyyy-MM-dd'T'HH:mm:ss",    // ISO-8601 naive
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",         // vendor_a "created"
    "yyyy/MM/dd HH:mm:ss"       // vendor_a "paidAt"
  )

  /** Lenient multi-format timestamp parse, null on failure — the
    * `pd.to_datetime(errors="coerce", utc=True)` analogue. Accepts the
    * string dialects plus integer epoch seconds (vendor_c).
    */
  def parseTimestampMulti(c: Column): Column = {
    val s = trim(c)
    val viaFormats = TimestampFormats.map(f => try_to_timestamp(s, lit(f)))
    // epoch seconds: all-digits strings (10-11 chars to avoid YYYYMMDD clash)
    val epochSecs = when(s.rlike("^[0-9]{10,11}$"), timestamp_seconds(s.cast("long")))
    coalesce(viaFormats :+ epochSecs: _*)
  }

  /** Numeric coercion with 0.0 default (reference `src/transformer.py:31`).
    * `try_cast` (not `cast`) — Spark 4 runs ANSI mode by default, where a
    * plain cast throws on malformed input instead of yielding null.
    */
  def toDoubleOrZero(c: Column): Column = coalesce(c.try_cast("double"), lit(0.0))

  /** sha256 deterministic id over `prefix:naturalKey`
    * (reference `src/bootstrap_loader.py:22-24`).
    */
  def sha256Id(prefix: String, naturalKey: Column): Column =
    sha2(concat_ws(":", lit(prefix), naturalKey), 256)

  /** md5 content id over a canonical string form
    * (reference `src/bootstrap_loader.py:43` hashes sorted-key JSON; we
    * hash an explicit, ordered field list instead — key order is then
    * stable by construction).
    */
  def md5Id(fields: Seq[Column]): Column = md5(concat_ws("|", fields: _*))

  /** 12-hex-char sha1 prefix id (reference `src/live_event_generator.py:27-29`). */
  def sha1Id12(fields: Seq[Column]): Column =
    substring(sha1(concat_ws("|", fields: _*)), 1, 12)
}
