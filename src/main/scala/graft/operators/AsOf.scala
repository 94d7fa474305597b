package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed as-of join — the classic operator Spark lacks natively: for each
  * left row, attach the latest right row of the same key whose time is
  * `<=` the left row's time (DuckDB `ASOF LEFT JOIN` semantics, inclusive).
  *
  * Union-window formulation: both sides share ONE shuffle by key and one
  * local sort by (time, side); the right payload forward-fills via
  * last(ignoreNulls) over an unbounded-preceding window, then left rows
  * are kept. Compared to the naive range join (left × every earlier right
  * row, then rank) there is NO join amplification — the shuffle carries
  * exactly |left| + |right| rows, which is what survives at 100 TB.
  *
  * Contract: `right` must be unique per (key, time) — pre-aggregate ties
  * away first, or an arbitrary tied row would forward-fill. Null keys or
  * times on the left yield null as-of values; filter them upstream when
  * the oracle semantics require it.
  */
object AsOf {

  /** Backward as-of (the classic): latest right row with
    * `rightTime <= leftTime`.
    *
    * @param left        driving side; all its columns pass through
    * @param right       reference side, unique per (key, rightTime)
    * @param key         equi-key column name (same name both sides)
    * @param leftTime    left probe-time column
    * @param rightTime   right valid-from column
    * @param rightPayload right columns to attach (may include rightTime)
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String]): DataFrame =
    joinAsOfImpl(left, right, key, leftTime, rightTime, rightPayload,
      backward = true)

  /** Forward as-of: EARLIEST right row with `rightTime >= leftTime` —
    * "next scheduled event" attribution. Identical one-shuffle shape:
    * the traversal order just flips to descending time, so the running
    * ignore-nulls `last` sees future rows first.
    */
  def joinAsOfForward(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      rightPayload: Seq[String]): DataFrame =
    joinAsOfImpl(left, right, key, leftTime, rightTime, rightPayload,
      backward = false)

  private def joinAsOfImpl(left: DataFrame, right: DataFrame, key: String,
                           leftTime: String, rightTime: String,
                           rightPayload: Seq[String],
                           backward: Boolean): DataFrame = {
    val rvType = right.select(struct(rightPayload.map(col): _*).as("__rv"))
      .schema("__rv").dataType
    // a null right time would sort to one end and forward-fill its
    // payload into rows with no real as-of match — drop such rows
    // defensively, they have no as-of meaning
    val r = right
      .filter(col(rightTime).isNotNull && col(key).isNotNull)
      .select(col(key).as("__k"), col(rightTime).as("__t"),
        lit(1).as("__isr"), struct(rightPayload.map(col): _*).as("__rv"))
    val l = left
      .withColumn("__k", col(key))
      .withColumn("__t", col(leftTime))
      .withColumn("__isr", lit(0))
      .withColumn("__rv", lit(null).cast(rvType))
    // right rows sort BEFORE left rows at equal time in traversal order,
    // making both directions INCLUSIVE (<= backward, >= forward).
    // nulls-first in BOTH directions: a null left probe time must
    // traverse before any real right row so its fill stays null (desc's
    // default nulls-LAST would hand it the whole partition's history)
    val w = Window.partitionBy("__k")
      .orderBy(if (backward) col("__t").asc_nulls_first
               else col("__t").desc_nulls_first,
        col("__isr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__isr") === 0)
      .select(left.columns.map(col) ++
        rightPayload.map(f => col(s"__rv.$f").as(f)): _*)
  }
}
