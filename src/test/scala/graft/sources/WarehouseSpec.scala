package graft.sources

import graft.{GoldenData, SparkSuite}
import graft.pipeline.CommercePulse
import org.apache.spark.sql.types._

class WarehouseSpec extends SparkSuite {

  test("full star-schema DDL + truncate-load round-trips through the catalog") {
    val db = "wh_spec"
    // clear catalog AND any orphan location from a previous JVM (the
    // in-memory catalog forgets tables, the warehouse dir does not)
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$db.db")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    Warehouse.createAll(spark, db)
    val tables = spark.sql(s"SHOW TABLES IN $db")
      .collect().map(_.getAs[String]("tableName")).toSet
    assert(Warehouse.TableDdl.map(_._1).toSet.subsetOf(tables))

    val orders = GoldenData.orders(spark)
    val payments = GoldenData.payments(spark)
    val refunds = GoldenData.refunds(spark)
    val daily = CommercePulse.factOrderDaily(orders, payments, refunds)
    Warehouse.loadAll(spark, db, orders, payments, refunds, daily,
      CommercePulse.dimCustomer(orders), CommercePulse.dimDate(spark),
      CommercePulse.dimProduct(spark))

    assert(spark.table(s"$db.fact_orders").count() === 560)
    assert(spark.table(s"$db.fact_payments").count() === 360)
    assert(spark.table(s"$db.fact_refunds").count() === 1)
    assert(spark.table(s"$db.fact_order_daily").count() === 252)
    assert(spark.table(s"$db.dim_date").count() === 1461)
    assert(spark.table(s"$db.dim_product").count() === 1)

    // the catalog table's declared schema governs (autodetect=False)
    val dailySchema = spark.table(s"$db.fact_order_daily").schema
    assert(dailySchema("order_date").dataType === DateType)
    assert(dailySchema("order_count").dataType === LongType)
    assert(dailySchema("gross_revenue").dataType === DoubleType)

    // WRITE_TRUNCATE: reloading replaces, never appends
    Warehouse.loadAll(spark, db, orders, payments, refunds, daily,
      CommercePulse.dimCustomer(orders), CommercePulse.dimDate(spark),
      CommercePulse.dimProduct(spark))
    assert(spark.table(s"$db.fact_orders").count() === 560)
    assert(spark.table(s"$db.fact_order_daily").count() === 252)

    // fact written via the catalog reads back identically
    val got = spark.table(s"$db.fact_order_daily")
    import org.apache.spark.sql.functions.col
    val cols = daily.columns.toSeq.map(col)
    assert(GoldenData.canon(got, cols) === GoldenData.canon(daily, cols))
  }
}
