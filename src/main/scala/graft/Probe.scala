package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe: schema + timestamp precision sanity checks. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("orders", "documents", "embeddings")) {
      val df = Tables.load(spark, dir, t)
      println(s"== $t: ${df.schema.simpleString}")
      df.show(3, 60, vertical = false)
    }
    val ev = Tables.events(spark, dir)
    println(s"== events: ${ev.schema.simpleString}")
    ev.show(3, 60, vertical = false)
    spark.stop()
  }
}
