package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM, one local session). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session
  lazy val sf: String = "/root/testdata/sf0.001"
}

object SparkSuite {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // same production extensions Verify/Bench run with — the specs must
      // exercise the sessions users actually get
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // production DPP conf (see Verify.scala): reuse-only mode can never
      // prune the partitioned staged indexes' scans under a hinted
      // broadcast join; standalone pruning subqueries let the cost model
      // decide — the shape the IvfConfSpec scan-metrics test certifies
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // The repo's only unpartitioned windows are the DELIBERATE K-row
    // frames (ds_mixture / ds_temperature / ds_interleave quota math —
    // bounded by the language/source domain, commented at each site), so
    // WindowExec's "No Partition Defined" warning is pure noise in test
    // logs; quiet that one logger rather than train readers to ignore
    // warnings.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}
