package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for all specs (one JVM per `sbt test`
  * run — Test/fork). Mirrors the Verify session config, including the
  * nanos-as-long read needed by the events table. */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Smallest driver-generated SF — correctness fixtures. */
  val sfDir = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite with Matchers {
  // stable identifier so tests can `import spark.implicits._`
  lazy val spark: SparkSession = SparkSpec.spark
  def tables: Tables = Tables(spark, SparkSpec.sfDir)

  /** Physical plan text (initial AQE plan — join strategy / pushdown /
    * top-k choices are all visible before reoptimization). */
  def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString
}
