package graft

import org.apache.spark.sql.SparkSession

/** Floor-measurement harness for scale probes: runs each named
  * SparkEntry query `reps` times in ONE session against `sfDir` and
  * prints per-query min/median — the floor-not-sample discipline
  * BASELINE.md's variance notes mandate (single cold samples on this
  * host read 2-6x high from JIT/codegen, not data).
  *
  * Usage: Test/runMain graft.ScaleFloorProbe <sfDir> <q1,q2,...> [reps]
  */
object ScaleFloorProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleFloorProbe <sfDir> <q1,q2,...> [reps]")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 3
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = names.map { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val floor = ts.head
      val med = ts(ts.length / 2)
      println(f"FLOOR $name%-28s min=$floor%.2f med=$med%.2f samples=${ts.map(t => f"$t%.2f").mkString(",")}")
      name -> (floor, med)
    }
    val js = out.map { case (n, (f, m)) => s""""$n":{"min":${(f*100).round/100.0},"med":${(m*100).round/100.0}}""" }
      .mkString("{", ",", "}")
    println(s"""FLOORJSON {"sf":"$sfDir","reps":$reps,"queries":$js}""")
    spark.stop()
  }
}
