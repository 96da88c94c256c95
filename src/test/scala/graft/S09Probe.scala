package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.Streams

/** r19: decomposes s09's per-rep cost — band-index build, batch
  * staging, per-drain engine time — so the optimization targets the
  * measured phase. Run: Test/runMain graft.S09Probe [sfDir] */
object S09Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").write.mode("overwrite").format("noop").save()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = Tables(spark, sfDir).documents
    docs.limit(1).write.mode("overwrite").format("noop").save()
    val corpus = docs.filter(col("doc_id") % 10 =!= 8 && col("doc_id") % 10 =!= 9)

    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val tmp = java.nio.file.Files.createTempDirectory("s09probe_").toString
      time("writeBandIndex") { Dedup.writeBandIndex(corpus, s"$tmp/index") }
      val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
      val nKeys = spark.read.parquet(s"$sfDir/documents.parquet").count()
      Streams.scopedShufflePartitions(spark, Streams.suggestStatePartitions(nKeys)) {
        Seq("b1" -> docs.filter(col("doc_id") % 10 === 8),
            "b2" -> docs.filter(col("doc_id") % 10 === 9)).foreach { case (name, df) =>
          val stage = s"$tmp/landing_stage_$name"
          time(s"stage $name") {
            df.coalesce(1).write.parquet(stage)
            val part = new java.io.File(stage).listFiles()
              .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
            val dest = java.nio.file.Paths.get(s"$tmp/landing/$name.parquet")
            java.nio.file.Files.createDirectories(dest.getParent)
            java.nio.file.Files.move(part.toPath, dest)
          }
          time(s"drain $name") {
            val intake = spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(s"$tmp/landing")
            val q = Streams.streamIncrementalDedupAdmit(intake, s"$tmp/index", corpus,
              s"$tmp/admitted", s"$tmp/out", s"$tmp/cp",
              trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
            q.awaitTermination(); q.stop()
          }
        }
      }
    }
    spark.stop()
  }
}
