package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Retrieval, Similarity}
import graft.streaming.Streams

/** r20: decomposes the intake-loop batch bodies (s09/s23/s24) phase by
  * phase OUTSIDE the engine — readIndex / probe / appends / health —
  * with per-phase Spark JOB counts, so the revalidation-cache work
  * targets the measured jobs. Run: Test/runMain graft.R20Probe [sfDir] */
object R20Probe {
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

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def time[T](label: String)(f: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s  jobs=${jobs.get() - j0}")
      r
    }
    val docs = Tables(spark, sfDir).documents
    docs.limit(1).write.mode("overwrite").format("noop").save()

    (1 to 2).foreach { rep =>
      println(s"=== rep $rep: s09 batch body decomposition ===")
      val corpus = docs.filter(col("doc_id") % 10 =!= 8 && col("doc_id") % 10 =!= 9)
      val tmp = java.nio.file.Files.createTempDirectory("r20s09_").toString
      time("s09 writeBandIndex") { Dedup.writeBandIndex(corpus, s"$tmp/index") }
      Seq("b1" -> docs.filter(col("doc_id") % 10 === 8),
          "b2" -> docs.filter(col("doc_id") % 10 === 9)).foreach { case (name, bdf) =>
        val idx = time(s"$name readBandIndex") {
          Dedup.readBandIndex(spark, s"$tmp/index")
        }
        val admitted = time(s"$name readAdmittedStore") {
          Streams.readAdmittedStore(spark, s"$tmp/admitted")
        }
        val existAll = corpus.select(col("doc_id"), col("text")).unionByName(admitted)
        val b = time(s"$name localCheckpoint batch") { bdf.localCheckpoint() }
        val hits = time(s"$name probe+pin") {
          Dedup.incrementalProbeIndex(idx, existAll, b).localCheckpoint()
        }
        val survivors = time(s"$name survivors+pin") {
          b.join(hits.select(col("new_doc").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
            .join(admitted.select(col("doc_id")), Seq("doc_id"), "left_anti")
            .localCheckpoint()
        }
        time(s"$name hits write") { hits.write.mode("append").parquet(s"$tmp/out") }
        time(s"$name band append") {
          Dedup.appendToBandIndex(survivors, s"$tmp/index")
        }
        time(s"$name admitted write") {
          survivors.select(col("doc_id"), col("text")).write.mode("append").parquet(s"$tmp/admitted")
        }
        b.unpersist(); hits.unpersist(); survivors.unpersist()
      }
      println(s"=== rep $rep: s23 batch body decomposition ===")
      val base = docs.filter(col("doc_id") % 10 =!= 8 && col("doc_id") % 10 =!= 9)
      val t23 = java.nio.file.Files.createTempDirectory("r20s23_").toString
      time("s23 writeBm25Index") { Retrieval.writeBm25Index(base, s"$t23/index") }
      Seq("b1" -> docs.filter(col("doc_id") % 10 === 8),
          "b2" -> docs.filter(col("doc_id") % 10 === 9)).zipWithIndex.foreach { case ((name, bdf), i) =>
        val b = time(s"$name pin batch") { bdf.localCheckpoint() }
        time(s"$name appendBm25Index") {
          Retrieval.appendBm25Index(spark, b, s"$t23/index", batchId = Some(i.toLong))
        }
        val idx = time(s"$name health readBm25Index") {
          Retrieval.readBm25Index(spark, s"$t23/index")
        }
        time(s"$name health lexicon count") { idx.lexicon.count() }
        b.unpersist()
      }
      println(s"=== rep $rep: s24 batch body decomposition ===")
      val e = Tables(spark, sfDir).embeddings
      val ebase = e.filter(col("vec_id") % 10 =!= 8 && col("vec_id") % 10 =!= 9)
      val t24 = java.nio.file.Files.createTempDirectory("r20s24_").toString
      time("s24 writeAnnIndex") {
        Similarity.writeAnnIndex(e, s"$t24/index", encodeOnly = Some(ebase))
      }
      Seq("b1" -> e.filter(col("vec_id") % 10 === 8),
          "b2" -> e.filter(col("vec_id") % 10 === 9)).zipWithIndex.foreach { case ((name, bdf), i) =>
        val b = time(s"$name pin batch") { bdf.localCheckpoint() }
        time(s"$name appendAnnIndex") {
          Similarity.appendAnnIndex(spark, b, s"$t24/index", batchId = Some(i.toLong))
        }
        b.unpersist()
      }
    }
    spark.stop()
  }
}
