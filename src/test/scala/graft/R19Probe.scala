package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, Similarity, TextOps}

/** r19 optimization-round phase probe: decomposes the heavy artifact-
  * lifecycle cells (q130/q131/q134/q136) into their phases and counts
  * the files each artifact write produces, so the optimization targets
  * the measured cost, not the suspected one (guide §1).
  *
  * Run: Test/runMain graft.R19Probe [sfDir]
  */
object R19Probe {
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
      println(f"PHASE $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def countFiles(dir: String): Int = {
      val d = new java.io.File(dir)
      if (!d.exists) 0
      else {
        def walk(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles.map(walk).sum
          else if (f.getName.endsWith(".parquet")) 1 else 0
        walk(d)
      }
    }
    def fresh(prefix: String): String = {
      val p = java.nio.file.Files.createTempDirectory(prefix)
      p.toFile.deleteOnExit(); p.toString
    }

    val t = Tables(spark, sfDir)
    val docs = t.documents
    val e = t.embeddings

    // warm the tables + quantizer cache the way a bench chain would
    Seq(docs, e).foreach(df => df.limit(1).write.mode("overwrite").format("noop").save())

    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      // ---- q130 decomposition ----
      val annDir = fresh("r19probe_ann")
      time("q130.writeAnnIndex") { Similarity.writeAnnIndex(e, s"$annDir/index") }
      println(s"FILES ann codes: ${countFiles(s"$annDir/index/codes")}")
      val idx = time("q130.readAnnIndex") { Similarity.readAnnIndex(spark, s"$annDir/index") }
      time("q130.serve+noop") {
        Similarity.annServeIndex(idx, e).write.mode("overwrite").format("noop").save()
      }

      // ---- q131 decomposition ----
      val bmDir = fresh("r19probe_bm25")
      time("q131.writeBm25Index(base)") {
        Retrieval.writeBm25Index(docs.filter(col("doc_id") % 10 =!= 9), s"$bmDir/index")
      }
      println(s"FILES bm25 postings: ${countFiles(s"$bmDir/index/postings")}, " +
        s"lexicon: ${countFiles(s"$bmDir/index/lexicon")}")
      time("q131.appendBm25Index") {
        Retrieval.appendBm25Index(spark, docs.filter(col("doc_id") % 10 === 9), s"$bmDir/index")
      }
      println(s"FILES bm25 postings after append: ${countFiles(s"$bmDir/index/postings")}")
      val bidx = time("q131.readBm25Index") { Retrieval.readBm25Index(spark, s"$bmDir/index") }
      time("q131.serve+noop") {
        Retrieval.bm25ServeIndex(bidx,
          docs.filter(col("doc_id") < 10).select(col("doc_id").as("query_id"), col("text")),
          excludeId = true).write.mode("overwrite").format("noop").save()
      }

      // ---- q134 decomposition ----
      val hyDir = fresh("r19probe_hybrid")
      time("q134.writeBm25Index(full)") { Retrieval.writeBm25Index(docs, s"$hyDir/bm25") }
      val emb = time("q134.embedFrame+ckpt") { TextOps.embedFrame(docs).localCheckpoint() }
      time("q134.writeAnnIndex(emb)") { Similarity.writeAnnIndex(emb, s"$hyDir/ann") }
      time("q134.serve+noop") {
        Retrieval.rrfFusionServed(
          Retrieval.readBm25Index(spark, s"$hyDir/bm25"),
          Similarity.readAnnIndex(spark, s"$hyDir/ann"),
          emb,
          docs.filter(col("doc_id") < 10).select(col("doc_id").as("query_id"), col("text")))
          .write.mode("overwrite").format("noop").save()
      }

      // ---- q136 decomposition ----
      val roDir = fresh("r19probe_rotate")
      time("q136.writeAnnIndex") { Similarity.writeAnnIndex(e, s"$roDir/index") }
      val intake = time("q136.intake+ckpt") {
        e.select((col("vec_id") + lit(900000L)).as("vec_id"),
          expr(s"transform(CAST(embedding AS ARRAY<DOUBLE>), x -> x + 0.25D)")
            .as("embedding")).localCheckpoint()
      }
      time("q136.appendAnnIndex") { Similarity.appendAnnIndex(spark, intake, s"$roDir/index") }
      def report(phase: String) =
        Similarity.annIndexDrift(Similarity.readAnnIndex(spark, s"$roDir/index"), e, intake)
          .withColumn("phase", lit(phase))
          .select("phase", "split", "n_vecs", "mean_qerr", "max_qerr", "retrain_alarm")
      val before = time("q136.report(before)+ckpt") { report("before").localCheckpoint() }
      time("q136.rotateAnnIndex") {
        Similarity.rotateAnnIndex(spark, s"$roDir/index",
          e.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
            .unionByName(intake))
      }
      time("q136.report(after)+union+noop") {
        before.unionByName(report("after")).orderBy("phase", "split")
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
