package graft

import org.apache.spark.sql.SparkSession

/** Resource profiler for the monotone in-JVM degradation class
  * (s14 17.8→32.6 s across 5 reps at two different commits — flagged
  * by the driver bench chain in r15–r17 without the accumulating
  * resource ever being named; r17 verdict #1 mandates this profile).
  *
  * Runs ONE query `reps` times in one session and prints, per rep:
  * wall seconds, VmRSS (the whole-process number — catches NATIVE
  * growth the heap gauges miss: RocksDB block cache, parquet buffers,
  * codegen classes), JVM heap used, cumulative GC time/count,
  * persistent-RDD count (localCheckpoint blocks pin storage memory
  * until ContextCleaner GC), active stream count, and the /tmp
  * footprint split by category (spark-* scratch incl. RocksDB working
  * dirs, blockmgr-* shuffle dirs, temporary-* streaming checkpoints,
  * imageio* codec cache) — files and MBs for each.
  *
  * A monotone per-rep curve in ONE of these columns names the
  * accumulating resource; flat columns acquit their subsystem.
  *
  * Usage: Test/runMain graft.S14Profile <sfDir> [query] [reps]
  */
object S14Profile {
  private def vmRssMb: Long = {
    val src = scala.io.Source.fromFile("/proc/self/status")
    try src.getLines().find(_.startsWith("VmRSS"))
      .map(_.split("\\s+")(1).toLong / 1024).getOrElse(-1L)
    finally src.close()
  }

  private def gcStats: (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val beans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
    (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
  }

  private def dirFootprint(prefix: String): (Long, Long) = {
    val tmp = new java.io.File(
      System.getProperty("java.io.tmpdir", "/tmp"))
    var files = 0L; var bytes = 0L
    def walk(f: java.io.File): Unit = {
      if (f.isFile) { files += 1; bytes += f.length() }
      else Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
    }
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.toLowerCase.startsWith(prefix)).foreach(walk)
    (files, bytes / (1024 * 1024))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: S14Profile <sfDir> [query] [reps]")
    val sfDir = args(0)
    val name = if (args.length > 1) args(1) else "s14_stream_image_semantic_dedup"
    val reps = if (args.length > 2) args(2).toInt else 10
    require(SparkEntry.queries.contains(name), s"unknown query: $name")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    println("rep wall_s rss_mb heap_mb gc_n gc_ms prdd streams " +
      "spark_files spark_mb blockmgr_files blockmgr_mb ckpt_files ckpt_mb " +
      "imageio_files imageio_mb")
    val rt = Runtime.getRuntime
    def report(tag: String): Unit = {
      val (gcN, gcMs) = gcStats
      val heapMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
      val (sf, sb) = dirFootprint("spark-")
      val (bf, bb) = dirFootprint("blockmgr-")
      val (cf, cb) = dirFootprint("temporary-")
      val (imf, imb) = dirFootprint("imageio")
      val prdd = spark.sparkContext.getPersistentRDDs.size
      val streams = spark.streams.active.length
      println(f"$tag $vmRssMb%6d $heapMb%7d $gcN%4d $gcMs%6d " +
        f"$prdd%4d $streams%7d $sf%11d $sb%8d $bf%14d $bb%11d $cf%10d " +
        f"$cb%7d $imf%13d $imb%10d")
    }
    // S14_PREFIX: run a comma-list of queries once each BEFORE the
    // reps — simulates the bench chain's session state (the monotone
    // degradation never reproduces solo; the question is which
    // chain-accumulated state induces it)
    val prefix = sys.env.getOrElse("S14_PREFIX", "")
    if (prefix.nonEmpty) prefix.split(",").map(_.trim).filter(_.nonEmpty)
      .foreach { p =>
        val t0 = System.nanoTime()
        SparkEntry.queries(p)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        report(f"pfx:$p takes ${(System.nanoTime() - t0) / 1e9}%6.2f")
      }
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      report(f"$rep%3d $wall%6.2f")
    }
    // idle tail: distinguishes a true within-session leak from lazy
    // cleanup (the state-store maintenance thread runs on a 60 s
    // cadence — resources released there are DEBT, not leak)
    val idleSecs = sys.env.getOrElse("S14_IDLE_SECS", "0").toInt
    (1 to idleSecs / 15).foreach { i =>
      Thread.sleep(15000)
      report(f"idle+${i * 15}%3ds  --  ")
    }
    spark.stop()
  }
}
