package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Design probe for q136 (retrain-rotate): for each candidate drift
  * construction, print the drift report's fixed-point mean-qerr ratio
  * (intake/base, ppm-style ×100) BEFORE (quantizers trained on base)
  * and AFTER (trained on base ∪ intake) a rotation — the alarm
  * compares that ratio against 120. The operator story needs
  * before > 120 and after ≤ 120 ROBUSTLY across the gate SFs; this
  * probe is how the construction was chosen on measurements, not
  * hope (the count-probe discipline — exact integers, no timing).
  *
  * Usage: Test/runMain graft.RotateProbe <sfDir> [offsets] [fracs]
  *   offsets: comma list of per-coordinate translations (default
  *            0.25,0.5,1.0)
  *   fracs:   comma list of intake id-filters: mod10 (ids ≡ 9 mod 10,
  *            a 10% slice) or all (the whole corpus re-crawled)
  */
object RotateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val offsets = (if (args.length > 1) args(1) else "0.25,0.5,1.0")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val fracs = (if (args.length > 2) args(2) else "mod10,all")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val rounds = (if (args.length > 3) args(3) else "2")
      .split(",").map(_.trim.toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .localCheckpoint()
    for (off <- offsets; frac <- fracs; cr <- rounds) {
      val slice = if (frac == "all") e else e.filter(col("vec_id") % 10 === 9)
      val intake = slice
        .select((col("vec_id") + lit(900000L)).as("vec_id"),
          expr(s"transform(embedding, x -> x + ${off}D)").as("embedding"))
        .localCheckpoint()
      val union = e.unionByName(intake)
      def ratio(trainOn: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
        val dir = java.nio.file.Files.createTempDirectory("rotprobe_").toString
        val cents = Similarity.trainedCentroids(trainOn, nCells = 16, rounds = cr)
        val book = Similarity.trainedCodebooks(trainOn, nCells = 16,
          rounds = 2, residual = true, centroids = Some(cents))
        Similarity.writeCentroids(cents, spark, s"$dir/centroids")
        Similarity.writeCodebook(book, spark, s"$dir/codebook")
        // read the report through the public drift path on a synthetic
        // index handle: build a real index dir quickly via rotate-free
        // writeAnnIndex is slower; instead compute via annIndexDrift on
        // a minimal AnnIndex-like path — easiest is a real index:
        java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        val idxDir = java.nio.file.Files.createTempDirectory("rotprobeidx_").toString
        Similarity.writeAnnIndex(trainOn, s"$idxDir/index", centRounds = cr)
        val rep = Similarity.annIndexDrift(
            Similarity.readAnnIndex(spark, s"$idxDir/index"), e, intake)
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getDouble(2)))).toMap
        val bm = (rep("base")._2 * 1048576).round
        val im = (rep("intake")._2 * 1048576).round
        (bm, im, if (bm > 0) im * 100 / bm else -1)
      }
      val (bb, bi, br) = ratio(e)
      val (ab, ai, ar) = ratio(union)
      println(f"PROBE off=$off frac=$frac centRounds=$cr  " +
        f"before: base=$bb intake=$bi ratio%%=$br  " +
        f"after: base=$ab intake=$ai ratio%%=$ar  " +
        f"(alarm fires >120): before=${br > 120} after=${ar > 120}")
    }
    spark.stop()
  }
}
