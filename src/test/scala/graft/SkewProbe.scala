package graft.operators

import org.apache.spark.sql.functions._

/** Ad-hoc cell-skew measurement backing q93's anisotropy-cap law:
  * `Test/runMain graft.operators.SkewProbe` prints max-cell sizes and skew
  * ratios for the synthetic embeddings vs hashed-bag text embeddings
  * at the seed quantizer's declared geometries. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("graft-skew-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def skew(name: String, frame: org.apache.spark.sql.DataFrame): Unit = {
      val f = frame.localCheckpoint()
      val n = f.count(); val nc = Similarity.suggestCells(n)
      val cents = Similarity.seedCentroids(f, nc)
      val e = f.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val mx = Similarity.assignCells(e, cents).groupBy("cell").count()
        .agg(max("count")).first().getLong(0)
      println(f"SKEW $name%-24s n=$n%6d nc=$nc%4d max=$mx%6d ratio=${mx.toDouble / (n.toDouble / nc)}%.2f")
    }
    for (sf <- Seq("sf0.01", "sf0.1")) {
      skew(s"synthetic $sf",
        spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet"))
      skew(s"hashed-bag $sf",
        TextOps.embedFrame(
          spark.read.parquet(s"/root/testdata/$sf/documents.parquet")))
    }
    // decomposition mode (r14): for each extra dir argument, separate
    // TRAINING funnel from ASSIGNMENT funnel on the bag corpus —
    // worst cell under seeds vs trained centroids, each assigned by
    // the exact flat argmax vs the two-level approximation.
    args.foreach { dir =>
      val f = TextOps.embedFrame(
        spark.read.parquet(s"$dir/documents.parquet")).localCheckpoint()
      val n = f.count(); val nc = Similarity.suggestCells(n)
      val e = f.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")).localCheckpoint()
      def mx(cents: Array[(Long, Array[Double])], twoLevel: Boolean): Long =
        Similarity.assignCells(e, cents,
            twoLevelMin = if (twoLevel) 257 else Int.MaxValue)
          .groupBy("cell").count().agg(max("count")).first().getLong(0)
      val seeds = Similarity.seedCentroids(f, nc)
      val trained = Similarity.trainedCentroids(f, nCells = nc, rounds = 2)
      val trained4 = Similarity.trainedCentroids(f, nCells = nc, rounds = 4)
      for ((cn, cents) <- Seq("seed" -> seeds, "trained-r2" -> trained,
             "trained-r4" -> trained4);
           (an, tl) <- Seq("flat" -> false, "two-level" -> true)) {
        val m = mx(cents, tl)
        println(f"DECOMP $dir $cn%-10s $an%-10s n=$n%7d nc=$nc%4d surv=${cents.length}%4d max=$m%6d ratio=${m.toDouble / (n.toDouble / nc)}%.2f")
      }
    }
    spark.stop()
  }
}
