package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Similarity

/** Ad-hoc corpus-wide recall@5 measurement for the PQ family — the
  * round-14 "which lever raises recall" experiment harness:
  * `Test/runMain graft.RecallProbe <sfDir>` prints recall for the
  * seed, trained (q94/q98), fully-trained (q102) and
  * more-Lloyd-rounds variants at IDENTICAL storage (m=8, ks=16). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("graft-recall-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").localCheckpoint()
    val nq = e.count().toInt
    def keyset(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = keyset(Similarity.annBruteForce(e, nQueries = nq, k = 5))
    def recall(df: DataFrame): Double =
      (exact & keyset(df)).size.toDouble / exact.size
    def report(name: String, df: DataFrame): Unit =
      println(f"$name%-40s recall@5 = ${recall(df)}%.4f")

    report("q69 seed raw", Similarity.annIvfPq(e, nQueries = nq))
    report("q70 seed residual",
      Similarity.annIvfPq(e, nQueries = nq, residual = true))
    report("q94 trained raw r2", Similarity.annIvfPq(e, nQueries = nq,
      codebook = Some(Similarity.trainedCodebooks(e, rounds = 2))))
    report("q94 trained raw r4", Similarity.annIvfPq(e, nQueries = nq,
      codebook = Some(Similarity.trainedCodebooks(e, rounds = 4))))
    report("q98 trained residual r2",
      Similarity.annIvfPq(e, nQueries = nq, residual = true,
        codebook = Some(Similarity.trainedCodebooks(e, rounds = 2,
          residual = true))))
    report("q98 trained residual r4",
      Similarity.annIvfPq(e, nQueries = nq, residual = true,
        codebook = Some(Similarity.trainedCodebooks(e, rounds = 4,
          residual = true))))
    val cents2 = Similarity.trainedCentroids(e, nCells = 16, rounds = 2)
    report("q102 full-trained c2 r2",
      Similarity.annIvfPq(e, nQueries = nq, residual = true,
        centroids = Some(cents2),
        codebook = Some(Similarity.trainedCodebooks(e, rounds = 2,
          residual = true, centroids = Some(cents2)))))
    report("q102 full-trained c2 r4",
      Similarity.annIvfPq(e, nQueries = nq, residual = true,
        centroids = Some(cents2),
        codebook = Some(Similarity.trainedCodebooks(e, rounds = 4,
          residual = true, centroids = Some(cents2)))))
    val cents4 = Similarity.trainedCentroids(e, nCells = 16, rounds = 4)
    report("q102 full-trained c4 r4",
      Similarity.annIvfPq(e, nQueries = nq, residual = true,
        centroids = Some(cents4),
        codebook = Some(Similarity.trainedCodebooks(e, rounds = 4,
          residual = true, centroids = Some(cents4)))))

    // ---- round-14 sweep: which serving knob closes the remaining
    // gap — probe width (nProbe) or candidate depth (rerank)? The
    // exact-rerank contract means every miss is either a PROBE miss
    // (true neighbor's cell never probed) or a CANDIDATE miss (cell
    // probed, but the codes ranked it below the rerank cut); the
    // sweep separates them by raising one knob at a time over the
    // q102 configuration.
    println("---- q102 serving sweep (nProbe x rerank) ----")
    val book2 = Similarity.trainedCodebooks(e, rounds = 2,
      residual = true, centroids = Some(cents2))
    for (np <- Seq(2, 4, 6, 8, 16); rr <- Seq(32, 64, 128)) {
      val r = recall(Similarity.annIvfPq(e, nQueries = nq, residual = true,
        nProbe = np, rerank = rr,
        centroids = Some(cents2), codebook = Some(book2)))
      println(f"q102 nProbe=$np%-2d rerank=$rr%-3d              recall@5 = $r%.4f")
    }
    // IVF (no PQ) at the same probe widths = the probe-miss ceiling:
    // anything IVF misses at nProbe=p is unreachable for PQ at the
    // same width no matter how deep the rerank.
    for (np <- Seq(2, 4, 6, 8, 16)) {
      val r = recall(Similarity.annIvf(e, nQueries = nq, k = 5,
        nProbe = np, centroids = Some(cents2)))
      println(f"ivf-exact nProbe=$np%-2d (probe ceiling)        recall@5 = $r%.4f")
    }
    spark.stop()
  }
}
