package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q34 scale diagnostic (r16 verdict #5): the pair-expansion cost of
  * the LSH-bucketed embedding dedup is EXACTLY Σ_bucket m·(m−1)/2 —
  * a deterministic count, measurable without timing noise. This main
  * prints, for a given corpus, the AutoGeometry bits the operator
  * would pick and the resulting bucket histogram tail + pair count,
  * so a super-linear second-decade TIMING ratio can be decomposed
  * into "the candidate set actually grew super-linearly" (geometry
  * defect — fix suggestBits) vs "the candidate set tracked n" (the
  * timing delta was shuffle/host effects — pin the ratio in
  * BASELINE.md and move on).
  *
  * Usage: Test/runMain graft.BucketProbe <sfDir> [bitsOverride]
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val bits = if (args.length > 1) args(1).toInt
               else operators.Similarity.suggestBits(n)
    val tables = 16
    val signs = operators.Similarity.planeSigns(tables, bits)
    val buckets = e.select(col("vec_id"),
      explode(graft.functions.Exprs.lshBuckets(
        col("embedding").cast("array<double>"), signs, tables, bits)).as("bk"))
    val hist = buckets.filter(col("bk").isNotNull)
      .groupBy("bk").agg(count(lit(1)).as("m"))
    val st = hist.agg(
      count(lit(1)).as("n_buckets"),
      max(col("m")).as("max_m"),
      // integer end-to-end: Column `/` is DOUBLE division, which loses
      // exactness past 2^53 — the super-linear regime this probe
      // exists to adjudicate (r17 ADVICE)
      sum(expr("m * (m - 1) div 2")).as("pairs"),
      expr("approx_percentile(m, 0.99)").as("p99_m")).head
    println(s"BUCKETPROBE dir=$dir n=$n bits=$bits tables=$tables " +
      s"n_buckets=${st.getLong(0)} max_m=${st.getLong(1)} " +
      s"pairs=${st.get(2)} p99_m=${st.get(3)} pairs_per_vec=" +
      f"${st.get(2).toString.toDouble / n}%.1f")
    spark.stop()
  }
}
