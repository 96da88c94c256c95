package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q90 scale diagnostic (r17 verdict #8): the source-overlap join's
  * pair fan-out is EXACTLY Σ_shingle C(ns, 2) where ns = number of
  * sources carrying that shingle — a deterministic count, measurable
  * without timing noise (the BucketProbe convention). The operator's
  * scale claim is that ns is bounded by the SOURCE CATALOG (tens of
  * named sources), so pair cost grows with the distinct-dictionary
  * size (≤ linear in corpus), not quadratically. This main prints the
  * catalog size, the dictionary size, the exact pair fan-out, and the
  * ns histogram tail at any scale, so a super-linear second-decade
  * TIMING ratio decomposes into "the fan-out actually grew" (a
  * catalog-bound violation — fence it) vs "the fan-out tracked the
  * dictionary" (the timing delta was shuffle/host effects — pin the
  * ratio in BASELINE.md and move on).
  *
  * Usage: Test/runMain graft.SourceOverlapProbe <sfDir> [n]
  */
object SourceOverlapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()
    val sh = docs
      .select(col("source"), explode(operators.Dedup.shingleSet(n)).as("s"))
      .select(col("source"), xxhash64(col("s")).as("k"))
      .distinct()
    val perKey = sh.groupBy("k").agg(count(lit(1)).as("ns"))
    val st = perKey.agg(
      count(lit(1)).as("n_keys"),
      sum(col("ns")).as("dict_rows"),
      // integer end-to-end (the BucketProbe rule): Column `/` is
      // double division and loses exactness past 2^53
      sum(expr("ns * (ns - 1) div 2")).as("pairs"),
      max(col("ns")).as("max_ns"),
      expr("approx_percentile(ns, 0.99)").as("p99_ns")).head
    val nSources = docs.select("source").distinct().count()
    println(s"SOURCEOVERLAPPROBE dir=$dir n_docs=$nDocs sources=$nSources " +
      s"n_keys=${st.getLong(0)} dict_rows=${st.getLong(1)} " +
      s"pairs=${st.get(2)} max_ns=${st.getLong(3)} p99_ns=${st.get(4)} " +
      f"pairs_per_key=${st.get(2).toString.toDouble / st.getLong(0)}%.3f")
    spark.stop()
  }
}
