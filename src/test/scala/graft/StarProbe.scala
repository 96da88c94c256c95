package graft
import org.apache.spark.sql.SparkSession
/** Empirical check of the connectedComponentsStar round bound: chains
  * of 1k and 10k nodes must converge in FLAT wall time (the round
  * count is O(log² n); per-round data is tiny) — label propagation
  * would need n−1 rounds. Numbers recorded in SURVEY §5. */
object StarProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (n <- Seq(1000, 10000)) {
      val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      val t0 = System.nanoTime()
      val rows = graft.operators.Dedup.connectedComponentsStar(pairs).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      assert(rows.length == n && rows.forall(_.getLong(1) == 0L))
      println(f"STARPROBE chain n=$n%-6d -> one component, $sec%.1f s")
    }
    spark.stop()
  }
}
