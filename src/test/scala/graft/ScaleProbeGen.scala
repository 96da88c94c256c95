package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generates the 10× scale-probe corpus SURVEY §5's measurements use:
  * replicas keep duplicate DENSITY constant (each replica's dup/near-dup
  * structure is preserved; replicas never collide with each other).
  *
  *  - documents ×10: per-replica token suffix → disjoint shingle spaces
  *  - embeddings ×10: dims rotated by replica → disjoint directions
  *  - events ×10: ids/users offset per replica → disjoint key spaces
  *
  * Usage: Test/runMain graft.ScaleProbeGen [outDir] [srcSfDir] [reps],
  * then SPARK_GRAFT_SF_DIR=outDir SPARK_GRAFT_ONLY=… runMain graft.Bench.
  * `reps` (default 10) picks the scale multiple — 30 generates the
  * second-decade probe that tests whether the auto-sized LSH/cell
  * geometry's log-n trend holds past the measured 10× point.
  */
object ScaleProbeGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/probe10x")
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, src)
    val rep = spark.range(reps).withColumnRenamed("id", "r")

    // offsets are max(id)+1, NOT count(): a sparse id space offset by
    // count would overlap replica ranges — silent cross-replica
    // collisions that corrupt every dup-density-sensitive probe number
    def span(df: org.apache.spark.sql.DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1

    val docs = t.documents
    val docSpan = span(docs, "doc_id")
    // per-TOKEN suffix, not a trailing marker: replica vocabularies
    // (hence shingle/fingerprint spaces) must be fully disjoint or
    // every shingle-keyed operator degenerates into 10-way
    // cross-replica matching — 10× data must mean 10× work, not 100×
    docs.crossJoin(rep)
      // source carried through unchanged: replicas grow each source's
      // population (the q59 mixture probe needs per-source counts to
      // scale 10×, not 10× new sources)
      .select((col("doc_id") + col("r") * docSpan).as("doc_id"), col("lang"),
        col("source"),
        array_join(expr("transform(split(text, ' '), t -> concat(t, '_', r))"), " ")
          .as("text"))
      // n_chars must track the rewritten text or metadata-derived
      // operators (m01/m03 geometry, length metrics) probe on lies
      .withColumn("n_chars", length(col("text")))
      // 32 output files, not the crossJoin's single partition: a probe
      // corpus shipped as ONE file has ONE rowgroup, so every scan —
      // whatever maxSplitBytes says — runs on one core and the probe
      // under-reports exactly the CPU-dense operators (q37 regex, q27
      // n-grams) it exists to measure. Production corpora are
      // many-file; the probe must be too.
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val e = t.embeddings
    val vecSpan = span(e, "vec_id")
    e.crossJoin(rep)
      .select((col("vec_id") + col("r") * vecSpan).as("vec_id"),
        expr("transform(sequence(0, 63), i -> element_at(embedding, CAST((i + r) % 64 AS INT) + 1))")
          .as("embedding"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val ev = t.events
    val evSpan = span(ev, "event_id")
    val userSpan = span(ev, "user_id")
    ev.crossJoin(rep)
      .select((col("event_id") + col("r") * evSpan).as("event_id"), col("ts"),
        (col("user_id") + col("r") * userSpan).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // Relational (TPC-H-shaped) tables: facts replicate with offset
    // KEYS so referential joins stay intact per replica (an order's
    // lineitems follow it into the same replica; a customer's orders
    // likewise), dims (region/nation/supplier/part/customer) copy
    // through unchanged — 10× facts against constant dims, exactly the
    // broadcast-join shape the relational operators claim to scale on.
    val ord = t.orders
    val li = t.lineitem
    val ordSpan = span(ord, "o_orderkey")
    ord.crossJoin(rep)
      .select((col("o_orderkey") + col("r") * ordSpan).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    li.crossJoin(rep)
      .select((col("l_orderkey") + col("r") * ordSpan).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    Seq("customer", "supplier", "part", "nation", "region").foreach { d =>
      spark.read.parquet(s"$src/$d.parquet")
        .write.mode("overwrite").parquet(s"$out/$d.parquet")
    }

    println(s"probe corpus at $out: docs=${docs.count() * reps} " +
      s"vecs=${e.count() * reps} events=${ev.count() * reps} " +
      s"lineitem=${li.count() * reps}")
    spark.stop()
  }
}
