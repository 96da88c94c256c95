package graft.operators

import org.apache.spark.sql.SparkSession

/** JVM-session cache of VALIDATED artifact-handle METADATA (r20,
  * optimization-guide §1.2 — the verdict-prescribed revalidation
  * cache): a reader that just stamp-validated an index at epoch E in
  * this JVM need not re-run the validation jobs (stats collect,
  * per-leg epoch aggregations, centroid/codebook collects) on the next
  * read a few jobs later — the dominant per-batch cost of the closed
  * intake loops (s09/s23/s24 re-read their artifact once per
  * micro-batch) and of the build→append→serve chains (q131/q134 read
  * the same index three times in one query).
  *
  * What this is NOT: a result cache. Entries hold validated index
  * metadata only (scalars + the KB-scale centroid/codebook arrays a
  * cold read collects anyway); every data-bearing frame (postings,
  * codes, lexicon) is re-created from parquet on every read, and every
  * query still computes from the artifact files. `SPARK_GRAFT_NO_READ_
  * CACHE=1` bypasses the cache entirely (the train-cache convention).
  *
  * Consistency contract:
  *  - every entry is keyed on the artifact path and guarded by a
  *    driver-side FINGERPRINT of its commit leg(s) — the (name, length,
  *    mtime) listing of the stats (+ lexicon) directory, which every
  *    committed mutation swaps (fresh part-file names) — so a mutation
  *    by ANOTHER process is detected and falls back to full validation;
  *  - in-JVM writers INVALIDATE the entry before their first mutating
  *    write and re-install the post-commit state only after their
  *    commit point succeeds — a writer that dies mid-append leaves no
  *    entry, so the next read runs the full torn-state detection the
  *    readers exist to provide;
  *  - a torn mutation by another process CONCURRENT with a cached
  *    reader is outside the artifact family's offline-maintenance
  *    contract (the same quiesce rule compaction documents).
  */
private[operators] object ArtifactCache {
  private def disabled: Boolean =
    sys.env.get("SPARK_GRAFT_NO_READ_CACHE").contains("1")

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, (String, AnyRef)]()

  /** Driver-side fingerprint of the artifact's commit-leg directories:
    * one FS listing per dir (no Spark job, no footer read). Every
    * commit choreography swaps these dirs wholesale with fresh
    * part-file names, so (name, len, mtime) of their children pins the
    * committed state. */
  def fingerprint(spark: SparkSession, dirs: Seq[String]): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    dirs.map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      try {
        val fs = p.getFileSystem(conf)
        fs.listStatus(p)
          .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
          .sorted.mkString(d + "[", "|", "]")
      } catch { case _: java.io.FileNotFoundException => s"$d[ABSENT]" }
    }.mkString("\n")
  }

  /** The cached metadata for `key` iff its fingerprint still matches
    * the artifact's current on-disk commit state. */
  def lookup[T <: AnyRef](spark: SparkSession, key: String,
                          fpDirs: Seq[String]): Option[T] =
    if (disabled) None
    else Option(entries.get(key)).collect {
      case (fp, v) if fp == fingerprint(spark, fpDirs) => v.asInstanceOf[T]
    }

  /** Install the validated metadata for the artifact's CURRENT
    * committed state (fingerprint taken now — callers must be past
    * their commit point). */
  def install(spark: SparkSession, key: String, fpDirs: Seq[String],
              value: AnyRef): Unit =
    if (!disabled) entries.put(key, (fingerprint(spark, fpDirs), value))

  /** Drop the entry — every writer's FIRST action before mutating, so
    * a crash mid-choreography can never leave a valid-looking entry
    * over a torn artifact. */
  def invalidate(key: String): Unit = entries.remove(key)

  /** Max `_b_epoch` carried by a partitioned data leg, read from the
    * partition DIRECTORY NAMES alone — a driver-side walk, no Spark
    * job, no footer read. This keeps the TORN-APPEND detector live on
    * the cache-hit path: the data leg (postings/codes) is not
    * fingerprinted, but an orphan append always lands under a fresh
    * `_b_epoch=E+1` directory, which this walk sees. None for an
    * absent/empty tree (callers fall back to full validation). */
  def maxEpochDir(spark: SparkSession, dir: String): Option[Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    try {
      val fs = root.getFileSystem(conf)
      def epochsUnder(p: org.apache.hadoop.fs.Path): Iterator[Long] =
        fs.listStatus(p).iterator.flatMap { st =>
          val nm = st.getPath.getName
          if (nm.startsWith("_b_epoch="))
            Iterator.single(nm.substring("_b_epoch=".length).toLong)
          else if (st.isDirectory && nm.contains("="))
            epochsUnder(st.getPath) // one more partition level (_p_shard/_p_cell)
          else Iterator.empty
        }
      val es = epochsUnder(root)
      if (es.isEmpty) None else Some(es.max)
    } catch { case _: java.io.FileNotFoundException => None }
  }
}
