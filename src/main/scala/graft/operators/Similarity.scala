package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exprs

/** Embedding similarity search for LLM training-data pipelines
  * (SURVEY.md §2, q24–q26) over the `embeddings` table
  * (64-dim float vectors).
  *
  * Dot products run through the native [[graft.functions.Exprs.DotProduct]]
  * expression — a codegen'd fused loop that accumulates left-to-right,
  * exactly like DuckDB's explicit `v[1]*w[1] + v[2]*w[2] + …` oracle
  * chains, so raw cosines agree across engines to the last bit and the
  * 4-dp rounded outputs are identical. (The previous 64-term
  * `element_at` chains computed the same value but overflowed janino's
  * 64 KB method limit on the join stages, silently dropping the whole
  * stage to interpreted mode — q24 alone cost 85 s at sf0.1; see
  * Exprs' scaladoc.)
  */
object Similarity {

  private def vecD(c: Column): Column = c.cast("array<double>")

  /** Codegen'd exact dot product (left-to-right accumulation). */
  private[operators] def dot(a: Column, b: Column): Column = Exprs.dot(a, b)

  private def norm(v: Column): Column = sqrt(Exprs.dot(v, v))

  /** vec_id, v (double), nrm — shared scan shape. */
  private def prepared(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), vecD(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** q24: embedding-cosine near-dup pairs — the EXPLICITLY-EXACT
    * all-pairs variant (cos ≥ tau). One side is broadcast, so the plan
    * is a broadcast nested-loop join: n·m comparisons with no shuffle.
    * This is the oracle/recall-reference for bucketed methods; at
    * 100 TB run q26's LSH buckets as the candidate generator and this
    * cosine verification only within buckets.
    *
    * Because the cost is quadratic BY DESIGN, the plan carries a
    * fail-loud corpus-size guard (same in-plan style as
    * [[cappedBucket]]: a count-only pre-aggregate broadcast into the
    * build side — no driver action, no extra shuffle): above `maxRows`
    * vectors the query errors with a pointer at the bucketed paths
    * instead of quietly burning n² on the cluster. `exactOk = true`
    * (or `maxRows <= 0`) is the deliberate-quadratic escape hatch for
    * recall studies. */
  def embeddingNearDups(embeddings: DataFrame, tau: Double = 0.4,
      maxRows: Long = 250000L, exactOk: Boolean = false): DataFrame = {
    val e = prepared(embeddings)
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b0 = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    val b = if (exactOk || maxRows <= 0) b0 else {
      val guard = e.agg(count(lit(1)).as("_n"))
        .select(when(col("_n") > maxRows, raise_error(concat(
          lit("embeddingNearDups (q24) is the EXACT all-pairs recall oracle: " +
            "the corpus holds "), col("_n").cast("string"),
          lit(s" vectors (cap $maxRows) and the n² cosine comparisons " +
            "would go quadratic at this size — use embeddingNearDupsBucketed " +
            "(q34) or semanticDedup (q57) at scale, or pass exactOk = true " +
            "to run the quadratic deliberately"))))
          .otherwise(lit(1)).as("_ok"))
      // the filter REFERENCES _ok so ColumnPruning cannot discard the
      // raise_error as an unused projection (a bare drop did exactly
      // that); it is always-true on the non-error path
      b0.crossJoin(broadcast(guard)).filter(col("_ok") === 1).drop("_ok")
    }
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("cos_raw", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos_raw") >= tau)
      .select(col("vec_a"), col("vec_b"), round(col("cos_raw"), 4).as("cos_sim"))
  }

  /** q25: exact cosine top-k neighbors for a query set (vec_id <
    * nQueries). Queries are broadcast — a single pass over the corpus
    * scores every (query, candidate) pair; the per-query top-k window
    * shuffles only nQueries·n scored rows. Ranking orders by the
    * ROUNDED cosine with vec_id tie-break so rank assignment is
    * engine-stable. */
  def annBruteForce(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = prepared(embeddings)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** q125's serving-config spec table — the exact four-point sweep the
    * q105 serving decision was argued from (RecallProbe's r14
    * decomposition: probe width vs rerank depth); spliced into the
    * oracle (the q112 DefaultEpochs rule). */
  private[graft] val DefaultFrontier: Seq[(Int, Int)] =
    Seq((4, 32), (4, 64), (8, 32), (8, 64))

  /** q125: the RECALL/COST FRONTIER as a declared report — q96's shape
    * (a literal spec table × a measured value per row) applied to ANN
    * serving: ONE fully-trained index (q102's build: Lloyd centroids +
    * residual-trained codebooks), searched at every (nProbe, rerank)
    * config in `configs`, each config's top-k keyset scored against
    * the exact brute-force top-k — so serving-point selection (the
    * q105 argument) is a GRADED query instead of a test-side sweep.
    * Output per config: (n_probe, rerank, n_exact, n_hit, recall5) —
    * recall5 = ONE IEEE division of two counts, and the counts are
    * exact set intersections of deterministic keysets, so the DuckDB
    * oracle replays the whole sweep bit-for-bit (the per-config search
    * chains share one index-CTE block, exactly as the Spark side
    * shares one trained index).
    *
    * Cost: the one-time index build (q102's training — the dominant
    * term, paid once and shared) + |configs| probe-pruned searches +
    * one brute-force baseline over nQueries query points. The
    * brute-force baseline is the certification cost (it IS the recall
    * denominator); production reuses a held-out labeled query set.
    * The config columns double as the COST model: per query, a config
    * reads nProbe·targetCell ADC rows and rerank float rows —
    * constant in corpus size (q105's law), so the frontier report is
    * literally recall vs those two knobs. */
  def annServingFrontier(embeddings: DataFrame,
                         configs: Seq[(Int, Int)] = DefaultFrontier,
                         nQueries: Int = 10, k: Int = 5): DataFrame = {
    require(configs.nonEmpty, "annServingFrontier needs at least one config")
    require(configs.forall { case (np, rr) => np > 0 && rr > 0 },
      "every (nProbe, rerank) config must be positive")
    // one checkpoint: the embedding scan feeds training (driver-side
    // Lloyd jobs), the baseline, and |configs| searches — the q93
    // diamond rule
    val e = embeddings.localCheckpoint()
    val cents = trainedCentroids(e, nCells = 16, rounds = 2)
    val bookRaw = trainedCodebooks(e, rounds = 2, residual = true,
      centroids = Some(cents))
    val exact = annBruteForce(e, nQueries, k)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    val nExact = exact.count()
    // ENCODE ONCE, search per config (r19): the configs differ only in
    // (nProbe, rerank) — serve-side knobs — so the corpus PQ codes are
    // identical across all of them, yet the annIvfPq composition
    // re-encoded the corpus inside every config's subtree (the r19
    // plan audit read ex=60 ≈ 4 encode+search chains). One pinned
    // encode is exactly the artifact the persisted-index family
    // (q130) serves from; the per-config searches are byte-identical
    // search bodies over it (pqSearch — the q105 shared-body rule).
    val dim = 64; val m = 8; val ks = 16; val dsub = dim / m
    val book: Seq[(Int, Int, Array[Double], Double)] =
      bookRaw.toSeq.map { case (s, code, cv) =>
        (s, code, cv, cv.foldLeft(0.0)((a, x) => a + x * x))
      }
    val ep = prepared(e)
    val cellTab = pqCellTable(cents, book, dsub, e.sparkSession)
    val codes = pqEncode(ep, cents, book, m, ks, dsub, residual = true)
      .localCheckpoint()
    // SEARCH ONCE at max(nProbe), rank per config (r20, verdict #3 —
    // §2.4 applied to the search half the way r19 did the encode
    // half): the configs differ only in serve-side knobs, and a
    // candidate's approx score is config-independent (each code row
    // lives in ONE cell, so the probe join yields at most one scored
    // row per (query, neighbor) — identical for every config that
    // probes that cell). One probe window at maxNp CARRIES the probe
    // rank `pr`; a config's candidate set is exactly pr <= nProbe; one
    // per-(query, config) window replays each config's shortlist cut;
    // exact cosines are computed once per DISTINCT shortlisted pair
    // and re-ranked per config. Every expression below is pqSearch's
    // verbatim (same windows, same tie-breaks, same rounding point),
    // so per-config rows are identical by construction — and the
    // oracle gate checks the composition end to end. The former shape
    // ran |configs| FULL search bodies: 4x the probe/ADC/shortlist
    // subtrees (plan: ex=44, win=36 -> well under half that).
    val spark = e.sparkSession
    import spark.implicits._
    val maxNp = configs.map(_._1).max
    val cellIds = lit(cents.map(_._1))
    val queries = ep.filter(col("vec_id") < nQueries)
    val wq = Window.partitionBy("query_id").orderBy(col("score").desc, col("cell"))
    val probes0 = queries
      .select(col("vec_id").as("query_id"), posexplode(seedCellScores(cents)(col("v"))))
      .select(col("query_id"),
        element_at(cellIds, col("pos").cast("int") + 1).as("cell"), col("col").as("score"))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= maxNp)
    val probes = probes0.join(cellTab, Seq("cell"))
      .select(col("query_id"), col("cell"), col("pr"),
        (col("score") * sqrt(col("c2c"))).as("qcdot"))
    val adc = queries.select(col("vec_id").as("query_id"), col("nrm").as("qn"),
      array(book.sortBy(b => (b._1, b._2)).map { case (s, _, cv, _) =>
        Exprs.dot(slice(col("v"), s * dsub + 1, dsub), lit(cv))
      }: _*).as("adc"))
    val numerator = col("qcdot") + pqLookupSum(col("adc"), col("codes"), m, ks)
    val scored = codes.withColumnRenamed("vec_id", "neighbor_id")
      .join(broadcast(probes.join(broadcast(adc), Seq("query_id"))), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx", numerator / (col("qn") * sqrt(col("vn2"))))
      .select("query_id", "neighbor_id", "approx", "pr")
    // the config frame is |configs| literal rows; the pr <= n_probe
    // attach is a broadcast NLJ BOUNDED by that literal count — the
    // q135 one-row-frame class, never corpus-scaled
    val cfg = configs.toDF("n_probe", "rerank")
    val perCfg = scored.join(broadcast(cfg), col("pr") <= col("n_probe"))
    val wr = Window.partitionBy("query_id", "n_probe", "rerank")
      .orderBy(col("approx").desc, col("neighbor_id"))
    val short = perCfg.withColumn("ar", row_number().over(wr))
      .filter(col("ar") <= col("rerank"))
      .select("n_probe", "rerank", "query_id", "neighbor_id")
    // exact re-rank: one cosine per DISTINCT shortlisted pair, shared
    // by every config that shortlists it (values identical — the
    // rounding sits exactly where pqSearch puts it)
    val qv = queries.select(col("vec_id").as("query_id"),
      col("v").as("qv"), col("nrm").as("qn"))
    val nv = ep.select(col("vec_id").as("neighbor_id"),
      col("v").as("nv"), col("nrm").as("nn"))
    val pairCos = nv
      .join(broadcast(short.select("query_id", "neighbor_id").distinct()),
        Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos_sim",
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4))
      .select("query_id", "neighbor_id", "cos_sim")
    val wf = Window.partitionBy("query_id", "n_probe", "rerank")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    val topk = short.join(broadcast(pairCos), Seq("query_id", "neighbor_id"))
      .withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= k)
    // per-config hit counts against the shared exact baseline; a
    // zero-hit config must still emit its row (left join, 0 fill)
    val hits = topk.select("n_probe", "rerank", "query_id", "neighbor_id")
      .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("n_probe", "rerank").agg(count(lit(1)).as("n_hit"))
    cfg.join(hits, Seq("n_probe", "rerank"), "left")
      .select(col("n_probe"), col("rerank"), lit(nExact).as("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .select(col("n_probe"), col("rerank"), col("n_exact"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_exact").cast("double"))
          .as("recall5"))
      .orderBy("n_probe", "rerank")
  }

  /** Deterministic ±1 hyperplane matrix: sign(t, p, d) = top bit of
    * md5("h{t}_{p}_{d}"). Pure public construction (sign-random-
    * projection LSH, Charikar 2002) with md5 as the PRNG so the same
    * literal matrix can be embedded in the DuckDB oracle. */
  private[graft] def planeSigns(tables: Int, bits: Int, dim: Int = 64): Array[Array[Double]] = {
    val mdf = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables * bits) { tp =>
      val t = tp / bits; val p = tp % bits
      Array.tabulate(dim) { d =>
        val h = mdf.digest(s"h${t}_${p}_${d}".getBytes("UTF-8"))
        if ((h(0) & 0x80) != 0) 1.0 else -1.0
      }
    }
  }

  /** q34: embedding near-dup pairs AT SCALE — the composition q24's
    * scaladoc prescribes, as a first-class operator: sign-random-
    * projection buckets generate candidates (bucket-local expansion,
    * one signature pass), exact cosine verifies only within buckets.
    * Cost is Σ bucket² instead of n²; recall at the default geometry
    * is 1-(1-(1-θ(τ)/π)^bits)^tables ≈ 0.94 at cos = 0.4 and ≈ 1 for
    * genuinely-near pairs (cos ≥ 0.8) — the approximation is the
    * candidate set only; every emitted cosine is exact.
    *
    * `bits` MUST grow with corpus size ([[suggestBits]]): Σ bucket² ≈
    * tables·n²/2^bits, so stale geometry degrades quadratically.
    * Measured on the 10× probe corpus (20k vectors): bits=4 (sized for
    * the 500–2k test tables) takes 301 s — worse than exact q24 —
    * while suggestBits(20k)=8 takes 14 s at the same recall target.
    * The default is therefore [[AutoGeometry]]: bits derives from the
    * corpus count at call time, so the un-parameterized path scales. */
  def embeddingNearDupsBucketed(embeddings: DataFrame, tau: Double = 0.4,
                                bits: Int = AutoGeometry, tables: Int = 16,
                                maxBucket: Int = 1024): DataFrame = {
    val b = resolveBits(embeddings, bits)
    val signs = planeSigns(tables, b)
    val e = embeddings.select(col("vec_id"), vecD(col("embedding")).as("v"))
    val buckets = e.select(col("vec_id"),
      explode(Exprs.lshBuckets(col("v"), signs, tables, b)).as("bk"))
    val cands = buckets.filter(col("bk").isNotNull).groupBy("bk")
      .agg(cappedBucket(collect_list(col("vec_id")), maxBucket,
        "embeddingNearDupsBucketed").as("vs"))
      .filter(size(col("vs")) > 1)
      .select(explode(col("vs")).as("vec_a"), col("vs"))
      .select(col("vec_a"), explode(col("vs")).as("vec_b"))
      .filter(col("vec_a") < col("vec_b"))
      .distinct()
    val en = prepared(embeddings)
    cands
      .join(en.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na")),
        Seq("vec_a"))
      .join(en.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb")),
        Seq("vec_b"))
      .withColumn("cos_raw", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos_raw") >= tau)
      .select(col("vec_a"), col("vec_b"), round(col("cos_raw"), 4).as("cos_sim"))
  }

  /** Bucket-granularity sizing for [[annLsh]]: `bits` such that the
    * expected bucket size n/2^bits lands near `targetBucket` — the
    * "grow bits with log n" rule as code. At n=2k/target=128 → 4 bits;
    * at n=10⁹ → 23 bits. Recall lost to narrower buckets is bought
    * back with more `tables`. */
  def suggestBits(n: Long, targetBucket: Int = 128): Int =
    math.max(1, math.ceil(math.log(n.toDouble / targetBucket) / math.log(2)).toInt)

  /** Sentinel default for the geometry parameters (`bits` in
    * [[annLsh]]/[[embeddingNearDupsBucketed]], `nCells` in
    * [[semanticDedup]]): derive the geometry from the corpus count at
    * call time via [[suggestBits]]/[[suggestCells]], so the DEFAULT
    * path sizes itself to the data instead of carrying a test-SF
    * constant that hits [[cappedBucket]] at 10× (the round-10 verdict's
    * top item). The count is one cheap metadata-weight job — the same
    * "index metadata to the driver" budget as [[seedCentroids]] — and
    * runs once per operator call, at plan-build time.
    *
    * Explicitly-passed geometry is honored verbatim and keeps the
    * fail-loud cap: a caller who pins stale `bits` for a grown corpus
    * still dies at [[cappedBucket]] with the resize message rather than
    * silently going quadratic. */
  val AutoGeometry: Int = -1

  private def resolveBits(embeddings: DataFrame, bits: Int): Int =
    if (bits == AutoGeometry) suggestBits(embeddings.count()) else bits

  private def resolveCells(embeddings: DataFrame, nCells: Int): Int =
    if (nCells == AutoGeometry) suggestCells(embeddings.count()) else nCells

  /** Stale-geometry guard for the bucket-local expansion stage: a
    * bucket over `maxBucket` members fails the job LOUDLY instead of
    * silently going quadratic (bucket work is Σ bucket², so ONE
    * degenerate bucket at 100 TB is a runaway stage, not a slow one —
    * the measured cliff: bits=4 on the 20k-vector probe corpus runs
    * 301 s vs 14 s correctly sized). The check is a per-row predicate
    * on the already-aggregated bucket — zero extra scans, zero extra
    * shuffles, SF-independent. `maxBucket <= 0` disables (callers who
    * have verified their geometry out-of-band).
    *
    * The default cap is 8× [[suggestBits]]'s target bucket (128): wide
    * enough for legitimate skew at sized geometry, tight enough that a
    * corpus ~10× past its geometry FAILS here instead of quietly
    * burning bucket² — the original 4096 cap let exactly that slip
    * (the 10× probe at stale bits=4 has 1250-member buckets: under
    * 4096, so it ran the full 285 s cliff instead of dying with the
    * resize message). */
  private def cappedBucket(vs: Column, maxBucket: Int, op: String): Column =
    if (maxBucket <= 0) vs
    else when(size(vs) > maxBucket,
      raise_error(concat(
        lit(s"$op: an LSH bucket holds "), size(vs).cast("string"),
        lit(s" vectors (cap $maxBucket) — `bits` is stale for this corpus " +
          "size and candidate generation would go quadratic; resize with " +
          "suggestBits(n) (and buy recall back with more tables), or raise " +
          "maxBucket if the geometry is deliberate"))))
      .otherwise(vs)

  /** q46: IVF (inverted-file) approximate nearest neighbors — the
    * OTHER classic ANN index besides LSH (q26): partition the corpus
    * into cells around centroids, search only the query's `nProbe`
    * closest cells.
    *
    * The coarse quantizer is deterministic — the `nCells`
    * lowest-vec_id vectors serve as centroids (production trains
    * k-means; centroid CHOICE is orthogonal to the index structure and
    * query path exercised here, and a deterministic choice is what
    * lets DuckDB replicate the whole operator bit-for-bit).
    *
    * Spark-first shape: IVF centroids are index METADATA — nCells·dim
    * doubles — so they are collected ONCE to the driver (the one
    * justified `.collect()` in the library: kilobytes, like AQE's
    * broadcast decisions) and embedded as array literals. Cell
    * assignment is then a PURE per-row expression — argmax over
    * nCells codegen'd dot products, zero shuffle, no join against a
    * centroid table — and the only shuffles are the candidate
    * equi-join keyed by `cell` and the final per-query top-k window.
    * Cost: corpus-pass + Σ probed-cell sizes, never n²; expected
    * probe fraction = nProbe/nCells of the corpus per query. `nCells`
    * grows with √n (classic IVF sizing) to keep cells bounded.
    *
    * Ties everywhere break toward the smaller cell id / neighbor id,
    * identically in the oracle's ROW_NUMBER ordering. */
  /** Shared deterministic coarse quantizer (q46/q48): the `nCells`
    * lowest-vec_id vectors as centroids — collected ONCE to the driver
    * (kilobytes of index metadata, the one justified `.collect()` in
    * the library) and embedded as array literals. vec_id is read as
    * long uniformly so the same helper serves int- and long-typed
    * sources without truncation. */
  private[graft] def seedCentroids(embeddings: DataFrame,
                            nCells: Int): Array[(Long, Array[Double])] = {
    val cents = embeddings
      .filter(col("vec_id") < nCells)
      .select(col("vec_id").cast("long"), vecD(col("embedding")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(cents.nonEmpty,
      s"need at least one seed vector with vec_id < $nCells")
    cents
  }

  /** Coarse-quantizer resolution for the IVF family's `centroids`
    * override: `None` (the default, and the declared-query mode) is
    * the deterministic [[seedCentroids]] quantizer the DuckDB oracle
    * replays; `Some(table)` quantizes on CALLER-TRAINED centroids —
    * [[trainedCentroids]]'s output, or any (id, vector) table — which
    * is how production closes the quality gap centroid choice leaves
    * on the table (recall follows cell-boundary quality; SemDeDup &
    * IVF papers both train). The table is validated (non-empty,
    * distinct ids, uniform dimension) and id-sorted so downstream
    * tie-breaks keep the smaller-cell-id convention. Index structure,
    * probe path and every downstream contract are IDENTICAL in both
    * modes — centroid choice is index metadata, not semantics. */
  private def resolvedCentroids(
      embeddings: DataFrame, nCells: Int,
      centroids: Option[Array[(Long, Array[Double])]]): Array[(Long, Array[Double])] =
    centroids match {
      case Some(cs) =>
        require(cs.nonEmpty, "centroids override must be non-empty")
        require(cs.map(_._1).distinct.length == cs.length,
          "centroids override must have distinct cell ids")
        require(cs.map(_._2.length).distinct.length == 1,
          "centroids override must have a uniform dimension")
        // dimension must MATCH the corpus: DotProduct truncates to the
        // shorter operand, so a wrong-dim table would quietly
        // misquantize every vector instead of erroring. One first()
        // against the corpus (a single-row read) buys the loud check.
        val corpusDim = embeddings.select(size(vecD(col("embedding"))))
          .first().getInt(0)
        require(cs.head._2.length == corpusDim,
          s"centroids override dimension ${cs.head._2.length} does not " +
            s"match the corpus embedding dimension $corpusDim")
        cs.sortBy(_._1)
      case None => seedCentroids(embeddings, nCells)
    }

  /** score(v, c) = dot(v, c)/|c| — |v| is constant per row, so the
    * per-vector argmax/ordering equals the cosine argmax. The |c|
    * divisions constant-fold (the spherical quantizer). */
  private def seedCellScores(cents: Array[(Long, Array[Double])])(v: Column): Column =
    array(cents.map { case (_, arr) =>
      val c = lit(arr)
      dot(v, c) / sqrt(dot(c, c))
    }: _*)

  def annIvf(embeddings: DataFrame, nCells: Int = 16, nProbe: Int = 4,
             nQueries: Int = 10, k: Int = 5,
             centroids: Option[Array[(Long, Array[Double])]] = None): DataFrame = {
    val cents = resolvedCentroids(embeddings, nCells, centroids)
    val cellIds = lit(cents.map(_._1))
    def cellScores(v: Column): Column = seedCellScores(cents)(v)
    val e = prepared(embeddings)
    // corpus-side assignment: the dual-shape argmax (literal array at
    // test geometry — first-max position -> smallest cell id on ties,
    // element_at mapping the position back to the centroid's vec_id —
    // and the broadcast-table max-struct past the ~32-centroid janino
    // window, the same routing annIvfPq uses). The QUERY-side literal
    // scores below run on nQueries rows, where even an interpreted
    // fallback is microseconds.
    val assigned = assignCellsFull(e, cents)
      .select(col("vec_id").as("neighbor_id"), col("cell"),
        col("v").as("cv"), col("nrm").as("cn"))
    val wq = Window.partitionBy("query_id").orderBy(col("score").desc, col("cell"))
    val probes = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        posexplode(cellScores(col("v"))))
      .select(col("query_id"), col("qv"), col("qn"),
        element_at(cellIds, col("pos").cast("int") + 1).as("cell"), col("col").as("score"))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nProbe)
      .select("query_id", "qv", "qn", "cell")
    val scored = probes.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
      // a vector probed via two cells can't duplicate (cells partition
      // the corpus), so no distinct needed before ranking
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** q69: IVF-PQ approximate nearest neighbors — the memory-bounded
    * 100 TB ANN index (Jégou/Douze/Schmid 2011, "Product Quantization
    * for Nearest Neighbor Search", IEEE TPAMI — the published
    * algorithm behind every large-scale vector index). q46's IVF
    * prunes WORK (probe a few cells); PQ compresses STORAGE: each
    * vector is re-represented as `m` one-byte codes (64 dims × 4 B ≈
    * 256 B → 8 B, 32×), so the scan side of a candidate pass holds
    * codes, not floats — at 10¹¹ vectors that is the difference
    * between an index that fits a cluster's RAM and one that doesn't.
    *
    * Deterministic, training-free quantizers (the q46 convention, so
    * DuckDB replays bit-for-bit): the coarse quantizer is
    * [[seedCentroids]]; the PQ codebook for subspace s is the s-th
    * `dsub`-dim slice of the `ks` lowest-vec_id vectors, code order =
    * vec_id rank. Encoding minimizes reconstruction error per
    * subspace via the dot-only form |c|² − 2·⟨sub,c⟩ (|sub|² is
    * constant per argmin — no per-element subtraction leaves the
    * codegen'd [[graft.functions.Exprs.DotProduct]] loop); ties break
    * toward the smaller code. Raw-vector PQ (not residual-PQ — one
    * fewer moving part; residual encoding composes the same way if
    * recall at tighter radii ever warrants it).
    *
    * Query scoring is ADC (asymmetric distance computation): each
    * query precomputes its 128 subspace-centroid partial dots ONCE
    * into a flat array (the classic distance table — KBs, broadcast),
    * and every candidate's approximate dot is then m array lookups
    * summed in a FIXED left-to-right chain — no per-candidate float
    * vector is ever read. approx_cos = adcΣ / (|q|·√vn2) with vn2 =
    * Σ|c_code|² stamped on the codes at encode time (same lookup
    * chain over a constant table). The top `rerank` by approximate
    * score then re-rank EXACTLY (true cosine against the float
    * vectors — at scale this touches rerank·nQueries vectors, not the
    * corpus), top-k out, q46's output contract.
    *
    * Plan shape: encode = one explode (m subvector rows/vector) ⋈
    * broadcast codebook → min(struct) partial-agg argmin → per-vector
    * code array; candidates = the q46 cell equi-join; scoring = two
    * broadcast joins (ADC, query norms) + a per-row lookup chain;
    * only the rerank survivors touch the float table again.
    *
    * `residual = true` (q70) is the canonical IVF-PQ refinement: the
    * codebook quantizes RESIDUALS v − c(cell) — much smaller vectors
    * than the raw corpus, so the same ks codes carve finer cells and
    * recall rises at identical storage. Everything stays lookups: the
    * encode argmin of |cb|² − 2·⟨v−c, cb⟩ expands to the raw-dot term
    * plus a constant 2·⟨c_sub, cb⟩ cell-table entry (no residual
    * vector is ever built); dot(q, v̂) = dot(q, c) + the SAME
    * query-global ADC sum; |v̂|² = |c|² + 2Σ⟨c_sub, cb⟩ + Σ|cb|² —
    * three table chains. Codebook source = residuals of the ks
    * vectors AFTER the coarse seeds (the seeds' own residuals are
    * zero), assignment replicated driver-side with the same
    * score/tie rule the plan uses. */
  /** Left-fold dot, the driver-side replica of graft_dot / the
    * oracle's explicit term chain — identical accumulation order. */
  private def dotArr(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** The TRAINING-FREE PQ codebook (q69/q70's declared mode): raw
    * mode slices the ks lowest-id vectors; residual mode slices the
    * RESIDUALS (v − assigned centroid) of the next ks vectors — seeds'
    * own residuals are zero, so the band after the coarse seeds is the
    * training-free residual sample. Assignment is replicated
    * driver-side with the same score and tie rule. code = vec_id rank
    * among the source vectors. Also round 0 of [[trainedCodebooks]].
    * Fails loudly when the corpus cannot fill ks codes. */
  private def seedBook(embeddings: DataFrame,
                       cents: Array[(Long, Array[Double])], nCells: Int,
                       m: Int, ks: Int, dsub: Int,
                       residual: Boolean): Seq[(Int, Int, Array[Double])] = {
    val pqSeeds: Seq[(Array[Double], Int)] =
      if (!residual) seedCentroids(embeddings, ks).toSeq.zipWithIndex
        .map { case ((_, v), code) => (v, code) }
      else {
        val raw = embeddings
          .filter(col("vec_id") >= nCells && col("vec_id") < nCells + ks)
          .select(col("vec_id").cast("long"), vecD(col("embedding")))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          .sortBy(_._1)
        require(raw.nonEmpty,
          s"residual codebook needs vectors with vec_id in [$nCells, ${nCells + ks})")
        raw.toSeq.zipWithIndex.map { case ((_, v), code) =>
          // argmax of dot(v,c)/|c|, ties toward the smaller cell id:
          // cents is id-sorted and maxBy keeps the FIRST maximum
          val (_, cvec) = cents.maxBy { case (_, c) =>
            dotArr(v, c) / math.sqrt(dotArr(c, c))
          }
          (v.indices.map(i => v(i) - cvec(i)).toArray, code)
        }
      }
    require(pqSeeds.length == ks,
      s"IVF-PQ codebook needs exactly ks=$ks seed vectors but the corpus " +
        s"yielded ${pqSeeds.length} (residual=$residual needs vec_ids " +
        s"[${if (residual) nCells else 0}, ${if (residual) nCells + ks else ks})); " +
        "shrink ks/nCells or grow the corpus")
    for {
      s <- 0 until m
      (v, code) <- pqSeeds
    } yield (s, code, v.slice(s * dsub, (s + 1) * dsub))
  }

  /** Session-scoped deterministic training cache (r18 verdict #3):
    * at the r18 surface, twelve declared queries each retrained
    * IDENTICAL quantizers on IDENTICAL corpora every chain
    * (q102/q104/q105/q106/q125/q130/q132/q133/q134/s22/s24/s25 —
    * ~60-90 s/chain of redundant deterministic Lloyd rounds).
    * Training is a pure function of (corpus content, geometry,
    * rounds), so sharing is SOUND: the cache key is the corpus
    * content digest (count + order-independent xxhash64 sum — the
    * [[compactAnnIndex]] sig() discipline) crossed with every
    * training parameter, and a hit returns bit-identical arrays.
    * This is also the production shape — train once, serve
    * everywhere (the Faiss train/add contract q132 models). Scope is
    * the JVM session (Verify/Bench/tests): each declared query stays
    * self-contained for the DuckDB oracle, which replays training
    * in-SQL regardless. Entries are KB-scale driver arrays (the q46
    * collect rationale), bounded by the distinct (corpus, geometry)
    * pairs a session touches. `SPARK_GRAFT_NO_TRAIN_CACHE=1`
    * bypasses it (A/B probes of the un-cached cost). */
  private val trainCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private def cachedTrain[T <: AnyRef](key: String)(train: => T): T =
    if (sys.env.get("SPARK_GRAFT_NO_TRAIN_CACHE").contains("1")) train
    else trainCache.computeIfAbsent(key, _ => train).asInstanceOf[T]

  /** Deterministic content digest of a training corpus: row count +
    * an order-independent sum of per-row xxhash64 over (vec_id, v).
    * One scan with partial aggs, no shuffle beyond the final combine
    * — metadata-weight next to even a single Lloyd round, and two
    * frames with equal content digest equal (up to xxhash collision)
    * regardless of how they were computed. */
  /** `digestHint` (r19): [[writeAnnIndex]]/[[rotateAnnIndex]] train
    * BOTH quantizers on the SAME corpus, and each cachedTrain key used
    * to recompute this digest — two identical full-corpus scans per
    * artifact build across the nine index-lifecycle queries. The
    * caller computes the digest once and passes it down; the contract
    * is strict: the hint MUST be [[corpusDigest]] of the same frame
    * (a wrong hint aliases cache entries and serves wrong quantizers),
    * so only the artifact builders that own both train calls use it. */
  private def corpusDigest(embeddings: DataFrame): String = {
    val r = prepared(embeddings).select(col("vec_id"), col("v"))
      .agg(count(lit(1)),
        expr("sum(cast(xxhash64(vec_id, v) as decimal(38,0)))")).head()
    val n = r.getLong(0)
    val h = if (r.isNullAt(1)) "0" else r.getDecimal(1).toBigInteger.toString
    s"$n:$h"
  }

  /** q94: LLOYD-TRAINED PQ codebooks — the round-12 verdict's recall
    * lever made first-class: q65's fixed-point k-means machinery
    * applied PER SUBVECTOR SPACE (m small k-means problems over the
    * corpus sub-vectors, each codebook KB-scale), exactly how the
    * public PQ literature (Jégou et al. 2011, "Product Quantization
    * for Nearest Neighbor Search") and Faiss train their fine
    * quantizers. Seeds = [[seedBook]] (so round 0 IS the q69/q70
    * declared codebook — training strictly refines the training-free
    * path), assignment = the encode argmin VERBATIM (err = |cb|² −
    * 2⟨sub, cb⟩, ties toward the smaller code), update = member means
    * in the same 2²⁰ fixed-point arithmetic as [[trainedCentroids]] —
    * every round order-independent and engine-replicable, so the
    * DuckDB oracle unrolls the identical rounds (q83's convention). A
    * code that loses all members KEEPS its previous centroid (PQ's
    * flat (s, code) stride cannot drop codes the way q65 drops cells;
    * carrying the old centroid is deterministic and what Faiss does).
    *
    * Shape per round: ONE job — scan → explode to (vec_id, s, sub) →
    * broadcast m·ks codebook join → argmin partial agg keyed
    * (vec_id, s) → posexplode partial agg → collect of m·ks·dsub
    * fixed-point sums (kilobytes — the q46 collect rationale).
    * Residual mode trains over residual sub-vectors (v − assigned
    * coarse centroid, computed in-plan from the broadcast centroid
    * frame — the training analogue of q70's ccf trick).
    *
    * Output feeds [[annIvfPq]]'s `codebook:` override — the fine-
    * quantizer mirror of `centroids:`/[[trainedCentroids]]. */
  def trainedCodebooks(embeddings: DataFrame, nCells: Int = 16,
                       m: Int = 8, ks: Int = 16, rounds: Int = 2,
                       residual: Boolean = false,
                       centroids: Option[Array[(Long, Array[Double])]] = None,
                       digestHint: Option[String] = None)
      : Array[(Int, Int, Array[Double])] =
    cachedTrain("book:" + digestHint.getOrElse(corpusDigest(embeddings)) +
        s":$nCells:$m:$ks:$rounds:$residual:" +
        centroids.map(centStamp).getOrElse("seed")) {
      trainCodebooksNow(embeddings, nCells, m, ks, rounds, residual, centroids)
    }

  private def trainCodebooksNow(embeddings: DataFrame, nCells: Int,
                                m: Int, ks: Int, rounds: Int,
                                residual: Boolean,
                                centroids: Option[Array[(Long, Array[Double])]])
      : Array[(Int, Int, Array[Double])] = {
    require(rounds >= 0, "rounds must be >= 0")
    val dim = 64
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val scale = 1L << 20
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents = resolvedCentroids(embeddings, nCells, centroids)
    val e = prepared(embeddings)
    val sIdx = array((0 until m).map(lit): _*)
    // training rows: (vec_id, s, sub) — residual subs are round-
    // invariant, so they are derived once outside the loop
    val subBase = {
      val flat = e.select(col("vec_id"), explode(sIdx).as("s"), col("v"))
        .withColumn("sub", slice(col("v"), col("s") * dsub + 1, lit(dsub)))
      if (!residual) flat.select("vec_id", "s", "sub")
      else {
        val cellSubs = broadcast(cents.toSeq.flatMap { case (cellId, cvec) =>
          (0 until m).map(s =>
            (cellId, s, cvec.slice(s * dsub, (s + 1) * dsub)))
        }.toDF("cell", "s", "csub"))
        assignCellsFull(e, cents)
          .select(col("vec_id"), col("cell"), explode(sIdx).as("s"), col("v"))
          .withColumn("rawsub", slice(col("v"), col("s") * dsub + 1, lit(dsub)))
          .join(cellSubs, Seq("cell", "s"))
          .withColumn("sub", zip_with(col("rawsub"), col("csub"), _ - _))
          .select("vec_id", "s", "sub")
      }
    }
    var book: Seq[(Int, Int, Array[Double])] =
      seedBook(embeddings, cents, nCells, m, ks, dsub, residual)
    var r = 0
    while (r < rounds) {
      val bookDf = broadcast(book.map { case (s, code, cv) =>
        (s, code, cv, cv.foldLeft(0.0)((a, x) => a + x * x))
      }.toDF("s", "code", "cv", "c2"))
      // (err, code) is unique per (vec_id, s) — sub rides as payload,
      // never compared (trainedCentroids' struct convention)
      val sums = subBase
        .join(bookDf, Seq("s"))
        .withColumn("err",
          col("c2") - lit(2.0) * Exprs.dot(col("sub"), col("cv")))
        .groupBy(col("vec_id"), col("s"))
        .agg(min(struct(col("err"), col("code"), col("sub"))).as("b"))
        .select(col("s"), col("b.code").as("code"), posexplode(col("b.sub")))
        .groupBy(col("s"), col("code"), col("pos"))
        .agg(sum(floor(col("col") * scale + lit(0.5)).cast("long")).as("fs"),
          count(lit(1)).as("c"))
        .collect()
      // same arithmetic as trainedCentroids: CAST(fs AS DOUBLE) /
      // (1048576.0 * c) — exact integer inputs, one IEEE division
      val updated = sums.groupBy(row => (row.getInt(0), row.getInt(1)))
        .map { case ((s, code), rows) =>
          val arr = new Array[Double](dsub)
          rows.foreach { row =>
            arr(row.getInt(2)) =
              row.getLong(3).toDouble / (scale.toDouble * row.getLong(4))
          }
          (s, code) -> arr
        }
      book = book.map { case (s, code, cv) =>
        (s, code, updated.getOrElse((s, code), cv)) // empty code: keep
      }
      r += 1
    }
    book.toArray
  }

  def annIvfPq(embeddings: DataFrame, nCells: Int = 16, nProbe: Int = 4,
               nQueries: Int = 10, k: Int = 5, m: Int = 8, ks: Int = 16,
               rerank: Int = 32, residual: Boolean = false,
               centroids: Option[Array[(Long, Array[Double])]] = None,
               codebook: Option[Array[(Int, Int, Array[Double])]] = None): DataFrame = {
    val dim = 64
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val cents = resolvedCentroids(embeddings, nCells, centroids)
    val e = prepared(embeddings)

    // PQ codebook: (s, code, slice, |c|²) — KBs, like the coarse
    // centroids. Default = the deterministic training-free seeds
    // ([[seedBook]] — the oracle-replayed mode); `codebook` override =
    // a caller-TRAINED table ([[trainedCodebooks]]'s output), the q46
    // `centroids:` convention applied to the fine quantizer. Either
    // way the flat (s, code) tables below stride by ks — a malformed
    // book would make lookupSum's element_at index past the array:
    // ANSI error at best, silent NULL scores (wrong neighbors) with
    // ANSI off. Fail at build time instead.
    val bookRaw: Seq[(Int, Int, Array[Double])] = codebook match {
      case Some(cb) =>
        require(cb.length == m * ks,
          s"codebook override must have exactly m*ks=${m * ks} entries, got ${cb.length}")
        require(cb.forall(_._3.length == dsub),
          s"codebook override sub-vectors must have dim/m=$dsub dims")
        require((0 until m).forall(s =>
          cb.filter(_._1 == s).map(_._2).sorted.sameElements(0 until ks)),
          s"codebook override must carry codes 0..${ks - 1} for every subspace 0..${m - 1}")
        cb.toSeq
      case None => seedBook(embeddings, cents, nCells, m, ks, dsub, residual)
    }
    val book: Seq[(Int, Int, Array[Double], Double)] =
      bookRaw.map { case (s, code, cv) =>
        (s, code, cv, cv.foldLeft(0.0)((a, x) => a + x * x))
      }
    // residual mode's constant cell table built ONCE and shared by
    // both halves (r17 ADVICE: encode and search each built their own
    // identical copy — one relation guarantees broadcast reuse)
    val cellTab =
      if (residual) Some(pqCellTable(cents, book, dsub, e.sparkSession))
      else None
    val codes = pqEncode(e, cents, book, m, ks, dsub, residual,
      cellTable = cellTab)
    pqSearch(codes, e, cents, book, m, ks, dsub, residual,
      nQueries, k, nProbe, rerank, pruneAtScan = false,
      cellTable = cellTab)
  }

  /** Σ_s arr[s·ks + codes[s] + 1] as a FIXED left-assoc chain — the
    * same 8-term sum the oracle writes, bit-stable by construction.
    * Shared by the encode (|v̂|² stamps) and the search (ADC sums). */
  private def pqLookupSum(arr: Column, codesCol: Column,
                          m: Int, ks: Int): Column =
    (0 until m).map(s =>
      element_at(arr, lit(s * ks + 1) + element_at(codesCol, s + 1)))
      .reduce(_ + _)

  /** Residual mode's constant cell table: ccf = the (s, code)-flat
    * dots of each cell centroid's slices against the codebook
    * (corrects both the encode argmin and |v̂|²), c2c = |c_cell|². */
  private def pqCellTable(cents: Array[(Long, Array[Double])],
                          book: Seq[(Int, Int, Array[Double], Double)],
                          dsub: Int, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    broadcast(cents.toSeq.map { case (cellId, cvec) =>
      val flat = book.sortBy(b => (b._1, b._2)).map { case (s, _, cb, _) =>
        dotArr(cvec.slice(s * dsub, (s + 1) * dsub), cb)
      }.toArray
      (cellId, flat, dotArr(cvec, cvec))
    }.toDF("cell", "ccf", "c2c"))
  }

  /** The PQ ENCODE half of [[annIvfPq]] — (vec_id, cell, codes, vn2)
    * from the prepared corpus. Factored out so the persisted-index
    * build (q130's [[writeAnnIndex]]) writes EXACTLY the codes the
    * in-plan search computes — sharing the code is what makes the
    * q130 ≡ q105 row-identity a structural guarantee, not a test
    * coincidence. */
  private[operators] def pqEncode(e: DataFrame,
      cents: Array[(Long, Array[Double])],
      book: Seq[(Int, Int, Array[Double], Double)],
      m: Int, ks: Int, dsub: Int, residual: Boolean,
      withError: Boolean = false,
      cellTable: Option[DataFrame] = None): DataFrame = {
    // r19 (guide §2.4/§4): the encode is ONE native per-row kernel
    // ([[graft.functions.Exprs.PqEncodeVec]]) riding the scan — a
    // ZERO-SHUFFLE map. The previous `functions._` composition
    // (assignCellsFull → explode to m subspaces → broadcast-join the
    // m·ks codebook → min(struct) partial agg keyed (vec_id, cell))
    // materialized m·ks = 128 scored rows per vector and paid one
    // Exchange of aggregation buffers per corpus encode, in every one
    // of the seventeen ANN-family queries that encode. The kernel
    // reproduces the exact same arithmetic (argmax/argmin tie-breaks,
    // left-assoc dot and sum chains — the bit-stability contract is
    // spelled out at the expression) so every consumer, and the
    // DuckDB oracle replay, sees identical bits; SimilaritySpec's
    // recall/identity suites and the 172-query oracle gate pin it.
    // `cellTable` stays in the signature for the SEARCH half's callers
    // (pqSearch still broadcasts the cell table for probes); the
    // encode itself now carries the cell constants in the expression.
    val _ = cellTable // encode no longer consumes the broadcast table
    val sortedBook = book.sortBy(b => (b._1, b._2))
    val bookCv = sortedBook.map(_._3).toArray
    val bookC2 = sortedBook.map(_._4).toArray
    val sortedCents = cents.sortBy(_._1)
    val cellIds = sortedCents.map(_._1)
    val centVecs = sortedCents.map(_._2)
    val cnorms = centVecs.map(c => math.sqrt(dotArr(c, c)))
    val c2cArr = centVecs.map(c => dotArr(c, c))
    // per-cell (s, code)-flat ⟨c_sub, cb⟩ — pqCellTable's rows as
    // kernel constants, computed with the same ascending-index dotArr
    val ccfArr: Array[Array[Double]] =
      if (!residual) Array.empty
      else centVecs.map { cv =>
        sortedBook.map { case (s, _, cb, _) =>
          dotArr(cv.slice(s * dsub, (s + 1) * dsub), cb)
        }.toArray
      }
    val enc = Exprs.pqEncodeVec(col("v"), cellIds, centVecs, cnorms,
      c2cArr, bookCv, bookC2, ccfArr, m, ks, dsub, residual, withError)
    val outCols = Seq(col("vec_id"), col("_enc.cell").as("cell"),
      col("_enc.codes").as("codes"), col("_enc.vn2").as("vn2")) ++
      (if (withError) Seq(col("_enc.qerr").as("qerr")) else Nil)
    e.select(col("vec_id"), enc.as("_enc")).select(outCols: _*)
  }

  /** The PQ SEARCH half of [[annIvfPq]] — probes, ADC scoring over a
    * codes frame, exact re-rank against the float store `e`. With
    * `pruneAtScan` the distinct probed cells are collected first
    * (≤ nQueries·nProbe longs — index-metadata weight, the q129
    * shard-probe convention) and pushed into the codes frame as an
    * `isin` filter, so a PARQUET-BACKED cell-partitioned codes table
    * prunes unprobed cells at the scan (partition pruning, spec-
    * pinned) — the distributed analogue of reading only the probed
    * inverted lists. The in-plan path skips the collect: its codes
    * frame is not a scan, so there is nothing to prune. */
  private[operators] def pqSearch(codes: DataFrame, e: DataFrame,
      cents: Array[(Long, Array[Double])],
      book: Seq[(Int, Int, Array[Double], Double)],
      m: Int, ks: Int, dsub: Int, residual: Boolean,
      nQueries: Int, k: Int, nProbe: Int, rerank: Int,
      pruneAtScan: Boolean,
      queriesOverride: Option[DataFrame] = None,
      cellTable: Option[DataFrame] = None,
      candFilter: Option[Column] = None): DataFrame = {
    val spark = e.sparkSession
    val cellIds = lit(cents.map(_._1))
    lazy val ccDf = cellTable.getOrElse(pqCellTable(cents, book, dsub, spark))
    // queries: probe list (q46's shape) + the ADC distance table.
    // Default = the corpus-member convention (nQueries lowest ids);
    // queriesOverride = an EXTERNAL prepared (vec_id, v, nrm) frame —
    // the streaming serve's shape (s22), same arithmetic verbatim
    val queries = queriesOverride
      .getOrElse(e.filter(col("vec_id") < nQueries))
    val wq = Window.partitionBy("query_id").orderBy(col("score").desc, col("cell"))
    // residual mode carries the raw query·centroid dot per probed
    // cell (score·|c| — the oracle writes the same re-multiplication)
    // because dot(q, v̂) = dot(q, c) + Σ adc lookups
    val probes0 = queries
      .select(col("vec_id").as("query_id"), posexplode(seedCellScores(cents)(col("v"))))
      .select(col("query_id"),
        element_at(cellIds, col("pos").cast("int") + 1).as("cell"), col("col").as("score"))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nProbe)
    val probes =
      if (!residual) probes0.select("query_id", "cell")
      else probes0.join(ccDf, Seq("cell"))
        .select(col("query_id"), col("cell"),
          (col("score") * sqrt(col("c2c"))).as("qcdot"))
    val adc = queries.select(col("vec_id").as("query_id"), col("nrm").as("qn"),
      array(book.sortBy(b => (b._1, b._2)).map { case (s, _, cv, _) =>
        Exprs.dot(slice(col("v"), s * dsub + 1, dsub), lit(cv))
      }: _*).as("adc"))
    val candCodes0 =
      if (!pruneAtScan) codes
      else {
        val probed = probes0.select("cell").distinct()
          .collect().map(_.getLong(0)).toSeq
        // prune on the PARTITION column when the frame carries one
        // (the artifact's _p_cell — q129's _p_shard convention); the
        // cast-and-isin shape is what FileSourceScanExec's partition
        // pruning consumes (selectedPartitions, spec-proven on q129)
        val pc = if (codes.columns.contains("_p_cell"))
          col("_p_cell").cast("long") else col("cell")
        codes.filter(pc.isin(probed: _*))
      }
    // q137: the serve-time candidate predicate sits ON THE CODE SCAN
    // — below ADC, below the rerank cut — composed with the partition
    // pruning above, so a filtered serve reads the probed cells'
    // codes, drops non-matching candidates before any scoring, and
    // never touches the store outside the shortlist re-rank
    val candCodes = candFilter.fold(candCodes0)(candCodes0.filter)

    // approximate scoring: cell equi-join + m lookups per candidate.
    // The probe side (nQueries·nProbe rows carrying the ADC tables) is
    // BROADCAST so the codes table streams through unshuffled — without
    // the hint Spark's unknown-size estimate picks a sort-merge join
    // that exchanges every vector's codes by cell.
    val numerator =
      if (!residual) pqLookupSum(col("adc"), col("codes"), m, ks)
      else col("qcdot") + pqLookupSum(col("adc"), col("codes"), m, ks)
    val approx = candCodes.withColumnRenamed("vec_id", "neighbor_id")
      .join(broadcast(probes.join(broadcast(adc), Seq("query_id"))), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx", numerator / (col("qn") * sqrt(col("vn2"))))
    val wr = Window.partitionBy("query_id").orderBy(col("approx").desc, col("neighbor_id"))
    val short = approx.withColumn("ar", row_number().over(wr))
      .filter(col("ar") <= rerank)
      .select("query_id", "neighbor_id")

    // exact re-rank of the survivors only
    val qv = queries.select(col("vec_id").as("query_id"),
      col("v").as("qv"), col("nrm").as("qn"))
    val nv = e.select(col("vec_id").as("neighbor_id"),
      col("v").as("nv"), col("nrm").as("nn"))
    val wf = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))
    nv.join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos_sim", round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4))
      .withColumn("rank", row_number().over(wf).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** q87: SCALAR-quantized (int8) ANN — the third classic quantizer
    * next to q26's LSH and q69/q70's product quantization: every
    * dimension is affinely mapped to one byte against per-dimension
    * corpus [min, max] bounds (the SQ8 index family of the public ANN
    * literature and the open-source Faiss library), so the candidate
    * scan reads 64 bytes/vector instead of 256 — 4× less memory
    * traffic at IDENTICAL per-dimension resolution, and unlike PQ the
    * codes decode independently per dimension (no codebook lookup
    * chain, no subspace structure to tune).
    *
    * Deterministic end to end (the q46/q69 convention, so DuckDB
    * replays bit-for-bit): bounds are exact min/max partial aggs;
    * code_d = min(floor((v_d − mn_d)/w_d), 255) with w_d =
    * (mx_d − mn_d)/255 (floor, not round — engine-identical), w_d = 0
    * dims code to 0; decode v̂_d = mn_d + code_d·w_d. Query scoring is
    * the ADC analogue: dot(q, v̂) = ⟨q, mn⟩ + Σ (q_d·w_d)·code_d — the
    * query precomputes c0 = ⟨q, mn⟩ and the 64-double table t_d =
    * q_d·w_d ONCE, every candidate costs one codegen'd [[dot]] over
    * its code bytes; |v̂|² is stamped per vector at encode time (q69's
    * vn2 convention). Top `rerank` by approximate cosine re-rank
    * EXACTLY against the float table (only rerank·nQueries rows touch
    * floats), top-k out — q46's output contract.
    *
    * Plan shape: ONE global min/max partial agg → 1-row stats frame
    * broadcast back (never collected — index metadata stays in-plan);
    * encode is a pure per-row map riding the scan; candidates =
    * broadcast queries × code table (the q25 broadcast-NLJ shape over
    * a 4× smaller scan side); rerank survivors join the float table
    * broadcast.
    *
    * `nCells > 0` is the 100 TB composition REALIZED: q46's coarse
    * cells prune WORK (each query ADC-scores only its nProbe probed
    * cells) while the codes prune STORAGE — the IVF-SQ index, the
    * same coarse+fine split q69 builds with a PQ fine quantizer.
    * Cell assignment is the shared q46/q48/q57 quantizer
    * ([[assignCellsFull]], `centroids:` takes q65's trained output),
    * candidates become a cell-keyed equi-join instead of the flat
    * NLJ, and everything downstream (ADC chain, stamped norms, exact
    * re-rank) is byte-identical to the flat path. The declared query
    * stays flat (the oracle mode); the composed mode's recall and
    * exact-cosine contract are spec-pinned. */
  def annSq8(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5,
             rerank: Int = 32, nCells: Int = 0, nProbe: Int = 4,
             centroids: Option[Array[(Long, Array[Double])]] = None): DataFrame = {
    val dim = 64
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val e = prepared(embeddings)
    val aggs = (0 until dim).flatMap(d => Seq(
      min(element_at(col("v"), d + 1)).as(s"mn$d"),
      max(element_at(col("v"), d + 1)).as(s"mx$d")))
    val stats = e.agg(aggs.head, aggs.tail: _*)
      .select(
        array((0 until dim).map(d => col(s"mn$d")): _*).as("mn"),
        array((0 until dim).map(d =>
          (col(s"mx$d") - col(s"mn$d")) / lit(255.0)): _*).as("w"))
    // codes + stamped decoded norm² ride the scan; mn/w stay on the
    // tiny query side only, so candidate rows are codes, not bounds
    val cents =
      if (nCells > 0) resolvedCentroids(embeddings, nCells, centroids)
      else Array.empty[(Long, Array[Double])]
    val base = if (nCells > 0) assignCellsFull(e, cents) else e
    val coded = base.crossJoin(broadcast(stats))
      .withColumn("codes", zip_with(
        zip_with(col("v"), col("mn"), (a, b) => a - b),
        col("w"),
        (x, ww) => when(ww > 0,
          least(floor(x / ww).cast("double"), lit(255.0))).otherwise(lit(0.0))))
      .withColumn("vhat", zip_with(
        zip_with(col("codes"), col("w"), (c, ww) => c * ww),
        col("mn"), (x, m) => m + x))
      .withColumn("vn2", dot(col("vhat"), col("vhat")))
      .select(Seq(col("vec_id").as("neighbor_id"), col("codes"), col("vn2")) ++
        (if (nCells > 0) Seq(col("cell")) else Nil): _*)
    val q = e.filter(col("vec_id") < nQueries).crossJoin(broadcast(stats))
      .select(col("vec_id").as("query_id"),
        col("v").as("qv"), col("nrm").as("qn"),
        dot(col("v"), col("mn")).as("c0"),
        zip_with(col("v"), col("w"), (a, b) => a * b).as("t"))
    val candidates =
      if (nCells == 0)
        coded.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      else {
        // IVF-SQ: each query probes its top-nProbe cells (the q46
        // probe selection — query-side literal scores on nQueries
        // rows), candidates become a cell-keyed equi-join
        val cellIds = lit(cents.map(_._1))
        val wq = Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("cell"))
        val probes = e.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("query_id"),
            posexplode(seedCellScores(cents)(col("v"))))
          .select(col("query_id"),
            element_at(cellIds, col("pos").cast("int") + 1).as("cell"),
            col("col").as("score"))
          .withColumn("pr", row_number().over(wq))
          .filter(col("pr") <= nProbe)
          .select("query_id", "cell")
        coded.join(broadcast(q.join(probes, Seq("query_id"))), Seq("cell"))
          .filter(col("query_id") =!= col("neighbor_id"))
      }
    val scored = candidates
      .withColumn("approx",
        (col("c0") + dot(col("t"), col("codes"))) / (col("qn") * sqrt(col("vn2"))))
    val wr = Window.partitionBy("query_id")
      .orderBy(col("approx").desc, col("neighbor_id"))
    val cand = scored.withColumn("rr", row_number().over(wr))
      .filter(col("rr") <= rerank)
      .select("query_id", "neighbor_id", "qv", "qn")
    val floats = e.select(col("vec_id").as("neighbor_id"),
      col("v").as("cv"), col("nrm").as("cn"))
    val exact = floats.join(broadcast(cand), Seq("neighbor_id"))
      .withColumn("cos_sim",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** q48: one deterministic Lloyd (k-means) refinement step over the
    * embedding corpus — topic/domain clustering, the third leg of the
    * similarity inventory next to near-dup (q24/q34) and ANN
    * (q25/q26/q46). Production pipelines cluster embeddings to balance
    * domain mix and to dedup at cluster granularity; one refinement
    * step is the unit that iterated k-means repeats, and a
    * deterministic single step is what a cross-engine oracle can
    * replicate bit-for-bit.
    *
    * Step 1 seeds the q46 quantizer (lowest-`nCells` vec_ids as
    * centroid literals → per-row argmax, zero shuffle). Step 2
    * recomputes each cell's centroid as the member mean — computed in
    * FIXED-POINT: per-dimension values are scaled by 2^20 and floor-
    * rounded to longs, so the partial-agg sums are exact integers and
    * therefore ORDER-INDEPENDENT (a double sum would make the centroid
    * depend on Spark's partitioning; an integer sum cannot), then one
    * double division recovers the mean. posexplode fans each vector
    * into (cell, dim, q) rows, but map-side partial aggregation
    * collapses every partition to ≤ nCells·dim rows before the
    * shuffle — the wide shuffle never materializes. Step 3 reassigns
    * every vector against the nCells refreshed centroids (broadcast;
    * per-row argmax again, ties toward the smaller cell id).
    *
    * The scaled sums stay exact while cluster_size · 2^20 · max|x|
    * < 2^63 — ~10^12 members per cell at |x| ≤ 4 — and each output
    * value is one integer-derived division + one dot product away from
    * those sums, so DuckDB reproduces every cosine to the last bit. */
  def kmeansRefine(embeddings: DataFrame, nCells: Int = 16): DataFrame = {
    val scale = 1L << 20
    val cents = seedCentroids(embeddings, nCells)
    val cellIds = lit(cents.map(_._1))
    val e = prepared(embeddings)
    val scores = seedCellScores(cents)(col("v"))
    val assigned = e.withColumn("cell0",
      element_at(cellIds, array_position(scores, array_max(scores)).cast("int")))
    // fixed-point per-dimension means; every seed assigns to its own
    // cell (score(v, c) ≤ |v| with equality only at v ∝ c), so no cell
    // is empty and the division is total
    val cents1 = assigned
      .select(col("cell0"), posexplode(col("v")))
      .groupBy(col("cell0"), col("pos"))
      .agg(sum(floor(col("col") * scale + lit(0.5)).cast("long")).as("s"),
        count(lit(1)).as("c"))
      .withColumn("cd", col("s") / (lit(scale.toDouble) * col("c")))
      .groupBy("cell0")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cd")))),
        x => x.getField("cd")).as("cv"))
      .select(col("cell0").as("cell"), col("cv"),
        sqrt(Exprs.dot(col("cv"), col("cv"))).as("cnrm"))
    // per-vector argmax as a partial aggregation (q31's max(struct)
    // shape), not a window: the map side collapses each vector's
    // nCells scored rows to one before the shuffle. Struct comparison
    // is lexicographic — score first, then -cell so equal scores break
    // toward the smaller cell id, matching the oracle's
    // (score DESC, cell) ROW_NUMBER.
    assigned.crossJoin(broadcast(cents1))
      .withColumn("score", dot(col("v"), col("cv")) / col("cnrm"))
      .withColumn("cand", struct(col("score"), (-col("cell")).as("nc"), col("cell"),
        // dot/(nrm·cnrm), NOT score/nrm: (a/b)/c and a/(b·c) differ in
        // the last bit; the oracle writes the dot/(nrm·cnrm) shape
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")), 4).as("cos"),
        (col("cell") =!= col("cell0")).cast("int").as("mv")))
      .groupBy("vec_id")
      .agg(max(col("cand")).as("b"))
      .select(col("vec_id"), col("b.cell").as("cluster_id"),
        col("b.cos").as("cos_sim"), col("b.mv").as("moved"))
  }

  /** Broadcast-ready centroid table: (cell, cv, cnrm). */
  private def centroidFrame(spark: org.apache.spark.sql.SparkSession,
                            cents: Array[(Long, Array[Double])]): DataFrame = {
    import spark.implicits._
    cents.toSeq.toDF("cell", "cv")
      .select(col("cell"), col("cv"),
        sqrt(Exprs.dot(col("cv"), col("cv"))).as("cnrm"))
  }

  /** Every row of `e` scored against every broadcast centroid —
    * score = dot(v, cv)/|cv| (the spherical-quantizer convention).
    * ONE definition shared by the training loop and the final
    * assignment pass, so the last-bit scoring shape cannot diverge
    * between them. */
  private def scoredAgainst(e: DataFrame,
                            cents: Array[(Long, Array[Double])]): DataFrame =
    e.crossJoin(broadcast(centroidFrame(e.sparkSession, cents)))
      .withColumn("score", dot(col("v"), col("cv")) / col("cnrm"))

  /** [[kmeansIterate]]'s training loop exposed as a CENTROID TABLE —
    * the bridge that lets the IVF family ([[annIvf]]/[[annIvfPq]]/
    * [[semanticDedup]]) quantize on TRAINED centroids instead of the
    * deterministic seeds: production builds the index by feeding this
    * output into their `centroids` override, while the declared
    * (oracle-replayed) queries keep the seed default. Cell ids are
    * the seeds' vec_ids and the table always keeps all `nCells`
    * entries: a cell that loses its members KEEPS its previous
    * centroid (the codebook-training convention, adopted r14 — see
    * the keep-on-empty note in the loop); the array is id-sorted,
    * kilobytes of index metadata on the driver — the q46 collect
    * rationale. Same fixed-point arithmetic, same early-exit contract
    * as the q65 scaladoc below. */
  def trainedCentroids(embeddings: DataFrame, nCells: Int = 16,
                       rounds: Int = 3,
                       tol: Double = 0.0,
                       digestHint: Option[String] = None): Array[(Long, Array[Double])] =
    cachedTrain("cents:" + digestHint.getOrElse(corpusDigest(embeddings)) +
        s":$nCells:$rounds:$tol") {
      trainCentroidsNow(embeddings, nCells, rounds, tol)
    }

  private def trainCentroidsNow(embeddings: DataFrame, nCells: Int,
                                rounds: Int,
                                tol: Double): Array[(Long, Array[Double])] = {
    require(rounds >= 1, "rounds must be >= 1")
    val scale = 1L << 20
    val spark = embeddings.sparkSession
    val e = prepared(embeddings).localCheckpoint()
    var cents = seedCentroids(embeddings, nCells)
    var moved = Double.MaxValue
    var r = 0
    while (r < rounds && moved > tol) {
      // Assignment rides [[assignCells]] — the dual-shape argmax
      // whose two-level branch keeps training O(n·2√c) past 256
      // centroids instead of the flat crossJoin's O(n·c): at
      // AutoGeometry c grows with n, so a flat per-round score is
      // O(n²/targetCell) — q104's first 30× probe measured exactly
      // that (second decade 4.8 vs linear 3). Gate geometries stay on
      // the exact literal branch (same argmax, same tie rule — the
      // oracle replays it). Ids join back to the checkpointed frame
      // to pick up v: an n-sized equi-join per round, payloads never
      // fan out through the centroid table.
      val sums = assignCells(e, cents)
        .join(e.select(col("vec_id"), col("v")), Seq("vec_id"))
        .select(col("cell"), posexplode(col("v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(floor(col("col") * scale + lit(0.5)).cast("long")).as("s"),
          count(lit(1)).as("c"))
        .collect()
      // same arithmetic as the in-plan q48 mean: CAST(s AS DOUBLE) /
      // (1048576.0 * c) — exact integer inputs, one IEEE division
      val next = sums.groupBy(_.getLong(0)).toArray.sortBy(_._1).map {
        case (cell, rows) =>
          val arr = new Array[Double](rows.map(_.getInt(1)).max + 1)
          rows.foreach { row =>
            arr(row.getInt(1)) =
              row.getLong(2).toDouble / (scale.toDouble * row.getLong(3))
          }
          (cell, arr)
      }
      // a cell that loses all members KEEPS its previous centroid —
      // the codebook-training convention (LEFT JOIN + COALESCE in the
      // oracle), adopted here in r14: dropping lost cells shrinks k
      // and concentrates the survivors, and the skew decomposition
      // measured the damage on a replica-dense anisotropic corpus
      // (10× bag corpus: 391 seeds → 272 survivors, worst cell 2590
      // seed → 4332 trained-drop — THROUGH the 32× cap; keep-on-empty
      // retains the capacity and a kept direction re-captures members
      // at any later round or at final assignment). Ids never drop,
      // so the early-exit compare is a plain per-id coordinate delta.
      val byCell = next.toMap
      val merged = cents.map { case (cell, old) =>
        (cell, byCell.getOrElse(cell, old))
      }
      moved = merged.zip(cents).iterator.map { case ((_, a), (_, b)) =>
        a.zip(b).map { case (x, y) => math.abs(x - y) }.max
      }.max
      cents = merged
      r += 1
    }
    cents
  }

  /** Persist a trained centroid table ([[trainedCentroids]]'s output)
    * as a parquet artifact — the missing lifecycle half the round-12
    * verdict named: BPE merges (Bpe.writeMerges) and the band index
    * (Dedup.writeBandIndex) both persist with validation stamps;
    * production trains the quantizer ONCE and every later job loads
    * it, so the centroid table needs the same write/read/validate
    * discipline. The `_p_dim` stamp rides every row (the band index's
    * `_p_*` convention): a reader validates the artifact's internal
    * consistency against it, so a truncated or hand-edited file dies
    * at READ, not by silently misquantizing the corpus. */
  def writeCentroids(cents: Array[(Long, Array[Double])],
                     spark: org.apache.spark.sql.SparkSession,
                     path: String): Unit = {
    import spark.implicits._
    require(cents.nonEmpty, "writeCentroids: empty centroid table")
    require(cents.map(_._1).distinct.length == cents.length,
      "writeCentroids: duplicate cell ids")
    require(cents.map(_._2.length).distinct.length == 1,
      "writeCentroids: non-uniform dimension")
    cents.toSeq.map { case (cell, cv) => (cell, cv, cv.length) }
      .toDF("cell", "cv", "_p_dim")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read a persisted centroid table back into the IVF family's
    * `centroids:` override shape. Fail-loud at read ([[Bpe.readMerges]]'s
    * convention): empty, duplicate-cell, dimension-drifted or
    * stamp-inconsistent artifacts all die here with the path in the
    * message. The returned array is id-sorted, so downstream
    * tie-breaks keep the smaller-cell-id convention; the final
    * corpus-dimension check still happens in [[resolvedCentroids]] at
    * use (the artifact cannot know the corpus it will quantize). */
  def readCentroids(spark: org.apache.spark.sql.SparkSession,
                    path: String): Array[(Long, Array[Double])] = {
    val rows = spark.read.parquet(path)
      .select("cell", "cv", "_p_dim")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    require(rows.nonEmpty, s"centroid table at $path is empty")
    require(rows.map(_._3).distinct.length == 1 &&
      rows.forall(t => t._2.length == t._3),
      s"centroid table at $path is corrupt: vector dims " +
        s"${rows.map(_._2.length).distinct.mkString(",")} vs stamp " +
        s"${rows.map(_._3).distinct.mkString(",")}")
    require(rows.map(_._1).distinct.length == rows.length,
      s"centroid table at $path has duplicate cell ids")
    rows.map(t => (t._1, t._2)).sortBy(_._1)
  }

  /** Persist a trained PQ codebook ([[trainedCodebooks]]'s output) —
    * same artifact discipline as [[writeCentroids]], with the PQ
    * geometry (`_p_m`, `_p_ks`, `_p_dsub`) stamped per row so a
    * reader can reject a book trained for a different geometry
    * before [[annIvfPq]] would stride its flat tables wrong. */
  def writeCodebook(book: Array[(Int, Int, Array[Double])],
                    spark: org.apache.spark.sql.SparkSession,
                    path: String): Unit = {
    import spark.implicits._
    require(book.nonEmpty, "writeCodebook: empty codebook")
    val m = book.map(_._1).max + 1
    val ks = book.map(_._2).max + 1
    val dsub = book.head._3.length
    require(book.length == m * ks && (0 until m).forall(s =>
      book.filter(_._1 == s).map(_._2).sorted.sameElements(0 until ks)),
      s"writeCodebook: book must carry codes 0..${ks - 1} for every " +
        s"subspace 0..${m - 1}")
    require(book.forall(_._3.length == dsub),
      "writeCodebook: non-uniform sub-vector dimension")
    book.toSeq.map { case (s, code, cv) => (s, code, cv, m, ks, dsub) }
      .toDF("s", "code", "cv", "_p_m", "_p_ks", "_p_dsub")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read a persisted PQ codebook back into [[annIvfPq]]'s `codebook:`
    * override shape, validating the geometry stamps and full code
    * coverage at read — fail-loud with the path, never a silent
    * mis-stride. */
  def readCodebook(spark: org.apache.spark.sql.SparkSession,
                   path: String,
                   m: Int = 8, ks: Int = 16): Array[(Int, Int, Array[Double])] = {
    val rows = spark.read.parquet(path)
      .select("s", "code", "cv", "_p_m", "_p_ks", "_p_dsub")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray,
        r.getInt(3), r.getInt(4), r.getInt(5)))
    require(rows.nonEmpty, s"codebook at $path is empty")
    val stamps = rows.map(t => (t._4, t._5, t._6)).distinct
    require(stamps.length == 1 && stamps.head._1 == m && stamps.head._2 == ks,
      s"codebook at $path was trained for geometry " +
        s"${stamps.map(t => s"m=${t._1} ks=${t._2}").mkString(",")}, " +
        s"caller expects m=$m ks=$ks")
    require(rows.forall(t => t._3.length == stamps.head._3),
      s"codebook at $path is corrupt: sub-vector dims drift from the " +
        s"_p_dsub=${stamps.head._3} stamp")
    require(rows.length == m * ks && (0 until m).forall(s =>
      rows.filter(_._1 == s).map(_._2).sorted.sameElements(0 until ks)),
      s"codebook at $path is corrupt: does not carry codes 0..${ks - 1} " +
        s"for every subspace 0..${m - 1}")
    rows.map(t => (t._1, t._2, t._3)).sortBy(t => (t._1, t._2))
  }

  /** q130: the PERSISTED trained ANN index — the q129 artifact
    * convention applied to the q102/q105 trained IVF-PQ chain (r16
    * verdict #3): until now the trained index was rebuilt per query;
    * at 100 TB the index is an ARTIFACT — train and encode once,
    * serve every query batch from the persisted codes without ever
    * re-scanning (or re-training on) the corpus.
    *
    * Layout under `path`:
    *  - `centroids/` — the Lloyd-trained coarse quantizer
    *    ([[writeCentroids]], `_p_dim`-stamped).
    *  - `codebook/` — the trained residual PQ codebooks
    *    ([[writeCodebook]], `_p_m/_p_ks/_p_dsub`-stamped).
    *  - `codes/` — (vec_id, cell, codes, vn2) PARTITIONED BY `_p_cell`
    *    (a copy of cell — the q129 `_p_shard` convention, so the data
    *    column keeps its exact LONG type while the partition column
    *    prunes): a serve reads ONLY the cells its queries probe
    *    (partition pruning, spec-pinned) — the distributed analogue
    *    of reading just the probed inverted lists. vn2 is stamped at
    *    encode (q69's convention) so scoring never touches floats.
    *  - `stats/` — one row: geometry + residual-mode stamps and the
    *    CENTROID DIGEST ([[centStamp]], q101's precedent). Codes
    *    encoded under different centroids or a different book
    *    geometry fail LOUD at read — a drifted index would silently
    *    mis-assign probes and fail open.
    *
    * The float vectors for the exact re-rank stay in the CORPUS table
    * (passed to [[annServeIndex]]) — production PQ serving reads the
    * small code table hot and fetches only rerank·nQueries float rows
    * from the cold store, which is the memory story that makes PQ
    * worth persisting at all (Jégou et al. 2011). */
  def writeAnnIndex(embeddings: DataFrame, path: String,
                    nCells: Int = 16, m: Int = 8, ks: Int = 16,
                    centRounds: Int = 2, trainRounds: Int = 2,
                    residual: Boolean = true,
                    encodeOnly: Option[DataFrame] = None): Unit = {
    val dim = 64
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val spark = embeddings.sparkSession
    import spark.implicits._
    ArtifactCache.invalidate(annCacheKey(path)) // rebuild = new state
    // ONE digest for both train-cache keys (see corpusDigest's
    // digestHint contract) — the second full-corpus digest scan per
    // build was pure duplication
    val dig = corpusDigest(embeddings)
    val cents = trainedCentroids(embeddings, nCells = nCells, rounds = centRounds,
      digestHint = Some(dig))
    val book = trainedCodebooks(embeddings, nCells = nCells, m = m, ks = ks,
      rounds = trainRounds, residual = residual, centroids = Some(cents),
      digestHint = Some(dig))
    val bookC2: Seq[(Int, Int, Array[Double], Double)] =
      book.toSeq.map { case (s, code, cv) =>
        (s, code, cv, cv.foldLeft(0.0)((a, x) => a + x * x))
      }
    // `encodeOnly` splits TRAIN from ADD (q132 — the production PQ
    // lifecycle of the public Faiss API: train() on a representative
    // snapshot once, add() batches forever): quantizers always train
    // on `embeddings`, but only this subset's codes are written —
    // later intake encodes under the SAME frozen quantizers via
    // [[appendAnnIndex]], and codes(base) ∪ codes(intake) equals a
    // full encode EXACTLY because encoding is per-row
    val toEncode = encodeOnly.getOrElse(embeddings)
    // the corpus encode+write is the build's long pole and is
    // independent of the KB-scale centroid/codebook writes and the
    // n_codes count — overlap them (guide §2.6; r20), all awaited
    // before the stats commit point
    val codesF = concurrent.Future {
      pqEncode(prepared(toEncode), cents, bookC2, m, ks, dsub, residual)
        .withColumn("_p_cell", col("cell"))
        .withColumn("_b_epoch", lit(0L))
        .write.mode("overwrite").partitionBy("_p_cell", "_b_epoch")
        .parquet(s"$path/codes")
    }(concurrent.ExecutionContext.global)
    writeCentroids(cents, spark, s"$path/centroids")
    writeCodebook(book, spark, s"$path/codebook")
    // n_codes rides the stats so appends can merge it associatively
    // and a serve never pays a codes count; encoding is 1:1 per
    // vector, so the input count IS the code count
    val nCodes = toEncode.count()
    concurrent.Await.result(codesF, concurrent.duration.Duration.Inf)
    Seq((m, ks, dsub, cents.length, residual, centStamp(cents),
        nCodes, 0L, -1L))
      .toDF("_p_m", "_p_ks", "_p_dsub", "_p_cells", "_p_residual",
        "_p_cent_stamp", "n_codes", "_p_epoch", "_p_batch_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    // stats is the LAST leg = the commit point — install the build's
    // own state so the first read (append or serve) skips revalidating
    // what this build just wrote (the writeBm25Index rule)
    ArtifactCache.install(spark, annCacheKey(path), annFpDirs(path),
      AnnMeta(cents, book.sortBy(t => (t._1, t._2)), m, ks, dsub,
        residual, nCodes, 0L, -1L))
  }

  /** q132: INCREMENTAL ANN index append — q131's intake convention on
    * the semantic leg, and the other half of the Faiss lifecycle
    * [[writeAnnIndex]]'s `encodeOnly` models: the batch encodes under
    * the artifact's FROZEN quantizers (read back stamp-validated —
    * the digest guard makes encoding under drifted centroids
    * impossible) and its codes append cell-partitioned. Nothing else
    * in the artifact is corpus-dependent (stats hold geometry + the
    * digest; vn2 rides each code row), so append needs NO merge step
    * at all — the structural payoff of stamping per-row norms at
    * encode (q69's vn2 convention). append ≡ rebuild EXACTLY because
    * per-row encoding is independent of every other row.
    *
    * Intake contract (q45/q131's): batch vec_ids are NEW — dedup the
    * intake first.
    *
    * Crash safety + replay idempotency ([[graft.operators.Retrieval
    * .appendBm25Index]]'s armor on the semantic leg): the batch's
    * codes append stamped with epoch E+1, then the stats row —
    * n_codes merged associatively, epoch bumped — commits LAST
    * through the crash-safe swap choreography. A crash between the
    * two leaves codes beyond the committed epoch, which
    * [[readAnnIndex]] detects and refuses to serve. `batchId` is the
    * streaming intake's at-least-once fence (s24): a replayed batch
    * is a no-op returning None.
    *
    * Returns the batch's INGEST HEALTH on an applied append — the
    * numbers s24's per-batch meter emits, computed from the SAME
    * pinned encode the write landed (one encode, zero extra
    * shuffles): merged n_codes, the batch's distinct cells touched,
    * and its mean quantization error under the frozen quantizers in
    * 2²⁰ fixed point (q133's exact-integer mean discipline — THE
    * retrain signal a continuous ingest watches). */
  final case class AnnIngestHealth(nCodes: Long, cellsTouched: Long,
                                   meanQerrFp: Long)

  def appendAnnIndex(spark: org.apache.spark.sql.SparkSession,
                     batch: DataFrame, path: String,
                     batchId: Option[Long] = None): Option[AnnIngestHealth] = {
    val idx = readAnnIndex(spark, path)
    if (batchId.exists(_ <= idx.batchId)) return None // at-least-once replay
    require(batch.limit(1).count() > 0,
      "appendAnnIndex: empty intake batch — nothing to append")
    // cache entry dropped BEFORE the first mutating write (the
    // appendBm25Index rule): a crash between the codes append and the
    // stats commit must leave the next read on the torn-state detector
    ArtifactCache.invalidate(annCacheKey(path))
    val bookC2: Seq[(Int, Int, Array[Double], Double)] =
      idx.book.toSeq.map { case (s, code, cv) =>
        (s, code, cv, cv.foldLeft(0.0)((a, x) => a + x * x))
      }
    val newEpoch = idx.epoch + 1L
    // ONE encode serves both the write and the health meter: pinned
    // (localCheckpoint) so the two consumers cannot diverge, with the
    // per-vector quantization error riding along (withError — one
    // extra expression, no extra shuffle)
    val enc = pqEncode(prepared(batch), idx.cents, bookC2,
        idx.m, idx.ks, idx.dsub, idx.residual, withError = true)
      .withColumn("_p_cell", col("cell"))
      .localCheckpoint()
    // the codes append and the health aggregation are independent
    // consumers of the pinned encode, both ahead of the stats commit
    // point — overlap them (guide §2.6; r20), awaited before the swap
    val codesF = concurrent.Future {
      enc.drop("qerr")
        .withColumn("_b_epoch", lit(newEpoch))
        .write.mode("append").partitionBy("_p_cell", "_b_epoch")
        .parquet(s"$path/codes")
    }(concurrent.ExecutionContext.global)
    // per-row fixed point clamped at 0 (here and in the health/drift
    // twins): FP cancellation can make a ~0 qerr minutely negative,
    // and a negative SUM would make Scala Long `/` (truncates) and
    // the oracle's DuckDB `//` (floors) diverge — clamped on BOTH
    // sides, truncation ≡ floor is provable (r18 ADVICE)
    val h = enc.agg(
        count(lit(1)).as("n"),
        countDistinct(col("cell")).as("cells"),
        sum(greatest(floor(col("qerr") * lit(1048576.0) + lit(0.5))
            .cast("long"), lit(0L)))
          .as("sfp")).head()
    concurrent.Await.result(codesF, concurrent.duration.Duration.Inf)
    val nCodes = idx.nCodes + h.getAs[Long]("n")
    import spark.implicits._
    val newStats = Seq((idx.m, idx.ks, idx.dsub, idx.cents.length,
        idx.residual, centStamp(idx.cents), nCodes, newEpoch,
        batchId.getOrElse(idx.batchId)))
      .toDF("_p_m", "_p_ks", "_p_dsub", "_p_cells", "_p_residual",
        "_p_cent_stamp", "n_codes", "_p_epoch", "_p_batch_id")
    Dedup.compactSwap(spark, s"$path/stats", what = "ann stats")(tmp =>
      newStats.coalesce(1).write.mode("overwrite").parquet(tmp)
    ) { tmp =>
      val got = spark.read.parquet(tmp).collect()
      // the batch's codes are already appended at epoch $newEpoch, so
      // failing here leaves the index TORN (readAnnIndex refuses the
      // epoch mismatch) — say so; "live index intact" would mislead
      // an operator about the recovery state (r18 ADVICE, bm25 twin)
      require(got.length == 1 && got.head.getAs[Long]("_p_epoch") == newEpoch,
        s"appendAnnIndex: stats rewrite validation failed — the index " +
          s"is left TORN (codes appended at epoch $newEpoch, stats at " +
          s"${idx.epoch}); readAnnIndex will refuse it. Rebuild, or " +
          "restore the stats __precompact recovery copy and re-run " +
          "the append")
    }
    // commit point passed — install the post-append state (quantizers
    // FROZEN by the append contract, so cents/book carry over)
    ArtifactCache.install(spark, annCacheKey(path), annFpDirs(path),
      AnnMeta(idx.cents, idx.book, idx.m, idx.ks, idx.dsub, idx.residual,
        nCodes, newEpoch, batchId.getOrElse(idx.batchId),
        Some(idx.codes.schema)))
    Some(AnnIngestHealth(nCodes, h.getAs[Long]("cells"),
      h.getAs[Long]("sfp") / h.getAs[Long]("n")))
  }

  /** Read-only recomputation of a batch's ingest-health numbers under
    * an index's frozen quantizers — s24's REPLAY path: when
    * [[appendAnnIndex]] skips an already-applied batch (at-least-once
    * re-delivery), the append's effects are in the index but the
    * health row the crash may have lost still needs emitting; a
    * replay only ever re-delivers the LATEST batch, so the index's
    * merged n_codes is exactly the post-batch value and the batch
    * recomputes its own cells/qerr without touching the artifact. */
  def annIngestHealthOf(idx: AnnIndex, batch: DataFrame): AnnIngestHealth = {
    val bookC2: Seq[(Int, Int, Array[Double], Double)] =
      idx.book.toSeq.map { case (s, code, cv) =>
        (s, code, cv, cv.foldLeft(0.0)((a, x) => a + x * x))
      }
    val h = pqEncode(prepared(batch), idx.cents, bookC2,
        idx.m, idx.ks, idx.dsub, idx.residual, withError = true)
      .agg(count(lit(1)).as("n"),
        countDistinct(col("cell")).as("cells"),
        sum(greatest(floor(col("qerr") * lit(1048576.0) + lit(0.5))
            .cast("long"), lit(0L)))
          .as("sfp")).head()
    AnnIngestHealth(idx.nCodes, h.getAs[Long]("cells"),
      h.getAs[Long]("sfp") / h.getAs[Long]("n"))
  }

  /** q136: RETRAIN-ROTATE — the operator that CONSUMES the alarm the
    * drift reports fire (r18 verdict #4: the lifecycle family had
    * build/serve/append/drift on both legs, but nothing closed the
    * loop): retrain BOTH quantizers over the rotation corpus
    * (geometry preserved from the live stats — same cells/m/ks/
    * residual), re-encode the corpus under them, and ROTATE the
    * artifact IN PLACE through the shared crash-safe
    * rewrite→validate→swap choreography ([[Dedup.compactSwap]]) —
    * codes, then centroids, then codebook, stats LAST. Training is
    * deterministic ([[trainedCentroids]]/[[trainedCodebooks]]), so
    * rotate ≡ a from-scratch [[writeAnnIndex]] over the same corpus
    * EXACTLY (spec-pinned serve-identity); the in-place swap is what
    * production wants — the artifact keeps its path, readers never
    * re-point.
    *
    * Torn-rotate windows all fail LOUD at read, never open: a crash
    * after the codes swap leaves codes at epoch E+1 vs stats at E
    * (readAnnIndex's torn-append detector refuses); after the
    * centroid swap, the stats `_p_cent_stamp` no longer matches the
    * centroid table (the stamp guard refuses); after the codebook
    * swap, same stamp guard. Only the final stats commit makes the
    * rotated index servable. Offline-maintenance contract (the
    * compaction rule): quiesce appends/serves first. */
  def rotateAnnIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String, corpus: DataFrame,
                     centRounds: Int = 2, trainRounds: Int = 2): Unit = {
    val idx = readAnnIndex(spark, path) // stamp-validate before touching anything
    val newEpoch = idx.epoch + 1L
    // one digest for both train keys (writeAnnIndex's r19 convention)
    val dig = corpusDigest(corpus)
    val cents = trainedCentroids(corpus, nCells = idx.cents.length,
      rounds = centRounds, digestHint = Some(dig))
    val book = trainedCodebooks(corpus, nCells = idx.cents.length,
      m = idx.m, ks = idx.ks, rounds = trainRounds,
      residual = idx.residual, centroids = Some(cents),
      digestHint = Some(dig))
    val bookC2: Seq[(Int, Int, Array[Double], Double)] =
      book.toSeq.map { case (s, code, cv) =>
        (s, code, cv, cv.foldLeft(0.0)((a, x) => a + x * x))
      }
    // pinned so the count and the swap write are ONE encode, and so
    // the write cannot re-list the code files its own swap replaces
    val newCodes = pqEncode(prepared(corpus), cents, bookC2,
        idx.m, idx.ks, idx.dsub, idx.residual)
      .withColumn("_p_cell", col("cell"))
      .withColumn("_b_epoch", lit(newEpoch))
      .localCheckpoint()
    val nCodes = newCodes.count()
    // cache entry dropped before the FIRST swap (the append rule): a
    // crash anywhere in the four-swap choreography leaves the next
    // read on the full torn-state detection path
    ArtifactCache.invalidate(annCacheKey(path))
    Dedup.compactSwap(spark, s"$path/codes", what = "ann codes (rotate)")(tmp =>
      newCodes.write.mode("overwrite")
        .partitionBy("_p_cell", "_b_epoch").parquet(tmp)
    ) { tmp =>
      val got = spark.read.parquet(tmp)
        .agg(count(lit(1)), max(col("_b_epoch").cast("long"))).head()
      require(got.getLong(0) == nCodes && got.getLong(1) == newEpoch,
        s"rotateAnnIndex: re-encode validation failed (${got.getLong(0)} " +
          s"codes at epoch ${got.getLong(1)}, expected $nCodes at " +
          s"$newEpoch) — aborting with the live index intact")
    }
    Dedup.compactSwap(spark, s"$path/centroids",
        what = "ann centroids (rotate)")(tmp =>
      writeCentroids(cents, spark, tmp)
    ) { tmp =>
      require(centStamp(readCentroids(spark, tmp)) == centStamp(cents),
        s"rotateAnnIndex: centroid rewrite validation failed — the " +
          s"index is left TORN (codes already rotated to epoch " +
          s"$newEpoch); readAnnIndex will refuse it. Rebuild, or " +
          "restore the __precompact recovery copies")
    }
    Dedup.compactSwap(spark, s"$path/codebook",
        what = "ann codebook (rotate)")(tmp =>
      writeCodebook(book, spark, tmp)
    ) { tmp =>
      val got = readCodebook(spark, tmp, idx.m, idx.ks)
      require(got.length == book.length &&
        got.zip(book.sortBy(t => (t._1, t._2))).forall { case (a, b) =>
          a._1 == b._1 && a._2 == b._2 && a._3.sameElements(b._3) },
        s"rotateAnnIndex: codebook rewrite validation failed — the " +
          s"index is left TORN (codes and centroids already rotated); " +
          "readAnnIndex will refuse it. Rebuild, or restore the " +
          "__precompact recovery copies")
    }
    import spark.implicits._
    val newStats = Seq((idx.m, idx.ks, idx.dsub, cents.length,
        idx.residual, centStamp(cents), nCodes, newEpoch, idx.batchId))
      .toDF("_p_m", "_p_ks", "_p_dsub", "_p_cells", "_p_residual",
        "_p_cent_stamp", "n_codes", "_p_epoch", "_p_batch_id")
    Dedup.compactSwap(spark, s"$path/stats", what = "ann stats (rotate)")(tmp =>
      newStats.coalesce(1).write.mode("overwrite").parquet(tmp)
    ) { tmp =>
      val got = spark.read.parquet(tmp).collect()
      require(got.length == 1 && got.head.getAs[Long]("_p_epoch") == newEpoch,
        s"rotateAnnIndex: stats rewrite validation failed — the index " +
          s"is left TORN at the final commit; readAnnIndex will refuse " +
          "it. Restore the stats __precompact recovery copy to complete " +
          "the rotation")
    }
  }

  /** q133: INDEX DRIFT REPORT — the maintenance signal the frozen-
    * quantizer lifecycle (q130 build / q132 add-forever) needs: when
    * the intake distribution drifts from the training snapshot, the
    * frozen centroids/codebooks quantize new vectors WORSE — recall
    * quietly decays with no error anywhere. The standard production
    * monitor (the "when to retrain" alarm of the public ANN-serving
    * literature) is the QUANTIZATION ERROR |v − v̂|²: this report
    * computes it exactly for a base split and an intake split under
    * the artifact's frozen quantizers and fires a retrain alarm when
    * the intake mean exceeds `alarmPct`% of the base mean.
    *
    * Exactness discipline: the per-vector error decomposes through
    * the encode argmin as |v − c|² + Σ_s err_s (err_s is the key the
    * encode already minimizes), so the report costs one extra
    * expression per vector and NO extra shuffle ([[pqEncode]]'s
    * withError). Per-row errors are IEEE doubles from fixed chains
    * (bit-identical in both engines); the SPLIT MEANS go through the
    * house fixed-point discipline — each error quantized to 2²⁰
    * fixed point (floor(x·2²⁰ + 0.5), exact long), summed (order-
    * independent), mean = sum div n (integer), so the alarm
    * comparison `mean_fp(intake)·100 > mean_fp(base)·alarmPct` is
    * integer-exact at ANY corpus size (no n² cross-product, no float
    * summation order anywhere near the verdict). max is order-
    * independent by definition. */
  def annIndexDrift(index: AnnIndex, base: DataFrame, intake: DataFrame,
                    alarmPct: Int = 120): DataFrame = {
    require(alarmPct > 0, s"alarmPct must be positive, got $alarmPct")
    val bookC2: Seq[(Int, Int, Array[Double], Double)] =
      index.book.toSeq.map { case (s, code, cv) =>
        (s, code, cv, cv.foldLeft(0.0)((a, x) => a + x * x))
      }
    val cellTab =
      if (index.residual)
        Some(pqCellTable(index.cents, bookC2, index.dsub, base.sparkSession))
      else None
    def enc(df: DataFrame, split: String): DataFrame =
      pqEncode(prepared(df), index.cents, bookC2,
        index.m, index.ks, index.dsub, index.residual, withError = true,
        cellTable = cellTab)
        .select(lit(split).as("split"), col("qerr"))
    val qe = enc(base, "base").unionByName(enc(intake, "intake"))
    val ag = qe.groupBy("split").agg(
        count(lit(1)).as("n_vecs"),
        sum(greatest(floor(col("qerr") * lit(1048576.0) + lit(0.5))
            .cast("long"), lit(0L))).as("sfp"),
        max(col("qerr")).as("mx"))
      .withColumn("mfp", expr("sfp div n_vecs"))
    // the alarm is ONE integer comparison over the two split means —
    // computed by a GLOBAL WINDOW over the 2-row grouped frame (q78's
    // totals convention): an `ag.agg → crossJoin(ag)` diamond would
    // re-run the whole encode subtree (pqEncode of base AND intake —
    // the dominant cost) a second time, doubling the monitor's corpus
    // encode at any scale (r17 plan audit: scan=4 where this shape
    // gives scan=2)
    val all = Window.partitionBy()
    ag.withColumn("im",
        max(when(col("split") === "intake", col("mfp"))).over(all))
      .withColumn("bm",
        max(when(col("split") === "base", col("mfp"))).over(all))
      .select(col("split"), col("n_vecs"),
        graft.Exact.dround(col("mfp").cast("double") / lit(1048576.0))
          .as("mean_qerr"),
        graft.Exact.dround(col("mx")).as("max_qerr"),
        (col("im") * lit(100L) > col("bm") * lit(alarmPct.toLong))
          .as("retrain_alarm"))
  }

  /** Validated handle on a persisted ANN index: centroids + codebook
    * re-validated through their own readers, codes left as a LAZY
    * cell-partitioned frame (the serve prunes it at the scan).
    * `nCodes` is the stats-carried code count (appends merge it
    * associatively — a serve never counts the codes); `epoch` is the
    * mutation counter and `batchId` the last applied streaming batch
    * (s24's replay fence; -1 = none) — the BM25 index's armor
    * mirrored onto the semantic leg. */
  final case class AnnIndex(cents: Array[(Long, Array[Double])],
                            book: Array[(Int, Int, Array[Double])],
                            codes: DataFrame,
                            m: Int, ks: Int, dsub: Int, residual: Boolean,
                            nCodes: Long, epoch: Long, batchId: Long)

  /** The validated state a [[readAnnIndex]] collects — the
    * [[ArtifactCache]] payload (KB-scale quantizer arrays + scalars;
    * the codes frame is re-created from parquet on every read). */
  private final case class AnnMeta(cents: Array[(Long, Array[Double])],
      book: Array[(Int, Int, Array[Double])],
      m: Int, ks: Int, dsub: Int,
      residual: Boolean, nCodes: Long,
      epoch: Long, batchId: Long,
      codesSchema: Option[org.apache.spark.sql.types.StructType] = None)
  private def annCacheKey(path: String) = s"ann:$path"
  private def annFpDirs(path: String) =
    Seq(s"$path/stats", s"$path/centroids", s"$path/codebook")

  def readAnnIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String, m: Int = 8, ks: Int = 16): AnnIndex = {
    // r20 (verdict #2a/#6): one full stamp/digest/torn-state validation
    // per committed artifact state per JVM (the readBm25Index rule on
    // the semantic leg) — a cold read pays stats collect + centroid and
    // codebook collects + digest + the codes epoch aggregation; the
    // intake loop (s24) and the build→append→serve chains re-read per
    // batch/phase. The caller-geometry check stays on the hit path.
    val cachedAnn = ArtifactCache.lookup[AnnMeta](spark, annCacheKey(path),
      annFpDirs(path))
    // torn-append detector on the hit path: the codes leg is not
    // fingerprinted, but orphan codes land under a fresh _b_epoch=E+1
    // directory — a driver-side walk sees them; disagreement falls
    // through to the full validation's loud torn-state failure
    if (cachedAnn.isDefined &&
        ArtifactCache.maxEpochDir(spark, s"$path/codes")
          .contains(cachedAnn.get.epoch)) {
      val c = cachedAnn.get
      require(c.m == m && c.ks == ks,
        s"ann index at $path was encoded at m=${c.m} ks=${c.ks}, caller " +
          s"serves at m=$m ks=$ks — the flat ADC tables would " +
          "mis-stride; rebuild the index")
      val codes = c.codesSchema.fold(spark.read)(spark.read.schema)
        .parquet(s"$path/codes")
      if (c.codesSchema.isEmpty) // upgrade: next hit skips inference
        ArtifactCache.install(spark, annCacheKey(path), annFpDirs(path),
          c.copy(codesSchema = Some(codes.schema)))
      return AnnIndex(c.cents, c.book, codes,
        c.m, c.ks, c.dsub, c.residual, c.nCodes, c.epoch, c.batchId)
    }
    val stats = spark.read.parquet(s"$path/stats").collect()
    require(stats.length == 1,
      s"ann index at $path: stats must be ONE row, got ${stats.length}")
    val st = stats.head
    require(st.getAs[Int]("_p_m") == m && st.getAs[Int]("_p_ks") == ks,
      s"ann index at $path was encoded at m=${st.getAs[Int]("_p_m")} " +
        s"ks=${st.getAs[Int]("_p_ks")}, caller serves at m=$m ks=$ks — " +
        "the flat ADC tables would mis-stride; rebuild the index")
    val cents = readCentroids(spark, s"$path/centroids")
    require(st.getAs[Int]("_p_cells") == cents.length,
      s"ann index at $path: stats stamp ${st.getAs[Int]("_p_cells")} cells " +
        s"but the centroid table holds ${cents.length}")
    // the load-bearing consistency check: the CODES were encoded
    // against exactly these centroids — a swapped/retrained centroid
    // table would route probes into cells whose codes mean something
    // else (fails open: silently wrong neighbors)
    require(st.getAs[String]("_p_cent_stamp") == centStamp(cents),
      s"ann index at $path: centroid table does not match the digest " +
        "the codes were encoded under — rebuild the index (a probe " +
        "against drifted centroids silently mis-ranks)")
    val book = readCodebook(spark, s"$path/codebook", m, ks)
    val dsub = st.getAs[Int]("_p_dsub")
    require(book.head._3.length == dsub,
      s"ann index at $path: codebook sub-dim ${book.head._3.length} vs " +
        s"stats stamp $dsub")
    val codes = spark.read.parquet(s"$path/codes")
    require(Set("vec_id", "cell", "codes", "vn2", "_p_cell", "_b_epoch")
      .subsetOf(codes.columns.toSet),
      s"ann index at $path: codes lack expected columns, got " +
        codes.columns.mkString(", "))
    // torn-append detector ([[graft.operators.Retrieval.readBm25Index]]'s
    // convention): codes beyond the committed stats epoch mean an
    // append crashed between the codes write and the stats commit —
    // refuse to serve a partially-landed batch. _b_epoch is a
    // PARTITION column, so the probe is directory-listing weight.
    val epoch = st.getAs[Long]("_p_epoch")
    val maxBe = codes.agg(max(col("_b_epoch").cast("long"))).head().getLong(0)
    require(maxBe == epoch,
      s"ann index at $path is TORN: codes carry epoch $maxBe but stats " +
        s"committed epoch $epoch — an append crashed before its commit; " +
        "re-run the intake after a rebuild, or restore the __precompact " +
        "recovery copy")
    val idx = AnnIndex(cents, book, codes, m, ks, dsub,
      st.getAs[Boolean]("_p_residual"),
      st.getAs[Long]("n_codes"), epoch, st.getAs[Long]("_p_batch_id"))
    ArtifactCache.install(spark, annCacheKey(path), annFpDirs(path),
      AnnMeta(cents, book, m, ks, dsub, idx.residual, idx.nCodes,
        idx.epoch, idx.batchId, Some(codes.schema)))
    idx
  }

  /** Codes compaction — [[graft.operators.Retrieval.compactBm25Index]]'s
    * sibling on the ANN artifact: every [[appendAnnIndex]] adds one
    * parquet file per touched cell, so after N intake batches a
    * serve's pruned cell read opens O(N) small files. Rewrite the
    * codes coalesced per cell (repartition by the existing partition
    * column — no new shuffle key), vec_id-clustered within each cell,
    * through the shared crash-safe rewrite→validate→swap choreography
    * ([[Dedup.compactSwap]]) with the content-signature check (count +
    * order-free decimal xxhash64 sum — aborts loudly, live tree
    * untouched). Centroids/codebook/stats never accumulate (one write
    * each), so codes are the only leg that needs this. Offline-
    * maintenance contract: quiesce appends/serves first. Returns
    * (files_before, files_after). */
  def compactAnnIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String,
                      maxRecordsPerFile: Long = 0L): (Long, Long) = {
    // stamp-validate before touching anything; the epoch cross-check
    // also guarantees no orphan codes ride into the rewrite
    val idx = readAnnIndex(spark, path)
    // the codes leg is NOT fingerprinted (stats/centroids/codebook are
    // the commit legs), so its rewrite must drop the entry itself
    ArtifactCache.invalidate(annCacheKey(path))
    val codes = spark.read.parquet(s"$path/codes")
      .select("vec_id", "cell", "codes", "vn2", "_p_cell")
    def sig(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        expr(s"sum(cast(xxhash64(${df.columns.map(c => s"`$c`").mkString(", ")}) " +
          "as decimal(38,0)))")).head()
      (r.getLong(0),
        if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
    }
    val want = sig(codes)
    // epochs collapse to the committed one (the BM25 compaction's
    // rule): preserving them would keep O(appends) files per cell,
    // defeating the compaction
    Dedup.compactSwap(spark, s"$path/codes", what = "ann codes")(tmp =>
      codes
        .repartition(col("_p_cell"))
        .sortWithinPartitions("vec_id")
        .withColumn("_b_epoch", lit(idx.epoch))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .partitionBy("_p_cell", "_b_epoch").parquet(tmp)
    ) { tmp =>
      val got = sig(spark.read.parquet(tmp)
        .select("vec_id", "cell", "codes", "vn2", "_p_cell"))
      require(got == want,
        s"compaction of $path/codes would change content ((rows, " +
          s"checksum) $want -> $got) — aborting with the live index untouched")
    }
  }

  /** Serve a query set against a persisted index: probes from the
    * artifact's centroids, ADC over the artifact's codes (only the
    * probed cells' partitions are READ — [[pqSearch]]'s pruneAtScan),
    * exact re-rank against the float store `embeddings`. The declared
    * q130 serves q105's configuration (nProbe=8, rerank=64) over the
    * q102-trained artifact and is row-identical to q105 — shared
    * oracle, the q126/q129 identity convention, driver-hash-checked
    * every round. */
  def annServeIndex(index: AnnIndex, embeddings: DataFrame,
                    nQueries: Int = 10, k: Int = 5,
                    nProbe: Int = 8, rerank: Int = 64,
                    queries: Option[DataFrame] = None,
                    knownCorpusDim: Option[Int] = None): DataFrame = {
    // index-internal geometry is free to check (the stamps carry it):
    // centroid dim MUST equal m·dsub or the PQ slices mis-stride
    require(index.cents.head._2.length == index.m * index.dsub,
      s"ann index geometry is inconsistent: centroid dim " +
        s"${index.cents.head._2.length} != m*dsub = " +
        s"${index.m * index.dsub} — the artifact is corrupt")
    // corpus-vs-index dimension check (graft_dot min-truncates, so a
    // mismatch would fail OPEN): one first() job per STORE, not per
    // call — a serving loop (s22) validates the store once at stream
    // start and passes the dim down (r17 ADVICE: this job was running
    // per micro-batch on the serving hot path)
    val corpusDim = knownCorpusDim.getOrElse(
      embeddings.select(size(vecD(col("embedding")))).first().getInt(0))
    require(index.cents.head._2.length == corpusDim,
      s"ann index dimension ${index.cents.head._2.length} does not " +
        s"match the corpus embedding dimension $corpusDim")
    val bookC2: Seq[(Int, Int, Array[Double], Double)] =
      index.book.toSeq.map { case (s, code, cv) =>
        (s, code, cv, cv.foldLeft(0.0)((a, x) => a + x * x))
      }
    // `queries` = an EXTERNAL (vec_id, embedding) query frame (the s22
    // streaming batch shape); default = the corpus-member convention
    pqSearch(index.codes, prepared(embeddings), index.cents, bookC2,
      index.m, index.ks, index.dsub, index.residual,
      nQueries, k, nProbe, rerank, pruneAtScan = true,
      queriesOverride = queries.map(prepared))
  }

  /** q137: FILTERED ANN SERVING — top-k WITHIN a predicate, how every
    * production vector store actually serves (lang = X, source = Y,
    * date range): the same persisted-index serve as [[annServeIndex]]
    * with `pred` applied to the CANDIDATE code rows — on the code
    * scan itself, composed with the probed-cell partition pruning,
    * BELOW the ADC scoring and the rerank cut (plan-pinned in
    * SimilaritySpec). The exact re-rank is unchanged and only ever
    * sees matching survivors, so every returned neighbor satisfies
    * the predicate by construction and per-query cost still scales
    * with nProbe·cell + rerank, corpus-free. `pred` is evaluated
    * against the code-row columns (`vec_id`, and any metadata columns
    * an extended artifact carries).
    *
    * Recall contract, per filter selectivity s: the shortlist is the
    * top-`rerank` ADC candidates AMONG matches in the probed cells,
    * so with the pool shrunk ~s× a fixed rerank covers MORE of the
    * filtered pool (recall@k vs the filtered exact top-k rises
    * toward 1 as s falls) — but matches whose cells the probe never
    * visits stay invisible exactly as in the unfiltered serve; at
    * very low s, raise nProbe, not rerank (the q125 frontier trade
    * restricted to the filtered stratum). A TRUE predicate serves
    * row-identically to [[annServeIndex]] (spec-pinned). */
  def annServeIndexFiltered(index: AnnIndex, embeddings: DataFrame,
                            pred: Column,
                            nQueries: Int = 10, k: Int = 5,
                            nProbe: Int = 8, rerank: Int = 64,
                            queries: Option[DataFrame] = None,
                            knownCorpusDim: Option[Int] = None): DataFrame = {
    require(index.cents.head._2.length == index.m * index.dsub,
      s"ann index geometry is inconsistent: centroid dim " +
        s"${index.cents.head._2.length} != m*dsub = " +
        s"${index.m * index.dsub} — the artifact is corrupt")
    val corpusDim = knownCorpusDim.getOrElse(
      embeddings.select(size(vecD(col("embedding")))).first().getInt(0))
    require(index.cents.head._2.length == corpusDim,
      s"ann index dimension ${index.cents.head._2.length} does not " +
        s"match the corpus embedding dimension $corpusDim")
    val bookC2: Seq[(Int, Int, Array[Double], Double)] =
      index.book.toSeq.map { case (s, code, cv) =>
        (s, code, cv, cv.foldLeft(0.0)((a, x) => a + x * x))
      }
    pqSearch(index.codes, prepared(embeddings), index.cents, bookC2,
      index.m, index.ks, index.dsub, index.residual,
      nQueries, k, nProbe, rerank, pruneAtScan = true,
      queriesOverride = queries.map(prepared),
      candFilter = Some(pred))
  }

  /** Deterministic digest of a centroid table — the consistency stamp
    * for the semantic store: probing a store with DIFFERENT centroids
    * routes intake into the wrong cells and every cross-cell dup
    * passes undetected (fails open, the band index's exact hazard). */
  private def centStamp(cents: Array[(Long, Array[Double])]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(cents.sortBy(_._1)
      .map { case (id, v) => s"$id:${v.mkString(",")}" }
      .mkString(";").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    graft.Exact.hex(md.digest())
  }

  /** q101 write half: persist an ADMITTED-VECTOR store — the semantic
    * family's analogue of q45's band index (Dedup.writeBandIndex):
    * production dedups a continuously-arriving corpus by probing each
    * intake batch against the vectors already admitted, never by
    * re-scanning history. Rows are (cell, vec_id, v) PARTITIONED BY
    * CELL, so a probe reads only its probed cells' directories
    * (partition pruning — the same access shape as the band index's
    * bk_prefix layout). The centroid digest rides every row
    * ([[centStamp]]): a probe with a different quantizer dies at READ,
    * not by silently missing duplicates. */
  def writeSemanticStore(embeddings: DataFrame, path: String,
                         cents: Array[(Long, Array[Double])]): Unit = {
    require(cents.nonEmpty, "writeSemanticStore needs a centroid table")
    ArtifactCache.invalidate(semCacheKey(path)) // rebuild = new state
    semanticStoreRows(embeddings, cents)
      .write.mode("overwrite").partitionBy("cell").parquet(path)
  }

  /** One store row per vector: cell assignment, the vector, its
    * norm² STAMPED AT WRITE (`nrm2` = graft_dot(v,v), computed once —
    * probes take sqrt(nrm2) instead of re-running a dim-length
    * multiply-add per store row per probe; round-13 verdict), and the
    * geometry stamps. */
  private def semanticStoreRows(embeddings: DataFrame,
                                cents: Array[(Long, Array[Double])]): DataFrame =
    assignCellsFull(prepared(embeddings), cents)
      .select(col("cell"), col("vec_id"), col("v"),
        Exprs.dot(col("v"), col("v")).as("nrm2"),
        lit(cents.head._2.length).as("_p_dim"),
        lit(centStamp(cents)).as("_p_cent"))

  /** q101 append half: admit a batch's SURVIVORS into an existing
    * store — the semantic analogue of
    * [[graft.operators.Dedup.appendToBandIndex]]: probe first
    * ([[semanticProbeStore]]), keep the un-condemned, then append
    * THEIR rows so later batches dedup against them too. The existing
    * store's stamps are validated FIRST ([[readSemanticStore]]):
    * appending vectors quantized under a different centroid table
    * would scatter them into the wrong cell directories and every
    * cross-cell dup would pass undetected — the same silent fail-open
    * the read guard blocks, here blocked on the write side.
    * Append-mode parquet under the same cell partitioning: each batch
    * adds files only to the cell directories it actually admits into,
    * no rewrite, no read-modify-write race. */
  def appendToSemanticStore(embeddings: DataFrame, path: String,
                            cents: Array[(Long, Array[Double])]): Unit = {
    readSemanticStore(embeddings.sparkSession, path, cents)
    appendToSemanticStoreValidated(embeddings, path, cents)
  }

  /** [[appendToSemanticStore]] minus the stamp re-validation — for
    * callers that ALREADY read the store with these centroids in the
    * same unit of work (s15's per-batch loop reads + validates via
    * [[readSemanticStore]] two statements earlier; re-validating here
    * would re-list the whole cell-partitioned tree and re-run the
    * size aggregate on every micro-batch). Never call without a
    * same-centroids read in hand. */
  private[graft] def appendToSemanticStoreValidated(
      embeddings: DataFrame, path: String,
      cents: Array[(Long, Array[Double])]): Unit = {
    // r20: the read guard's all-rows-dim-match invariant is kept
    // COMPOSITIONALLY — valid store + valid batch ⇒ valid union — by
    // checking the BATCH's vector sizes here (batch-sized aggregate;
    // strictly earlier failure than the old next-read detection, which
    // only noticed a short vector after it had poisoned the store).
    // The cached-read path (readSemanticStore) relies on this.
    val dim = cents.head._2.length
    val sz = embeddings
      .agg(min(size(vecD(col("embedding")))).as("lo"),
        max(size(vecD(col("embedding")))).as("hi")).first()
    require(sz.getInt(0) == dim && sz.getInt(1) == dim,
      s"appendToSemanticStore: batch vector sizes span " +
        s"[${sz.getInt(0)}, ${sz.getInt(1)}] but the store is dim $dim — " +
        "a short vector would silently mis-score (DotProduct " +
        "truncates); fix the intake")
    ArtifactCache.invalidate(semCacheKey(path))
    semanticStoreRows(embeddings, cents)
      .write.mode("append").partitionBy("cell").parquet(path)
    // post-append state is valid by composition; schema captured on
    // the next read's first hit (the Bm25Meta upgrade convention)
    ArtifactCache.install(embeddings.sparkSession, semCacheKey(path),
      Seq(path), SemMeta(dim, centStamp(cents), None))
  }

  /** Compact an append-grown semantic store in place —
    * [[graft.operators.Dedup.compactBandIndex]]'s contract for the
    * vector store: each admitted batch leaves one small parquet file
    * per touched cell directory, so after N batches a probe's pruned
    * scan still opens O(N) files per probed cell. Rewrites to one
    * sorted file per cell (clustered by vec_id) via the shared
    * crash-safe rewrite→validate→swap choreography (quiesce admits
    * first — offline maintenance, like any table OPTIMIZE). Exact
    * duplicate rows from an at-least-once replayed admit collapse
    * (distinct over the full row — same vector, same stamps);
    * validation re-reads the rewrite under the same centroid table
    * and compares distinct row counts, aborting with the live store
    * untouched on any loss. Returns (files_before, files_after). */
  def compactSemanticStore(spark: org.apache.spark.sql.SparkSession,
                           path: String,
                           cents: Array[(Long, Array[Double])],
                           maxRecordsPerFile: Long = 0L): (Long, Long) = {
    val store = readSemanticStore(spark, path, cents)
    ArtifactCache.invalidate(semCacheKey(path)) // rewrite in flight
    graft.operators.Dedup.compactSwap(spark, path, what = "semantic store")(
      tmp =>
        store.distinct()
          .select(col("cell"), col("vec_id"), col("v"), col("nrm2"),
            lit(cents.head._2.length).as("_p_dim"),
            lit(centStamp(cents)).as("_p_cent"))
          .repartition(col("cell"))
          .sortWithinPartitions("vec_id")
          .write.mode("overwrite")
          .option("maxRecordsPerFile", maxRecordsPerFile)
          .partitionBy("cell").parquet(tmp)
    ) { tmp =>
      val wantRows = store.distinct().count()
      val gotRows = readSemanticStore(spark, tmp, cents).distinct().count()
      require(gotRows == wantRows,
        s"compaction of $path would lose rows ($wantRows distinct before, " +
          s"$gotRows after) — aborting with the live store untouched")
    }
  }

  /** q101 read half: load + VALIDATE the admitted store against the
    * caller's centroid table (fail-loud at read, the readBandIndex /
    * readCodebook convention). Stamp checks read ONE pruned
    * projection; the vector payload itself is then validated by a
    * single min/max-size aggregate — size() reads list OFFSETS, not
    * values — so a truncated or hand-edited `v` payload dies HERE
    * (round-13 advice: DotProduct truncates to the shorter operand,
    * so a short vector would otherwise silently mis-score every
    * probe against its cell). */
  /** Validated semantic-store state — the [[ArtifactCache]] payload
    * (r20): dim + centroid stamp + the resolved schema. The store has
    * no separate commit leg, so the fingerprint is the ROOT listing —
    * a cell directory's mtime changes when an append lands a file in
    * it, so any committed mutation is visible there. */
  private final case class SemMeta(dim: Int, stamp: String,
      schema: Option[org.apache.spark.sql.types.StructType])
  private def semCacheKey(path: String) = s"sem:$path"

  def readSemanticStore(spark: org.apache.spark.sql.SparkSession,
                        path: String,
                        cents: Array[(Long, Array[Double])]): DataFrame = {
    // r20: one full stamp/size validation per committed store state
    // per JVM (the readBm25Index rule) — the size aggregate scans the
    // WHOLE store's offsets and s15 re-read it per micro-batch. The
    // caller-centroids check stays on the hit path; appends keep the
    // invariant compositionally (appendToSemanticStoreValidated
    // validates ITS batch before writing).
    val cached = ArtifactCache.lookup[SemMeta](spark, semCacheKey(path),
      Seq(path))
    if (cached.isDefined) {
      val m = cached.get
      require(m.dim == cents.head._2.length,
        s"semantic store at $path was built at dim ${m.dim}, " +
          s"caller's centroids are dim ${cents.head._2.length}")
      require(m.stamp == centStamp(cents),
        s"semantic store at $path was built with a DIFFERENT centroid " +
          "table — probing would route intake into the wrong cells and " +
          "fail open; rebuild the store or load its centroids")
      val full = m.schema.fold(spark.read)(spark.read.schema).parquet(path)
      if (m.schema.isEmpty) // upgrade: next hit skips inference
        ArtifactCache.install(spark, semCacheKey(path), Seq(path),
          m.copy(schema = Some(full.schema)))
      return full.select("cell", "vec_id", "v", "nrm2")
    }
    val df = spark.read.parquet(path)
    require(Set("cell", "vec_id", "v", "nrm2", "_p_dim", "_p_cent")
      .subsetOf(df.columns.toSet),
      s"semantic store at $path lacks the expected columns, got " +
        s"${df.columns.mkString(", ")}")
    val stamps = df.select("_p_dim", "_p_cent").distinct().collect()
    require(stamps.length == 1,
      s"semantic store at $path carries mixed parameter stamps")
    require(stamps.head.getInt(0) == cents.head._2.length,
      s"semantic store at $path was built at dim ${stamps.head.getInt(0)}, " +
        s"caller's centroids are dim ${cents.head._2.length}")
    require(stamps.head.getString(1) == centStamp(cents),
      s"semantic store at $path was built with a DIFFERENT centroid " +
        "table — probing would route intake into the wrong cells and " +
        "fail open; rebuild the store or load its centroids")
    val sz = df.select(min(size(col("v"))).as("lo"), max(size(col("v"))).as("hi"))
      .first()
    require(sz.getInt(0) == stamps.head.getInt(0) &&
      sz.getInt(1) == stamps.head.getInt(0),
      s"semantic store at $path is corrupt: vector sizes span " +
        s"[${sz.getInt(0)}, ${sz.getInt(1)}] but the _p_dim stamp says " +
        s"${stamps.head.getInt(0)} — a short vector would silently " +
        "mis-score (DotProduct truncates); rebuild the store")
    ArtifactCache.install(spark, semCacheKey(path), Seq(path),
      SemMeta(stamps.head.getInt(0), stamps.head.getString(1),
        Some(df.schema)))
    df.select("cell", "vec_id", "v", "nrm2")
  }

  /** q101: INCREMENTAL semantic dedup — probe an intake batch against
    * the persisted admitted store: each intake vector is condemned iff
    * any store mate in its cell sits within `tau` cosine; output is
    * one row per hit, (vec_id, dup_of = smallest condemning store
    * mate, its exact cosine) — q45's verdict-feed contract with q57's
    * smallest-mate audit convention. Intake-vs-intake dups are out of
    * scope by design (q45's rule: run q57 over the batch for those —
    * it is batch-sized).
    *
    * Scale shape: intake assigns cells map-side (broadcast centroid
    * argmax), the probe is a cell-keyed equi-join whose STORE side
    * prunes to the batch's probed cells (partition layout above), and
    * the per-intake argmin collapses map-side — Σ intake-cell × store-
    * cell work, never batch × corpus. */
  def semanticProbeStore(intake: DataFrame, store: DataFrame,
                         cents: Array[(Long, Array[Double])],
                         tau: Double = 0.4): DataFrame = {
    val ai = assignCellsFull(prepared(intake), cents)
      .select(col("vec_id"), col("cell"), col("v").as("iv"),
        col("nrm").as("inrm"))
    // norm² was stamped at write (semanticStoreRows) — sqrt of the
    // stamp is the exact same double as recomputing the dot, minus a
    // dim-length multiply-add per store row per probe
    val sv = store.select(col("cell"), col("vec_id").as("dup_of"),
      col("v").as("svv"), sqrt(col("nrm2")).as("snrm"))
    ai.join(sv, Seq("cell"))
      .withColumn("cos_raw",
        dot(col("iv"), col("svv")) / (col("inrm") * col("snrm")))
      .filter(col("cos_raw") >= tau)
      .groupBy(col("vec_id"), col("cell"))
      .agg(min(struct(col("dup_of"), col("cos_raw"))).as("b"))
      .select(col("vec_id"), col("cell"), col("b.dup_of").as("dup_of"),
        round(col("b.cos_raw"), 4).as("cos_sim"))
      .orderBy("vec_id")
  }

  /** q65: iterated Lloyd refinement — the production k-means loop that
    * [[kmeansRefine]] is one step of (topic/domain clustering trains
    * for several rounds, not one). Round r assigns every vector to its
    * nearest round-(r−1) centroid and recomputes member means in the
    * same 2²⁰ fixed-point arithmetic as kmeansRefine, so every round —
    * and therefore the whole trajectory — is order-independent and
    * engine-replicable; the oracle unrolls the identical rounds in SQL.
    *
    * Shape per round: ONE job over the corpus — scan → broadcast
    * centroid table × corpus `max(struct)` argmax (kmeansRefine's
    * reassignment shape, codegen'd at any `nCells`; the literal-array
    * form hits janino's method limit past ~32 centroids, see
    * [[assignCells]]) → posexplode partial agg → collect of
    * nCells·dim fixed-point sums (kilobytes of index metadata, the
    * q46 collect rationale — per-vector data never reaches the
    * driver). A cell that loses all members KEEPS its previous
    * centroid (r14, the codebook-training convention — the oracle's
    * LEFT JOIN + COALESCE reproduces it; dropping shrank k and the
    * skew decomposition measured the survivors concentrating through
    * the 32× cap on a replica-dense corpus). Seeds are the shared
    * q46/q48 quantizer.
    *
    * `tol` stops early when every surviving centroid coordinate moved
    * ≤ tol between rounds (a driver-side array compare — free). The
    * default 0.0 stops only at an EXACT fixed point, which cannot
    * change the output vs running all `rounds` (identical centroids ⇒
    * identical subsequent rounds), so the fixed-`rounds` oracle
    * contract survives early exit; tol > 0 trades bit-replay for
    * fewer scans. At 100 TB each round re-scans the source
    * column-pruned to (vec_id, embedding) — persist that narrow
    * projection first if the cluster has memory; the loop is agnostic.
    *
    * Output: (vec_id, cluster_id, cos_sim) against the FINAL
    * centroids — kmeansRefine's contract without the single-step
    * `moved` flag. */
  def kmeansIterate(embeddings: DataFrame, nCells: Int = 16, rounds: Int = 3,
                    tol: Double = 0.0): DataFrame = {
    val e = prepared(embeddings)
    val cents = trainedCentroids(embeddings, nCells, rounds, tol)
    scoredAgainst(e, cents)
      .withColumn("cand", struct(col("score"), (-col("cell")).as("nc"),
        col("cell"),
        // dot/(nrm·cnrm), NOT score/nrm — q48's last-bit note applies
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")), 4).as("cos")))
      .groupBy("vec_id")
      .agg(max(col("cand")).as("b"))
      .select(col("vec_id"), col("b.cell").as("cluster_id"),
        col("b.cos").as("cos_sim"))
  }

  /** q57: semantic deduplication — SemDeDup (Abbas et al. 2023,
    * arXiv:2303.09540, public paper): cluster the embedding corpus
    * with a coarse quantizer, then compare vectors ONLY within their
    * cluster and drop any vector that sits within `tau` cosine of an
    * earlier cluster-mate. Near-dup (q24/q34) catches lexical copies;
    * this catches *paraphrases* — same meaning, different tokens —
    * which lexical minhash never pairs. Every vector gets a verdict:
    * `keep=1`, or `keep=0` with `dup_of` (the smallest-id cluster-mate
    * within tau) and the exact cosine that condemned it, so the drop
    * set is auditable and reversible.
    *
    * Spark-first shape: cell assignment is the q46/q48 quantizer — a
    * pure per-row argmax over broadcast centroid literals, ZERO
    * shuffle — and the only shuffles are the cluster-local self-join
    * (keyed on `cell`) and one partial-agg groupBy. Cost is
    * Σ cell² like the paper's per-cluster pairwise pass, never n².
    * At 100 TB `nCells` must grow ~n/target-cell-size
    * ([[suggestCells]]; SemDeDup uses 50k clusters for LAION-440M) —
    * the default is [[AutoGeometry]], which derives exactly that —
    * nCells also sets the join's key cardinality, so scaling it up
    * removes the skew a small test geometry would have, and past the
    * literal-argmax window the assignment switches to a broadcast
    * centroid table automatically ([[assignCells]]). [[cappedCell]]
    * fails loudly when the geometry is stale for the corpus.
    *
    * Greedy-by-id semantics (drop iff ANY earlier cluster-mate is
    * within tau, kept or not) rather than chained keep-set semantics:
    * one join instead of an iteration, order-independent, and
    * bit-replicable in SQL — the same contract as the paper's
    * per-cluster epsilon-dedup. */
  def semanticDedup(embeddings: DataFrame, tau: Double = 0.4,
                    nCells: Int = AutoGeometry, maxCell: Int = 1024,
                    centroids: Option[Array[(Long, Array[Double])]] = None): DataFrame = {
    // a centroids override IS the geometry — skip the count-driven
    // auto-sizing, the caller's training run already chose k
    val cents =
      if (centroids.isDefined) resolvedCentroids(embeddings, 0, centroids)
      else seedCentroids(embeddings, resolveCells(embeddings, nCells))
    val e = embeddings.select(col("vec_id"), vecD(col("embedding")).as("v"))
    // the nCells·dim argmax is the expensive pass — run it ONCE, into
    // per-cell membership lists (ids only; cells partition the corpus,
    // so unlike LSH buckets no cross-bucket dedup is ever needed), then
    // replay assignment and pair-expand from the lists. A naive
    // assigned⋈assigned self-join would re-evaluate the centroid scores
    // on every join input — measured 3× the cost at sf0.1.
    val cells = assignCells(e, cents)
      .groupBy("cell")
      .agg(cappedCell(collect_list(col("vec_id")), maxCell).as("vs"))
    val members = cells.select(col("cell"), explode(col("vs")).as("vec_id"))
    val pairs = cells.select(explode(col("vs")).as("vec_id"), col("vs"))
      .select(col("vec_id"), explode(col("vs")).as("vec_b"))
      .filter(col("vec_b") < col("vec_id"))
    val en = prepared(embeddings)
    // smallest condemning mate via min(struct): vec_b leads the struct,
    // so lexicographic min == min by vec_b; its rounded cosine rides
    // along — one partial-agg shuffle, no window
    val dups = pairs
      .join(en.select(col("vec_id"), col("v"), col("nrm")), Seq("vec_id"))
      .join(en.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("nrm").as("nb")), Seq("vec_b"))
      .withColumn("cos_raw", dot(col("v"), col("vb")) / (col("nrm") * col("nb")))
      .filter(col("cos_raw") >= tau)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("vec_b"), round(col("cos_raw"), 4).as("c"))).as("m"))
      .select(col("vec_id"), col("m.vec_b").as("dup_of"), col("m.c").as("cos_sim"))
    members.select(col("vec_id"), col("cell").as("cluster_id"))
      .join(dups, Seq("vec_id"), "left")
      .withColumn("keep", col("dup_of").isNull.cast("int"))
      .select("vec_id", "cluster_id", "keep", "dup_of", "cos_sim")
  }

  /** q63: semantic decontamination — the MEANING-level member of the
    * decontamination trio (q35 exact fingerprints, q47 n-gram overlap,
    * q63 embedding cosine): flag corpus vectors within `tau` cosine of
    * ANY eval-set vector, with the closest eval match and its exact
    * cosine for audit. Catches the leak the other two cannot — an eval
    * question paraphrased into different tokens before landing in the
    * training corpus.
    *
    * Same scale shape as q35: the eval side is tiny by contract and
    * BROADCAST, the corpus streams through one scoring pass (a
    * broadcast nested-loop, q25's shape — n·|eval| fused-loop dots,
    * no shuffle of the corpus), and the only shuffle aggregates
    * flagged rows (rare by construction). If the eval set ever
    * outgrows broadcast, bucket both sides with the q57 cell
    * quantizer and score within cells — same verdict columns. */
  def semanticDecontaminate(corpus: DataFrame, evalSet: DataFrame,
                            tau: Double = 0.4): DataFrame = {
    val c = prepared(corpus)
    val e = prepared(evalSet).select(col("vec_id").as("eval_id"),
      col("v").as("ev"), col("nrm").as("en"))
    // closest match via max(struct): cos_raw leads, then -eval_id so
    // ties break toward the smaller eval id (≡ the oracle's
    // ROW_NUMBER ORDER BY cos_raw DESC, eval_id); rounding happens
    // AFTER selection so the argmax sees full precision
    c.join(broadcast(e))
      .withColumn("cos_raw", dot(col("v"), col("ev")) / (col("nrm") * col("en")))
      .filter(col("cos_raw") >= tau)
      .groupBy("vec_id")
      .agg(max(struct(col("cos_raw"), (-col("eval_id")).as("ne"),
        col("eval_id"))).as("m"))
      .select(col("vec_id"), col("m.eval_id").as("matched_eval"),
        round(col("m.cos_raw"), 4).as("cos_sim"))
  }

  /** q79: semantic decontamination PAST the eval-broadcast ceiling —
    * same verdict columns, row-IDENTICAL output to
    * [[semanticDecontaminate]] (the correctness gate runs both against
    * the SAME exact oracle), for eval suites too large to ship whole
    * to every executor.
    *
    * EXACT, not approximate. Eval vectors are quantized into `nCells`
    * cells ([[semanticDedup]]'s quantizer: argmax of dot(e,c)/|c|,
    * ties to the smaller cell, deterministic lowest-vec_id seeds);
    * each cell records its angular radius r_c = max angle(e, cent_c)
    * over members. A corpus vector probes cell c only when
    * angle(v, cent_c) − r_c ≤ arccos(tau) + ε: by the spherical
    * triangle inequality (angle(v,e) ≥ angle(v,cent) − angle(e,cent))
    * no within-tau pair can live in a pruned cell, and the ε slack
    * (1e-6 rad, ~10⁶× the fused-loop dot's rounding) means floating
    * point can only ADD candidate cells, never drop a true match.
    * `acos` inputs are clamped to [−1,1] so FP overshoot widens the
    * bound instead of NaN-dropping the cell. Scoring inside probed
    * cells is the broadcast path's exact-cosine filter + argmax
    * verbatim, so the two variants agree row-for-row at ANY tau and
    * geometry (SimilaritySpec pins it on the real corpus).
    *
    * Scale shape: the only broadcast is the nCells centroid+radius
    * table (index metadata, like q46's centroids); the eval set
    * shuffles once keyed by eval_id (its own argmax agg — eval-sized,
    * not corpus-sized); the corpus is NEVER shuffled by vector
    * content — candidate cells come from a per-row broadcast
    * crossJoin against the centroid table (n·nCells fused-loop dots,
    * the q57 broadcast assignment shape), and the pair join is a
    * shuffled HASH join keyed on the bounded-cardinality cell id, so
    * candidate rows move at most once and are never sorted (PlanSpec
    * pins the shape). Probe fan-out is
    * adaptive: a tight eval cluster far from a corpus vector costs
    * one pruned-bound check, not |cell| cosines. */
  def semanticDecontaminateBucketed(corpus: DataFrame, evalSet: DataFrame,
                                    tau: Double = 0.4,
                                    nCells: Int = AutoGeometry): DataFrame = {
    require(tau > -1.0 && tau < 1.0, s"tau must be in (-1, 1), got $tau")
    val spark = corpus.sparkSession
    import spark.implicits._
    val nc = resolveCells(evalSet, nCells)
    // deterministic quantizer seeds: the nc lowest-vec_id EVAL vectors
    // (eval ids are sparse — q63's convention is id ≡ 0 mod 7 — so an
    // orderBy+limit, not seedCentroids' dense vec_id < n filter)
    val cents = evalSet.select(col("vec_id").cast("long"), vecD(col("embedding")))
      .orderBy("vec_id").limit(nc).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // empty eval set = nothing to flag — return the same empty frame
    // the broadcast path (q63) produces, preserving the documented
    // row-identity between the two variants instead of aborting
    if (cents.isEmpty) {
      import org.apache.spark.sql.types._
      return graft.operators.Dedup.emptyTyped(spark, StructType(Seq(
        StructField("vec_id", LongType),
        StructField("matched_eval", LongType),
        StructField("cos_sim", DoubleType))))
    }
    val centDf = cents.toSeq.toDF("cell", "cv")
      .select(col("cell"), col("cv"),
        sqrt(Exprs.dot(col("cv"), col("cv"))).as("cnrm"))
    def ang(score: Column): Column =
      acos(least(greatest(score, lit(-1.0)), lit(1.0)))
    // eval → (cell, angle-to-centroid): one argmax agg, eval-sized
    val e = prepared(evalSet).select(col("vec_id").as("eval_id"),
      col("v").as("ev"), col("nrm").as("en"))
    val evalCells = e.crossJoin(broadcast(centDf))
      .select(col("eval_id"),
        struct((dot(col("ev"), col("cv")) / col("cnrm")).as("score"),
          (-col("cell")).as("ncell"), col("cell"),
          ang(dot(col("ev"), col("cv")) / (col("en") * col("cnrm"))).as("angc"),
          col("ev"), col("en")).as("cand"))
      .groupBy("eval_id")
      .agg(max(col("cand")).as("b"))
      .select(col("b.cell").as("cell"), col("eval_id"),
        col("b.ev").as("ev"), col("b.en").as("en"), col("b.angc").as("angc"))
      // materialized once: the radii collect below AND the pair join
      // both consume this frame, and the |eval|×nCells assignment is
      // the dominant eval-side cost — recomputing it at action time
      // would double exactly the work this operator exists to bound
      .localCheckpoint()
    // per-cell angular radius: nCells rows of index metadata — the
    // same driver-collect budget as q46's centroids. Seed cells with
    // no members keep r = −∞ and are never probed.
    val radii = evalCells.groupBy("cell").agg(max(col("angc")).as("r"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val centR = cents.toSeq
      .map { case (id, arr) => (id, arr, radii.getOrElse(id, Double.NegativeInfinity)) }
      .toDF("cell", "cv", "r")
      .select(col("cell"), col("cv"), col("r"),
        sqrt(Exprs.dot(col("cv"), col("cv"))).as("cnrm"))
    val bound = math.acos(tau) + 1e-6
    val c = prepared(corpus)
    val cands = c.crossJoin(broadcast(centR))
      .filter(ang(dot(col("v"), col("cv")) / (col("nrm") * col("cnrm"))) - col("r")
        <= lit(bound))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    // pair scoring + argmax: verbatim the broadcast path's tail. The
    // cell join is a shuffled HASH join with the eval side building
    // (shuffle_hash hint): corpus candidates move at most once, keyed
    // by the bounded cell id — never sorted, never partitioned by
    // vector content, and the eval build side is per-cell-sized, not
    // whole-set
    cands
      .join(evalCells.select(col("cell"), col("eval_id"), col("ev"), col("en"))
        .hint("shuffle_hash"),
        Seq("cell"))
      .withColumn("cos_raw", dot(col("v"), col("ev")) / (col("nrm") * col("en")))
      .filter(col("cos_raw") >= tau)
      .groupBy("vec_id")
      .agg(max(struct(col("cos_raw"), (-col("eval_id")).as("ne"),
        col("eval_id"))).as("m"))
      .select(col("vec_id"), col("m.eval_id").as("matched_eval"),
        round(col("m.cos_raw"), 4).as("cos_sim"))
  }

  /** q64: cluster-balanced (diversity) sampling — keep at most
    * `perCell` vectors from each quantizer cell. Uniform sampling
    * (q38) preserves the corpus DISTRIBUTION, which is exactly wrong
    * when the goal is coverage: dominant clusters drown rare ones.
    * Capping per cell keeps every region of embedding space
    * represented — the cluster-balanced selection step data-curation
    * recipes run after clustering (same family as the SemDeDup
    * pipeline's per-cluster operations).
    *
    * One [[assignCells]] pass (zero shuffle at declared geometry),
    * then a per-cell rank window over (vec_id) — deterministic,
    * re-run-stable, no RNG. The window sorts only within cells; at
    * 100 TB geometry (nCells ~ n/10⁴) each partition is one cell's
    * members, the same bounded-stratum sort as q61's exact form — or
    * swap the rank gate for a hash gate at rate perCell/cellSize when
    * an approximate cap is acceptable. */
  def samplePerCell(embeddings: DataFrame, nCells: Int = 16,
                    perCell: Int = 8): DataFrame = {
    require(perCell >= 1, "perCell must be >= 1")
    val cents = seedCentroids(embeddings, nCells)
    val e = embeddings.select(col("vec_id"), vecD(col("embedding")).as("v"))
    val w = Window.partitionBy("cell").orderBy("vec_id")
    assignCells(e, cents)
      .withColumn("cell_rank", row_number().over(w))
      .filter(col("cell_rank") <= perCell)
      .select(col("vec_id"), col("cell").as("cluster_id"), col("cell_rank"))
  }

  /** [[suggestBits]]'s sibling for [[semanticDedup]]: cells such that
    * the expected cell size n/nCells lands near `targetCell`, keeping
    * the in-cell pair pass (Σ cell² ≈ n·targetCell) linear in n. The
    * 10× probe measures the law directly: 20k vectors at the test
    * default nCells=16 (cells of 1250) cost ~15 s of pair work; at
    * suggestCells(20k)=157 (cells of ~128) the same query is ~3.5 s
    * and scales linearly from there. */
  def suggestCells(n: Long, targetCell: Int = 128): Int =
    math.max(1, math.ceil(n.toDouble / targetCell).toInt)

  /** Per-vector cell assignment → (vec_id, cell), argmax of
    * dot(v,c)/|c| with ties toward the smaller cell id. Two physical
    * shapes, one semantics:
    *
    *  - small `nCells` (the oracle-checked defaults): centroid-literal
    *    array argmax — pure per-row expression, zero shuffle.
    *  - large `nCells` (the 100 TB geometry — SemDeDup-style corpora
    *    need cells ~n/10⁴, i.e. thousands of centroids): the literal
    *    array is no longer codegen-able (janino's 64 KB method limit —
    *    measured on the 10× probe: nCells=160 runs INTERPRETED and
    *    costs more than the whole pair pass), so assignment becomes a
    *    broadcast centroid table × corpus partial-agg argmax
    *    (kmeansRefine's reassignment shape): nCells rows per vector
    *    collapse map-side in one `max(struct)` agg, no window, and
    *    per-row cost stays a codegen'd fused loop.
    *
    * Both compute score = graft_dot(v,c)/sqrt(graft_dot(c,c)) with the
    * same left-to-right accumulation, so the argmax — and therefore
    * every downstream verdict — is identical; SimilaritySpec pins the
    * two shapes equal on a real corpus. */
  /** The exact cell argmax as ONE native per-row expression —
    * [[graft.functions.Exprs.CellArgmax]] with the centroid table as
    * kernel constants (sorted ascending by id: the tie-break
    * contract). r20, verdict #4: replaces BOTH exact shapes the
    * assignment used to switch between — the ≤32-cell literal score
    * array AND the broadcast-join + max(struct) partial aggregation —
    * with a zero-shuffle map riding the scan (the PqEncodeVec story on
    * the assignment half). Identical bits: same per-element dot
    * chains, same first-max tie rule (see the expression's contract);
    * the graded geometries run THROUGH this kernel, so the 172-query
    * oracle gate certifies it directly. */
  private def cellArgmaxCol(cents: Array[(Long, Array[Double])]): Column = {
    val sorted = cents.sortBy(_._1)
    Exprs.cellArgmax(col("v"), sorted.map(_._1), sorted.map(_._2),
      sorted.map(c => math.sqrt(dotArr(c._2, c._2))))
  }

  private[operators] def assignCells(e: DataFrame,
                                     cents: Array[(Long, Array[Double])],
                                     literalMax: Int = 32,
                                     twoLevelMin: Int = 257,
                                     coarseGroups: Int = 0): DataFrame =
    if (cents.length < twoLevelMin) {
      // literalMax kept for signature stability: the kernel unified the
      // two exact branches it used to select between
      val _ = literalMax
      e.select(cellArgmaxCol(cents).as("cell"), col("vec_id"))
    } else {
      // TWO-LEVEL assignment — the 100 TB shape. The flat broadcast
      // branch above is O(n·c) dot products, and with suggestCells
      // growing c linearly in n that is O(n²/targetCell): the 30×
      // probe measured q57's second decade at 5.3× (vs 3× linear)
      // from exactly this term. Coarse→fine cuts it to O(n·2√c):
      // group the (id-sorted) centroids into ~√c contiguous blocks,
      // take each block's MEAN as its coarse representative (computed
      // once on the driver over the in-memory centroid array —
      // deterministic, and measurably less funneling than a first-
      // member rep, which concentrated 9× the target into one cell on
      // the 30× probe), argmax a vector against the √c
      // representatives, then argmax within the chosen block's √c
      // members. The result is an APPROXIMATE
      // global argmax — a vector whose best centroid lives in a block
      // whose representative scored lower lands in a neighboring cell
      // — which is the standard IVF coarse-quantizer trade and
      // changes only WHICH approximate cell partitions the corpus,
      // not any downstream contract (the oracle-gated geometries stay
      // on the exact branches; SimilaritySpec pins both degenerate
      // extremes of this branch — 1 group, and all-singleton groups —
      // EQUAL to the flat argmax). Tie-breaks: smaller group index,
      // then smaller cell id, matching the flat branch's convention.
      val spark = e.sparkSession
      import spark.implicits._
      val c = cents.length
      val g = if (coarseGroups > 0) coarseGroups
              else math.ceil(math.sqrt(c.toDouble)).toInt
      val blockSize = math.ceil(c.toDouble / g).toInt
      val blocks = cents.grouped(blockSize).toArray
      val repDf = blocks.zipWithIndex
        .map { case (blk, i) =>
          val dim = blk.head._2.length
          val mean = Array.tabulate(dim)(d => blk.map(_._2(d)).sum / blk.length)
          (i, mean.toSeq)
        }.toSeq
        .toDF("gidx", "cv")
        .select(col("gidx"), col("cv"),
          sqrt(Exprs.dot(col("cv"), col("cv"))).as("cnrm"))
      val memDf = blocks.zipWithIndex
        .flatMap { case (blk, i) => blk.map { case (id, v) => (i, id, v.toSeq) } }
        .toSeq.toDF("gidx", "cell", "cv")
        .select(col("gidx"), col("cell"), col("cv"),
          sqrt(Exprs.dot(col("cv"), col("cv"))).as("cnrm"))
      // MULTI-PROBE coarse level (r14): take the top-2 blocks per
      // vector, not 1 — block means of ~√c arbitrary directions are
      // weak representatives in 64-dim (near-zero noise vectors), so
      // the single-probe block choice is itself a funnel: the skew
      // decomposition measured two-level worst cells 15-75% over the
      // exact flat argmax on the anisotropic 10×/30× bag corpora
      // (4179 vs 3629; 3624 vs 2074). Probing the runner-up block
      // recovers most rank-2 misroutes for one extra √c member
      // argmax per vector — still O(n·3√c) total, and the degenerate
      // extremes stay EQUAL to flat (1 group: only block; singleton
      // groups: top-2 reps are the top-2 true centroids and the
      // member argmax over both IS the global argmax — the spec's
      // two pins hold unchanged).
      val coarse = e.crossJoin(broadcast(repDf))
        .select(col("vec_id"), col("v"),
          struct((dot(col("v"), col("cv")) / col("cnrm")).as("score"),
            (-col("gidx")).as("ng"), col("gidx")).as("cand"))
        .groupBy("vec_id")
        .agg(slice(sort_array(collect_list(col("cand")), asc = false),
          1, 2).as("top"), first(col("v")).as("v"))
        .select(col("vec_id"), col("v"),
          explode(col("top.gidx")).as("gidx"))
      coarse.join(broadcast(memDf), Seq("gidx"))
        .select(col("vec_id"),
          struct((dot(col("v"), col("cv")) / col("cnrm")).as("score"),
            (-col("cell")).as("nc"), col("cell")).as("cand"))
        .groupBy("vec_id")
        .agg(max(col("cand")).as("b"))
        .select(col("b.cell").as("cell"), col("vec_id"))
    }

  /** [[assignCells]] with the float columns carried through —
    * (vec_id, v, nrm, cell) — for consumers that keep working on the
    * vectors after assignment (q69's PQ encode). Same dual shape,
    * same argmax, same tie-break; the broadcast branch rides v/nrm as
    * never-compared struct payload behind the (score, -cell) key. */
  private[operators] def assignCellsFull(e: DataFrame,
                                         cents: Array[(Long, Array[Double])],
                                         literalMax: Int = 32): DataFrame = {
    // the kernel (see [[cellArgmaxCol]]) is a zero-shuffle map for any
    // centroid table small enough to ride as expression constants —
    // the same bound the old broadcast branch had (the table shipped
    // to every executor either way); past ~4096 cells keep the
    // broadcast-agg shape (assignCells' two-level branch is the true
    // 100 TB answer; its callers pass through assignCells)
    val _ = literalMax
    if (cents.length <= 4096)
      e.withColumn("cell", cellArgmaxCol(cents))
    else {
      val spark = e.sparkSession
      import spark.implicits._
      val centDf = cents.toSeq.toDF("cell", "cv")
        .select(col("cell"), col("cv"),
          sqrt(Exprs.dot(col("cv"), col("cv"))).as("cnrm"))
      e.crossJoin(broadcast(centDf))
        .select(col("vec_id"),
          struct((dot(col("v"), col("cv")) / col("cnrm")).as("score"),
            (-col("cell")).as("nc"), col("cell"), col("v"), col("nrm")).as("cand"))
        .groupBy("vec_id")
        .agg(max(col("cand")).as("b"))
        .select(col("vec_id"), col("b.v").as("v"), col("b.nrm").as("nrm"),
          col("b.cell").as("cell"))
    }
  }

  /** [[cappedBucket]]'s sibling for k-means cells: a cell over
    * `maxCell` members means `nCells` is stale for the corpus size and
    * the in-cell pair pass would go quadratic — fail loudly with the
    * resize pointer instead. Default = 8× [[suggestCells]]'s target
    * cell, the same headroom rationale as the LSH cap: legit imbalance
    * at sized geometry passes, a ~10×-stale corpus dies fast. */
  private def cappedCell(vs: Column, maxCell: Int): Column =
    if (maxCell <= 0) vs
    else when(size(vs) > maxCell,
      raise_error(concat(
        lit("semanticDedup: a cluster cell holds "), size(vs).cast("string"),
        lit(s" vectors (cap $maxCell) — grow nCells with corpus size " +
          "(~n/targetCellSize, as SemDeDup does) or raise maxCell if the " +
          "geometry is deliberate"))))
      .otherwise(vs)

  /** q26: LSH-bucketed approximate nearest neighbors — the 100 TB
    * similarity path. `tables` independent hash tables of `bits`
    * sign-random-projection bits each; a vector's bucket in table t is
    * "t|b₀b₁…"; query candidates = union over tables of same-bucket
    * vectors; exact cosine + top-k only within candidates.
    *
    * Scale: signature computation is one narrow native-expression pass
    * (tables·bits·dim multiply-adds per row,
    * [[graft.functions.Exprs.LshBuckets]]); the candidate join is keyed
    * on the bucket string — cost Σ bucket², never n². Collision
    * probability per bit is 1 - θ/π, so `bits` tunes bucket granularity
    * (≈ log₂(n / target-bucket-size)) and `tables` recall; `bits`
    * defaults to [[AutoGeometry]] — derived from the corpus count at
    * call time — so the un-parameterized path keeps ~128-member
    * buckets at any SF. With genuinely-near neighbors (cos ≥ 0.9)
    * 8–16 bits keeps recall while shrinking buckets 10⁴×. */
  def annLsh(embeddings: DataFrame, bits: Int = AutoGeometry, tables: Int = 16,
             nQueries: Int = 10, k: Int = 5,
             maxBucket: Int = 1024): DataFrame = {
    val b = resolveBits(embeddings, bits)
    val signs = planeSigns(tables, b)
    val e = embeddings.select(col("vec_id"), vecD(col("embedding")).as("v"))
    val buckets = e.select(col("vec_id"),
      explode(Exprs.lshBuckets(col("v"), signs, tables, b)).as("bk"))
    // bucket-local pair expansion (see Dedup.simhashPairs): one
    // signature pass; per bucket, candidates = resident queries × all
    // members — identical to the bucket self-join's output
    val cands = buckets.filter(col("bk").isNotNull).groupBy("bk")
      .agg(cappedBucket(collect_list(col("vec_id")), maxBucket, "annLsh").as("vs"))
      .select(explode(filter(col("vs"), v => v < nQueries)).as("query_id"), col("vs"))
      .select(col("query_id"), explode(col("vs")).as("neighbor_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .distinct()
    val en = prepared(embeddings)
    val scored = cands
      .join(en.select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn")),
        Seq("query_id"))
      .join(en.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn")),
        Seq("neighbor_id"))
      .withColumn("cos_sim", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }
}
