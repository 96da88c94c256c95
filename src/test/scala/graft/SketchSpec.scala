package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Sketch
import graft.operators.TextOps

/** q109: the Misra–Gries mergeable summary's THEOREMS exercised
  * directly — never-overestimate, the N/(c+1) underestimate bound, and
  * guaranteed membership above it — on streams engineered to hit the
  * eviction path and the cross-partition merge reduction, plus the
  * declared query's certification shape. */
class SketchSpec extends SparkSpec {

  private def tokFrame(toks: Seq[String], parts: Int = 4): DataFrame = {
    import spark.implicits._
    toks.toDF("tok").repartition(parts)
  }

  /** exact counts + the collected sketch map for a stream. */
  private def run(toks: Seq[String], counters: Int, parts: Int = 4)
      : (Map[String, Long], Map[String, Long], Long) = {
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val row = tokFrame(toks, parts)
      .agg(Sketch.misraGries(col("tok"), counters).as("mg"),
        count(lit(1)).as("n")).collect().head
    (exact, row.getMap[String, Long](0).toMap, row.getLong(1))
  }

  test("MG bounds hold on a skewed stream that overflows the summary") {
    // 1000 'hot' + 50 tokens of unique noise ≫ 8 counters: eviction fires
    val toks = Seq.fill(1000)("hot") ++ (1 to 50).map(i => s"u$i") ++
      Seq.fill(200)("warm")
    val c = 8
    val (exact, mg, n) = run(toks, c)
    n shouldBe toks.size.toLong
    mg.size should be <= c
    // never overestimate; underestimate within N/(c+1)
    mg.foreach { case (t, est) =>
      est should be <= exact(t)
      (exact(t) - est) should be <= n / (c + 1)
    }
    // guaranteed membership above N/(c+1)
    exact.filter(_._2 > n / (c + 1)).keys.foreach(t => mg.keySet should contain(t))
    mg.keySet should contain("hot")
  }

  test("MG merge reduction across many partitions preserves the bounds") {
    // uniform-ish stream with two genuinely heavy tokens, 16 partitions:
    // every partial summary overflows and the reduce-side merge must
    // re-reduce — the Agarwal et al. subtract-(c+1)-th-largest path
    val toks = (1 to 400).flatMap(i => Seq(s"t${i % 97}")) ++
      Seq.fill(300)("alpha") ++ Seq.fill(250)("beta")
    val c = 10
    val (exact, mg, n) = run(toks, c, parts = 16)
    mg.size should be <= c
    mg.foreach { case (t, est) =>
      est should be <= exact(t)
      (exact(t) - est) should be <= n / (c + 1)
    }
    Seq("alpha", "beta").foreach { t =>
      exact(t) > n / (c + 1) shouldBe true
      mg.keySet should contain(t)
    }
  }

  test("a summary wider than the vocabulary is exact") {
    val toks = Seq("a", "a", "b", "c", "c", "c")
    val (exact, mg, _) = run(toks, counters = 16, parts = 3)
    mg shouldBe exact
  }

  test("q109 certification: exact top-k counts, all verdicts true, k and shape") {
    val out = TextOps.heavyHittersCertified(tables.documents).collect()
    out.length shouldBe 20
    out.foreach(_.getAs[Boolean]("certified") shouldBe true)
    // cnt column is the EXACT count — check the top-1 against a direct agg
    val direct = tables.documents
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").groupBy("tok").count()
      .orderBy(col("count").desc, col("tok")).limit(1).collect().head
    val top = out.maxBy(_.getAs[Long]("cnt"))
    top.getAs[String]("tok") shouldBe direct.getString(0)
    top.getAs[Long]("cnt") shouldBe direct.getLong(1)
  }

  test("q109 is vacuously certified at counters=1 (no promise below N/c)") {
    val out = TextOps.heavyHittersCertified(tables.documents, counters = 1)
      .collect()
    out.foreach(_.getAs[Boolean]("certified") shouldBe true)
  }
}
