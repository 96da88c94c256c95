package graft

import org.apache.spark.sql.{GraftShim, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{Bpe, Exprs}

/** Registers graft's native expressions as SQL functions, so the same
  * kernels the DataFrame operators use are reachable from `spark.sql`:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)  // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   .getOrCreate()
  * spark.sql("SELECT graft_dot(a.v, b.v) FROM ...")
  *
  * GraftExtensions.register(spark)  // for an already-built session
  * }}}
  *
  * | SQL | maps to |
  * |---|---|
  * | `graft_dot(a, b)`            | [[graft.functions.Exprs.DotProduct]] |
  * | `graft_shingles(toks, n)`    | [[graft.functions.Exprs.Shingles]] |
  * | `graft_minhash(shingles, k)` | [[graft.functions.Exprs.MinHashSig]] |
  * | `graft_simhash(toks)`        | [[graft.functions.Exprs.SimHash64]] |
  * | `graft_hamming(a, b)`        | [[graft.functions.Exprs.HammingDist]] |
  * | `graft_repstats(toks)`       | [[graft.functions.Exprs.RepetitionStats]] |
  * | `graft_winnow(toks, k, w)`   | [[graft.functions.Exprs.WinnowFingerprints]] |
  * | `graft_bpe(text)`            | [[graft.functions.Bpe.BpeEncode]] |
  * | `graft_textembed(toks, dim)` | [[graft.functions.Exprs.TokenSigns]] |
  *
  * (LshBuckets and BloomMightContain are deliberately not SQL-exposed —
  * their plane matrix / serialized sketch are constructor arguments,
  * not columns; use Similarity.annLsh / TextOps.decontaminateBloom.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[Exprs.type].getName, name, usage)

  private[graft] val functions: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - exact dot product of two array<double>"),
      (args: Seq[Expression]) => Exprs.DotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(tokens, n) - distinct word n-gram shingles"),
      (args: Seq[Expression]) =>
        Exprs.Shingles(args(0), litInt(args(1), "shingle width n"))),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(shingles, k) - k Kirsch-Mitzenmacher min-hashes (one md5 per shingle, mod 2^31-1)"),
      (args: Seq[Expression]) =>
        Exprs.MinHashSig(args(0), litInt(args(1), "signature size k"))),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens) - 64-bit SimHash as a '0'/'1' string"),
      (args: Seq[Expression]) => Exprs.SimHash64(args(0))),
    (FunctionIdentifier("graft_hamming"),
      info("graft_hamming", "graft_hamming(a, b) - Hamming distance between bitstrings"),
      (args: Seq[Expression]) => Exprs.HammingDist(args(0), args(1))),
    (FunctionIdentifier("graft_repstats"),
      info("graft_repstats",
        "graft_repstats(tokens) - struct(top_tok_frac, top_2gram_frac, dup_2gram_frac)"),
      (args: Seq[Expression]) => Exprs.RepetitionStats(args(0))),
    (FunctionIdentifier("graft_winnow"),
      info("graft_winnow",
        "graft_winnow(tokens, k, w) - winnowing fingerprints: distinct per-window minima of positional k-gram md5s"),
      (args: Seq[Expression]) => Exprs.WinnowFingerprints(args(0),
        litInt(args(1), "k-gram width k"), litInt(args(2), "window size w"))),
    (FunctionIdentifier("graft_bpe"),
      info("graft_bpe",
        "graft_bpe(text) - greedy BPE subword tokens (default merge table)"),
      (args: Seq[Expression]) => Bpe.BpeEncode(args(0), Bpe.defaultMerges)),
    (FunctionIdentifier("graft_textembed"),
      info("graft_textembed",
        "graft_textembed(tokens, dim) - deterministic feature-hashing +/-1 projection embedding (array<long>)"),
      (args: Seq[Expression]) =>
        Exprs.TokenSigns(args(0), litInt(args(1), "embedding dim"))))

  /** Register into an already-built session (extensions normally apply
    * only at build time). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, inf, builder) =>
      GraftShim.registerFunction(spark, name, inf, builder)
    }
}
