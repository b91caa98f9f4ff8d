package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BitInterleave, BoundedTopK, JaroWinkler, MinHashSketch, MisraGries, RollingHash, SignLshBuckets, StripAnsi, VecDot, VecHamming}

/** SparkSessionExtensions wiring: makes the engine's native expressions
  * available to pure-SQL users at session build time —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT strip_ansi(content) FROM entries")
  * }}}
  *
  * (The same registrations are available imperatively via
  * [[graft.functions.GraftFunctions.register]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("strip_ansi"),
      info("strip_ansi", "strip_ansi(str) - strips ANSI escape sequences (reference-lenient semantics)"),
      (exprs: Seq[Expression]) => StripAnsi(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - 64-bit polynomial rolling hash of the UTF-8 bytes"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - double-precision dot product of two float arrays"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_hamming"),
      info("vec_hamming", "vec_hamming(a, b) - popcount Hamming distance between two packed sign-word bigint arrays"),
      (exprs: Seq[Expression]) => VecHamming(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("sign_lsh_buckets"),
      info("sign_lsh_buckets",
        "sign_lsh_buckets(emb, tables, bits) - random-hyperplane LSH bucket id per table (tables/bits must be int literals)"),
      (exprs: Seq[Expression]) => SignLshBuckets(exprs(0),
        GraftExtensions.intLiteral(exprs(1), "tables"),
        GraftExtensions.intLiteral(exprs(2), "bits"))))
    ext.injectFunction((
      FunctionIdentifier("min_hash_sketch"),
      info("min_hash_sketch",
        "min_hash_sketch(h0, numHashes) - aggregate: MinHash signature (all permutation minima) over 64-bit shingle hashes"),
      (exprs: Seq[Expression]) => MinHashSketch(exprs(0),
        GraftExtensions.intLiteral(exprs(1), "numHashes"))))
    ext.injectFunction((
      FunctionIdentifier("z_order_key"),
      info("z_order_key",
        "z_order_key(a, b) - 62-bit Morton code interleaving the low 31 bits of two bigints (data-layout sort key)"),
      (exprs: Seq[Expression]) => BitInterleave(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler",
        "jaro_winkler(a, b) - Jaro-Winkler string similarity (0.7 boost threshold, 4-char prefix cap)"),
      (exprs: Seq[Expression]) => JaroWinkler(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("top_k_by"),
      info("top_k_by",
        "top_k_by(score, id, k) - aggregate: bounded per-group top-k as a sorted array<struct<score,id>> (score desc, id asc; k must be an int literal)"),
      (exprs: Seq[Expression]) => BoundedTopK(exprs(0), exprs(1),
        GraftExtensions.intLiteral(exprs(2), "k"))))
    ext.injectFunction((
      FunctionIdentifier("mg_candidates"),
      info("mg_candidates",
        "mg_candidates(keyHash, k) - aggregate: mergeable Misra-Gries heavy-hitter candidates over bigint keys, sorted array<bigint> (k must be an int literal)"),
      (exprs: Seq[Expression]) => MisraGries(exprs(0),
        GraftExtensions.intLiteral(exprs(1), "k"))))
  }
}

object GraftExtensions {
  private[graft] def intLiteral(e: Expression, name: String): Int = e match {
    case lit if lit.foldable => lit.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"sign_lsh_buckets: $name must be an int literal, got $other")
    }
    case _ => throw new IllegalArgumentException(
      s"sign_lsh_buckets: $name must be a literal")
  }
}
