package graft

import graft.functions.{DecimalDotProduct, DistinctGramCount, DistinctGrams, Fnv32a,
  FloatDotProduct, GramIntersectCount, HyperplaneBuckets, MinhashBandSigs,
  NfcNormalize, SimhashChunks, TokenWindowHashes, WinnowMin, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so
  * `SparkSession.builder.withExtensions(new GraftExtensions)` (or
  * `--conf spark.sql.extensions=graft.GraftExtensions`) exposes them to
  * pure-SQL users:
  *
  * {{{
  * SELECT fnv32a(word) % 4 AS bucket FROM words;
  * SELECT explode(word_shingles(text, 3)) FROM docs;
  * SELECT simhash_chunks(text)[0] FROM docs;
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, build) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[Fnv32a].getName, name),
        build))
    }
}

object GraftExtensions {

  /** int literal argument (e.g. a gram width) at `exprs(i)` */
  private def intArg(exprs: Seq[Expression], i: Int): Int = exprs(i) match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"argument ${i + 1} must be an integer literal, got $other")
  }

  /** name → expression builder for every graft native function */
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "fnv32a" -> (exprs => Fnv32a(exprs.head)),
    "winnow_min" -> (exprs => WinnowMin(exprs.head, intArg(exprs, 1))),
    "distinct_gram_count" -> (exprs => DistinctGramCount(exprs.head, intArg(exprs, 1))),
    "gram_intersect_count" ->
      (exprs => GramIntersectCount(exprs(0), exprs(1), intArg(exprs, 2))),
    "distinct_grams" -> (exprs => DistinctGrams(exprs.head, intArg(exprs, 1))),
    "word_shingles" -> (exprs => WordShingles(exprs.head, intArg(exprs, 1))),
    "simhash_chunks" -> (exprs => SimhashChunks(exprs.head)),
    "minhash_band_sigs" -> (exprs => MinhashBandSigs(exprs.head, intArg(exprs, 1))),
    "float_dot" -> (exprs => FloatDotProduct(exprs(0), exprs(1))),
    "decimal_dot" -> (exprs => DecimalDotProduct(exprs(0), exprs(1))),
    "hyperplane_buckets" ->
      (exprs => HyperplaneBuckets(exprs.head, intArg(exprs, 1), intArg(exprs, 2))),
    "token_window_hashes" ->
      (exprs => TokenWindowHashes(exprs.head, intArg(exprs, 1))),
    "nfc_normalize" -> (exprs => NfcNormalize(exprs.head))
  )

  /** Runtime registration for an existing session (builder-time
    * `withExtensions` is not available once a session exists). */
  def register(session: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, build) =>
      org.apache.spark.sql.GraftColumnBridge.registerFunction(session, name, build)
    }
}
