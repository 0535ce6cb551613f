package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering the engine's custom Catalyst
  * expressions for SQL use:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or spark.sql.extensions=graft.functions.GraftExtensions
  * spark.sql("SELECT dot_product(a.v, b.v) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

  /** Integer from a literal argument (e.g. `shingle_array(text, 8)`). */
  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal argument, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_], arity: Int)
              (build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (exprs: Seq[Expression]) => {
          require(exprs.length == arity, s"$name takes exactly $arity arguments")
          build(exprs)
        }))

    inject("dot_product", classOf[DotProduct], 2)(e => DotProduct(e.head, e(1)))
    inject("lsh_buckets", classOf[LshBuckets], 4)(e =>
      LshBuckets(e.head, intArg(e(1), "lsh_buckets"),
        intArg(e(2), "lsh_buckets"), intArg(e(3), "lsh_buckets")))
    inject("lsh_probes", classOf[LshProbes], 5)(e =>
      LshProbes(e.head, intArg(e(1), "lsh_probes"), intArg(e(2), "lsh_probes"),
        intArg(e(3), "lsh_probes"), intArg(e(4), "lsh_probes")))
    inject("shingle_array", classOf[ShingleArray], 2)(e =>
      ShingleArray(e.head, intArg(e(1), "shingle_array")))
    inject("shingle_hash_array", classOf[ShingleHashArray], 2)(e =>
      ShingleHashArray(e.head, intArg(e(1), "shingle_hash_array")))
    inject("winnow_array", classOf[WinnowArray], 3)(e =>
      WinnowArray(e.head, intArg(e(1), "winnow_array"), intArg(e(2), "winnow_array")))
    inject("topk_by_score", classOf[TopKByScore], 3)(e =>
      TopKByScore(e.head, e(1), intArg(e(2), "topk_by_score"))
        .toAggregateExpression())
    inject("pair_array", classOf[PairArray], 1)(e => PairArray(e.head))
    inject("simhash_text", classOf[SimhashText], 2)(e =>
      SimhashText(e.head, intArg(e(1), "simhash_text")))
    inject("repetition_stats", classOf[RepetitionStats], 1)(e =>
      RepetitionStats(e.head))
    inject("minhash_sig", classOf[MinHashSig], 3)(e =>
      MinHashSig(e.head, intArg(e(1), "minhash_sig"),
        intArg(e(2), "minhash_sig")))
    inject("token_ngrams", classOf[TokenNgrams], 2)(e =>
      TokenNgrams(e.head, intArg(e(1), "token_ngrams")))
    inject("shingle_multi_array", classOf[ShingleMultiArray], 2)(e =>
      ShingleMultiArray(e.head, intArg(e(1), "shingle_multi_array")))
    inject("bottomk_by_key", classOf[BottomKByKey], 3)(e =>
      BottomKByKey(e.head, e(1), intArg(e(2), "bottomk_by_key"))
        .toAggregateExpression())
    inject("poisson_weights", classOf[PoissonWeights], 2)(e =>
      PoissonWeights(e.head, intArg(e(1), "poisson_weights"),
        graft.operators.Bootstrap.Thresholds))
    inject("bootstrap_sums", classOf[BootstrapSums], 3)(e =>
      BootstrapSums(e.head, e(1), intArg(e(2), "bootstrap_sums"),
        graft.operators.Bootstrap.Thresholds).toAggregateExpression())

    // band joins written as plain SQL get the Δ-bucket rewrite the
    // BandJoin operator applies by hand (kill switch:
    // spark.graft.bandJoinRewrite.enabled=false)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
    // Hamming-distance joins (`bit_count(a ^ b) <= k`) written as plain
    // SQL get the pigeonhole banding simhashPairsBanded applies by hand
    // (kill switch: spark.graft.hammingJoinRewrite.enabled=false)
    ext.injectOptimizerRule(_ => graft.plans.HammingJoinRewrite)
  }
}
