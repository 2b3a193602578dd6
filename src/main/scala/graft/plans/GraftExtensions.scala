package graft.plans

import graft.functions.{BloomBits, BloomContains, BloomFpp, BloomMerge,
  BloomSketchAgg, CmsInnerProduct, CmsMerge, CmsQuery, CmsSketchAgg, DotFold,
  Hash62Expr, HllEstimate, HllMerge, HllSketchAgg, MinHashJaccard,
  MinHashSigAgg, MinHashSigMerge, SampleEntries, SampleMerge,
  SampleSketchAgg, ShingleHashes, SimHashExpr,
  TDigestCdf, TDigestMerge, TDigestMergeQuantiles, TDigestQuantiles,
  TDigestSketch, TokenHashes}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, Decimal}

/** Session extensions: registers graft's native expressions for SQL
  * use (`spark.sql.extensions=graft.plans.GraftExtensions` or
  * `.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, clazz: Class[_], arity: Int)(
        build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (args: Seq[Expression]) => {
          require(args.length == arity, s"$name takes $arity argument(s)")
          build(args)
        }: Expression))

    // HOF dot-product pattern -> native DotFold kernel (exact rewrite)
    ext.injectOptimizerRule(_ => RewriteDotFold)

    // SQL DELETE FROM + VERSION AS OF on graft-txlog catalog tables
    // (delegating parser: every other statement passes through intact)
    ext.injectParser((session, delegate) =>
      new GraftSqlParser(session, delegate))

    // custom whole-operator: logical AsOfJoinNode -> AsOfJoinExec
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)

    register("graft_dot", classOf[DotFold], 2)(a => DotFold(a.head, a(1)))
    register("graft_hash62", classOf[Hash62Expr], 1)(a => Hash62Expr(a.head))
    register("graft_token_hashes", classOf[TokenHashes], 1)(a => TokenHashes(a.head))
    register("graft_simhash", classOf[SimHashExpr], 1)(a => SimHashExpr(a.head))

    // t-digest family (the analyzer wraps a bare AggregateFunction in
    // an AggregateExpression, so the builders return the raw aggregate).
    // probabilities/compression are sketch PARAMETERS, not data: they
    // must be literals known at plan time (q101's shape from SQL).
    register("graft_tdigest_quantiles", classOf[TDigestQuantiles], 3)(a =>
      TDigestQuantiles(a.head,
        GraftExtensions.litDoubleArray(a(1), "graft_tdigest_quantiles", "probabilities"),
        GraftExtensions.litDouble(a(2), "graft_tdigest_quantiles", "compression")))
    register("graft_tdigest_sketch", classOf[TDigestSketch], 2)(a =>
      TDigestSketch(a.head,
        GraftExtensions.litDouble(a(1), "graft_tdigest_sketch", "compression")))
    register("graft_tdigest_merge_quantiles", classOf[TDigestMergeQuantiles], 2)(a =>
      TDigestMergeQuantiles(a.head,
        GraftExtensions.litDoubleArray(a(1), "graft_tdigest_merge_quantiles",
          "probabilities")))
    register("graft_tdigest_merge", classOf[TDigestMerge], 1)(a =>
      TDigestMerge(a.head))
    register("graft_tdigest_cdf", classOf[TDigestCdf], 2)(a =>
      TDigestCdf(a.head, a(1)))

    // HLL family (q104/e33): precision is a sketch PARAMETER —
    // plan-time literal, like the t-digest compression
    register("graft_hll_sketch", classOf[HllSketchAgg], 2)(a =>
      HllSketchAgg(a.head,
        GraftExtensions.litInt(a(1), "graft_hll_sketch", "precision")))
    register("graft_hll_merge", classOf[HllMerge], 1)(a => HllMerge(a.head))
    register("graft_hll_estimate", classOf[HllEstimate], 1)(a =>
      HllEstimate(a.head))

    // Count-Min family (q105): width is a sketch PARAMETER
    register("graft_cms_sketch", classOf[CmsSketchAgg], 2)(a =>
      CmsSketchAgg(a.head,
        GraftExtensions.litInt(a(1), "graft_cms_sketch", "width")))
    register("graft_cms_merge", classOf[CmsMerge], 1)(a => CmsMerge(a.head))
    register("graft_cms_query", classOf[CmsQuery], 2)(a =>
      CmsQuery(a.head, a(1)))
    register("graft_cms_inner", classOf[CmsInnerProduct], 2)(a =>
      CmsInnerProduct(a.head, a(1)))

    // weighted-sample family (q110/e36): k is a sketch PARAMETER
    register("graft_sample_sketch", classOf[SampleSketchAgg], 3)(a =>
      SampleSketchAgg(a.head, a(1),
        GraftExtensions.litInt(a(2), "graft_sample_sketch", "k")))
    register("graft_sample_merge", classOf[SampleMerge], 1)(a =>
      SampleMerge(a.head))
    register("graft_sample_entries", classOf[SampleEntries], 1)(a =>
      SampleEntries(a.head))

    // Bloom family (q106): m and k are sketch PARAMETERS
    register("graft_bloom_sketch", classOf[BloomSketchAgg], 3)(a =>
      BloomSketchAgg(a.head,
        GraftExtensions.litInt(a(1), "graft_bloom_sketch", "m"),
        GraftExtensions.litInt(a(2), "graft_bloom_sketch", "k")))
    register("graft_bloom_merge", classOf[BloomMerge], 1)(a => BloomMerge(a.head))
    register("graft_bloom_contains", classOf[BloomContains], 2)(a =>
      BloomContains(a.head, a(1)))
    register("graft_bloom_bits", classOf[BloomBits], 1)(a => BloomBits(a.head))
    register("graft_bloom_fpp", classOf[BloomFpp], 1)(a => BloomFpp(a.head))

    // group-level MinHash family (q107): k is a sketch PARAMETER
    register("graft_minhash_group", classOf[MinHashSigAgg], 2)(a =>
      MinHashSigAgg(a.head,
        GraftExtensions.litInt(a(1), "graft_minhash_group", "k")))
    register("graft_minhash_group_merge", classOf[MinHashSigMerge], 1)(a =>
      MinHashSigMerge(a.head))
    register("graft_minhash_jaccard", classOf[MinHashJaccard], 2)(a =>
      MinHashJaccard(a.head, a(1)))

    // fused n-gram hash kernel: graft_shingle_hashes(text, n[, dedupe])
    // — n and dedupe are plan-time literals (they shape the kernel)
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          "graft_shingle_hashes takes 2 or 3 argument(s)")
        val n = GraftExtensions.litInt(args(1), "graft_shingle_hashes", "n")
        val dedupe = args.length < 3 ||
          GraftExtensions.litBoolean(args(2), "graft_shingle_hashes", "dedupe")
        ShingleHashes(args.head, n, dedupe)
      }: Expression))
  }
}

object GraftExtensions {

  private def toDouble(v: Any, fn: String, arg: String): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case dec: Decimal => dec.toDouble
    case n: java.lang.Number => n.doubleValue() // SQL integer literals
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be numeric, got ${if (other == null) "NULL" else other.getClass.getSimpleName}")
  }

  /** Evaluate a foldable numeric argument to its Double value (SQL
    * numeric literals arrive as Int/Decimal/Double depending on how
    * they were written — `100`, `100.0`, `1e2`). */
  private[plans] def litDouble(e: Expression, fn: String, arg: String): Double = {
    require(e.foldable, s"$fn: $arg must be a literal, got ${e.sql}")
    toDouble(e.eval(), fn, arg)
  }

  /** Evaluate a foldable integral argument to its Int value. */
  private[plans] def litInt(e: Expression, fn: String, arg: String): Int = {
    require(e.foldable, s"$fn: $arg must be a literal, got ${e.sql}")
    e.eval() match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long =>
        if (l.longValue() != l.toInt)
          throw new IllegalArgumentException(
            s"$fn: $arg $l is out of Int range")
        l.toInt
      case s: java.lang.Short => s.toInt
      case b: java.lang.Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer, got ${if (other == null) "NULL" else other}")
    }
  }

  /** Evaluate a foldable boolean argument. */
  private[plans] def litBoolean(e: Expression, fn: String, arg: String): Boolean = {
    require(e.foldable, s"$fn: $arg must be a literal, got ${e.sql}")
    e.eval() match {
      case b: java.lang.Boolean => b.booleanValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a boolean, got ${if (other == null) "NULL" else other}")
    }
  }

  /** Evaluate a foldable `array(...)` argument to its Double elements. */
  private[plans] def litDoubleArray(e: Expression, fn: String,
      arg: String): Seq[Double] = {
    require(e.foldable, s"$fn: $arg must be a literal array, got ${e.sql}")
    val et = e.dataType match {
      case ArrayType(t, _) => t
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an array of numbers, got ${other.simpleString}")
    }
    e.eval() match {
      case a: ArrayData => a.toObjectArray(et).toSeq.map(toDouble(_, fn, arg))
      case null => throw new IllegalArgumentException(s"$fn: $arg must not be NULL")
    }
  }
}
