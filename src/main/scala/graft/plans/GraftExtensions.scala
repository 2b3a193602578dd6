package graft.plans

import graft.functions.{DotFold, Hash62Expr, SimHashExpr, TokenHashes}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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

    // custom whole-operator: logical AsOfJoinNode -> AsOfJoinExec
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)

    register("graft_dot", classOf[DotFold], 2)(a => DotFold(a.head, a(1)))
    register("graft_hash62", classOf[Hash62Expr], 1)(a => Hash62Expr(a.head))
    register("graft_token_hashes", classOf[TokenHashes], 1)(a => TokenHashes(a.head))
    register("graft_simhash", classOf[SimHashExpr], 1)(a => SimHashExpr(a.head))
  }
}
