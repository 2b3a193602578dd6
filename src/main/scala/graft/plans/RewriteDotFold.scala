package graft.plans

import graft.functions.DotFold
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)`
  * into the native codegen'd [[DotFold]] kernel.
  *
  * A user writing the idiomatic HOF form gets the fused primitive
  * loop automatically. The rewrite is exact: DotFold is a strict
  * left fold with identical IEEE ordering and identical null
  * semantics (null input, length mismatch via zip_with's null
  * padding, or null element ⇒ null), and double multiply/add are
  * commutative bit-for-bit, so both operand orders qualify.
  */
object RewriteDotFold extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def sameVars(p: (Expression, Expression),
      args: Seq[NamedLambdaVariable]): Boolean = (p, args) match {
    case ((x: NamedLambdaVariable, y: NamedLambdaVariable), Seq(u, v)) =>
      (x.exprId == u.exprId && y.exprId == v.exprId) ||
        (x.exprId == v.exprId && y.exprId == u.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          zw @ ZipWith(a, b,
            LambdaFunction(Multiply(mx, my, _), zipArgs, _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(ax, ay, _), aggArgs, _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
        // raw-bits check: -0.0 == 0.0 numerically, but DotFold seeds
        // +0.0, and an all-(-0.0) fold would flip the result's sign bit
        if zero.isInstanceOf[Double] &&
          java.lang.Double.doubleToRawLongBits(zero.asInstanceOf[Double]) == 0L &&
          isDoubleArray(a) && isDoubleArray(b) &&
          sameVars((mx, my), zipArgs.collect { case v: NamedLambdaVariable => v }) &&
          sameVars((ax, ay), aggArgs.collect { case v: NamedLambdaVariable => v }) &&
          fin.exprId == finArg.exprId &&
          zw.dataType.isInstanceOf[ArrayType] =>
        DotFold(a, b)
    }
}
