package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 62-bit string hash: two polynomial rolling hashes (mults 31
  * and 131, mod 2³¹−1) over the UTF-8 bytes, packed into one BIGINT.
  *
  * Join-key hashing for shingle self-joins: an 8-byte shuffle key
  * instead of a string. Byte-level (not codepoint-level) iteration —
  * identical to [[HashFunctions.hash62]] on ASCII text and equally
  * collision-resistant elsewhere; use only where the hash value
  * itself carries no cross-engine contract (candidate generation,
  * join keys), not for oracle-checked fingerprints.
  */
case class Hash62Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hash62"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_hash62 expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < bytes.length) {
      val b = (bytes(i) & 0xff).toLong
      h1 = (h1 * 31 + b) % 2147483647L
      h2 = (h2 * 131 + b) % 2147483647L
      i += 1
    }
    h1 + (h2 << 31)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |final byte[] $bytes = $c.getBytes();
         |long $h1 = 0L; long $h2 = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  final long $b = ($bytes[$i] & 0xff);
         |  $h1 = ($h1 * 31 + $b) % 2147483647L;
         |  $h2 = ($h2 * 131 + $b) % 2147483647L;
         |}
         |${ev.value} = $h1 + ($h2 << 31);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Hash62Expr =
    copy(child = newChild)
}

object Hash62Expr {
  def apply(c: Column): Column = Bridge.column(Hash62Expr(Bridge.expression(c)))
}
