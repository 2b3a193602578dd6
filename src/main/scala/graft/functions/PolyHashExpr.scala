package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash (mult, mod 2³¹−1) over UTF-8 bytes.
  * Identical to [[HashFunctions.polyHash]] (codepoint-based HOF fold)
  * on ASCII text — the oracle-checked fingerprint domain; byte-level
  * on anything else.
  */
case class PolyHashExpr(child: Expression, mult: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * mult + (bytes(i) & 0xff)) % 2147483647L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |final byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${mult}L + ($bytes[$i] & 0xff)) % 2147483647L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

object PolyHashExpr {
  def apply(c: Column, mult: Long): Column =
    Bridge.column(PolyHashExpr(Bridge.expression(c), mult))
}

/** Native MinHash signature: k permutation minima `(h·aᵢ+bᵢ) mod P`
  * over an array of (already mod-P-reduced) base hashes. Identical
  * arithmetic to [[HashFunctions.minhashSig]], one fused JVM loop
  * instead of k interpreted array traversals. */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {

  private val perms = HashFunctions.minhashPerms(k).toArray

  /** (a0, b0, a1, b1, …) flattened for the codegen reference object. */
  private lazy val permsFlat: Array[Long] =
    perms.flatMap { case (a, b) => Array(a, b) }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_sig"

  // containsNull must be false: eval reads arr.getLong(i) without a
  // null check, so a nullable array would silently read garbage.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects array<bigint not null>, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i) % 2147483647L
      var p = 0
      while (p < k) {
        val v = (h * perms(p)._1 + perms(p)._2) % 2147483647L
        if (v < out(p)) out(p) = v
        p += 1
      }
      i += 1
    }
    // empty input -> array of null minima in the HOF form
    // (array_min([]) per permutation); mirror it exactly
    if (n == 0) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val permsRef = ctx.addReferenceObj("minhashPerms", permsFlat, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new Object[$k]);
         |} else {
         |  final long[] $out = new long[$k];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $h = $c.getLong($i) % 2147483647L;
         |    for (int $p = 0; $p < $k; $p++) {
         |      final long $v = ($h * $permsRef[2 * $p] + $permsRef[2 * $p + 1])
         |        % 2147483647L;
         |      if ($v < $out[$p]) $out[$p] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  def apply(c: Column, k: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(c), k))
}
