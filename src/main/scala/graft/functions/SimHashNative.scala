package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-token 62-bit hashes of a text column — every occurrence, in
  * order (unlike [[ShingleHashes]], no dedupe: SimHash weights by
  * term frequency). Byte-level split on ' ' + dual-poly hash, matching
  * `transform(split(text,' '), hash62)` on ASCII text.
  */
case class TokenHashes(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_token_hashes expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) {
        out += h1 + (h2 << 31)
        h1 = 0L; h2 = 0L
      } else {
        val b = (bytes(i) & 0xff).toLong
        h1 = (h1 * 31 + b) % 2147483647L
        h2 = (h2 * 131 + b) % 2147483647L
      }
      i += 1
    }
    out += h1 + (h2 << 31) // final token (split keeps trailing empties)
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val idx = ctx.freshName("idx")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |final byte[] $bytes = $c.getBytes();
         |int $cnt = 1;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  if ($bytes[$i] == 32) $cnt++;
         |}
         |final long[] $out = new long[$cnt];
         |long $h1 = 0L; long $h2 = 0L; int $idx = 0;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  if ($bytes[$i] == 32) {
         |    $out[$idx++] = $h1 + ($h2 << 31); $h1 = 0L; $h2 = 0L;
         |  } else {
         |    final long $b = $bytes[$i] & 0xff;
         |    $h1 = ($h1 * 31L + $b) % 2147483647L;
         |    $h2 = ($h2 * 131L + $b) % 2147483647L;
         |  }
         |}
         |$out[$idx] = $h1 + ($h2 << 31);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

object TokenHashes {
  def apply(c: Column): Column = Bridge.column(TokenHashes(Bridge.expression(c)))
}

/** 63-bit SimHash over an array of word hashes (unit weight per
  * occurrence): per-bit majority vote, packed into a BIGINT. Exactly
  * [[HashFunctions.simhash]] (the nested-HOF form) but a JVM double
  * loop — the HOF form is O(63·|words|) *interpreted lambda calls*
  * per document, which measured ~40 ms/doc; this is ~µs. */
case class SimHashExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  // containsNull must be false: eval reads arr.getLong(i) without a
  // null check, so a nullable array would silently read garbage.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<bigint not null>, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](63)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 63) {
        votes(j) += ((h >> j) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 63) {
      if (votes(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val fp = ctx.freshName("fp")
      s"""
         |final int $n = $c.numElements();
         |final long[] $votes = new long[63];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $c.getLong($i);
         |  for (int $j = 0; $j < 63; $j++) {
         |    $votes[$j] += (($h >> $j) & 1L) * 2L - 1L;
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 63; $j++) {
         |  if ($votes[$j] > 0) $fp |= 1L << $j;
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  def apply(c: Column): Column = Bridge.column(SimHashExpr(Bridge.expression(c)))
}
