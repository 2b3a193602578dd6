package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingle hashes of a text column, fused into one
  * pass: tokenize on ' ', slide an n-token window, hash each
  * window's byte span with the dual-poly 62-bit hash; `dedupe=true`
  * (the default) keeps first occurrences only, `dedupe=false` emits
  * one hash PER OCCURRENCE in document order (collocation counting —
  * t06 groups these 8-byte values without ever materializing the
  * bigram strings).
  *
  * Semantics match the composed form
  * `array_distinct(transform(wordShingles(split(text,' '), n), hash62))`
  * exactly (split keeps empty + trailing tokens, separator is a single
  * space, hash62 = Hash62Expr over the joined bytes) — but one fused
  * JVM pass per document instead of four interpreted HOFs, which is
  * what a 100 TB corpus scan needs. Output order is first-occurrence;
  * downstream consumers treat it as a set.
  *
  * CodegenFallback: the work is one substantial JVM call per
  * *document*, so per-row dispatch overhead is amortized; the loop
  * itself is JIT-compiled.
  */
case class ShingleHashes(child: Expression, n: Int,
    dedupe: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_hashes expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // token start offsets; token i spans [starts(i), ends(i))
    val starts = mutable.ArrayBuffer[Int](0)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) starts += i + 1
      i += 1
    }
    val nTokens = starts.length
    if (nTokens < n) return new GenericArrayData(Array.emptyLongArray)
    val seen =
      if (dedupe) new java.util.LinkedHashSet[java.lang.Long]() else null
    val occ = if (dedupe) null else new Array[Long](nTokens - n + 1)
    var t = 0
    while (t + n <= nTokens) {
      // byte span of the n-token window incl. the single-space joins
      val from = starts(t)
      val until = if (t + n < nTokens) starts(t + n) - 1 else bytes.length
      var h1 = 0L
      var h2 = 0L
      var j = from
      while (j < until) {
        val b = (bytes(j) & 0xff).toLong
        h1 = (h1 * 31 + b) % 2147483647L
        h2 = (h2 * 131 + b) % 2147483647L
        j += 1
      }
      if (dedupe) seen.add(h1 + (h2 << 31)) else occ(t) = h1 + (h2 << 31)
      t += 1
    }
    if (!dedupe) return new GenericArrayData(occ)
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(c: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c), n))
  def apply(c: Column, n: Int, dedupe: Boolean): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c), n, dedupe))
}
