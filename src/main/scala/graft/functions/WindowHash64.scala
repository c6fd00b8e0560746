package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** All sliding-window hashes of a string in ONE pass — the window-exact
  * span family's hot path (r11 optimization).
  *
  * `charGramKeys` originally exploded every character position and
  * computed `xxhash64(substr(text, i, minLen))` per position. On UTF-8
  * strings `substring` has no char index and must scan from byte 0 to
  * locate char `i`, so the per-document cost was O(len²) byte scans
  * plus one UTF8String allocation per window — measured as the
  * dominant stage of every dedup_spans/maximal/span_stats row
  * (tools/JobProbe: the islandFrame checkpoint stage alone summed
  * 27.8 s of task time at sf0.1).
  *
  * This expression slides two byte pointers (window start / window
  * end) across the string once, advancing each by one UTF-8 char per
  * step, and hashes the window's bytes in place (no allocation):
  * O(len × minLen) byte reads total, O(len) pointer work.
  *
  * BIT-EQUAL to the expression chain it replaces: element `p` is
  * `XXH64(bytes of chars [p, p+minLen), seed 42)` — exactly
  * `xxhash64(substring(text, p+1, minLen))`, because substring copies
  * those same bytes and Spark's xxhash64 hashes UTF8String bytes with
  * seed 42. Shorter-than-window strings yield an empty array (the
  * caller filters them; kept total for safety). NULL in → NULL out.
  */
case class WindowHash64(child: Expression, minLen: Int)
  extends UnaryExpression with CodegenFallback {

  require(minLen >= 1, s"window_hash64 requires minLen >= 1, got $minLen")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"window_hash64 requires string, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "window_hash64"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes
    def charLen(i: Int): Int =
      UTF8String.numBytesForFirstByte(Platform.getByte(base, off + i))
    // advance the end pointer minLen chars in
    var end = 0
    var chars = 0
    while (chars < minLen && end < nb) { end += charLen(end); chars += 1 }
    if (chars < minLen) return new GenericArrayData(Array.emptyLongArray)
    // one window per remaining char position; count = numChars - minLen + 1
    val n = s.numChars() - minLen + 1
    val out = new Array[Long](n)
    var start = 0
    var p = 0
    while (p < n) {
      out(p) = XXH64.hashUnsafeBytes(base, off + start, end - start, 42L)
      start += charLen(start)
      if (end < nb) end += charLen(end)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WindowHash64 =
    copy(child = newChild)
}

object WindowHash64 {
  /** Column wrapper: array of xxhash64 values, one per `minLen`-char
    * sliding window of `text`, in char-position order.
    */
  def windowHash64(text: Column, minLen: Int): Column =
    GraftColumnBridge.column(
      WindowHash64(GraftColumnBridge.expression(text), minLen))
}
