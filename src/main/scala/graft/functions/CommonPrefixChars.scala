package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Longest common prefix of two strings, in characters — the
  * maximal-span LCP as one native walk (r11 optimization).
  *
  * The suffix-neighbor LCP was a binary descent of `levels` chained
  * full-window `substr(...) === substr(...)` comparisons; every level
  * re-sliced both suffixes (UTF-8 substring scans from byte 0 to find
  * its char offset), so one adjacent pair paid O(levels × window)
  * byte work. This expression compares bytes left to right once and
  * stops at the first mismatch — O(lcp) — then floors to a char
  * boundary (two strings agreeing on a char prefix agree on its
  * bytes; the first differing char differs somewhere inside its own
  * encoding, so the byte mismatch lands inside it and walking back to
  * the char start yields exactly the char-grain LCP the descent
  * computed). Identical suffixes (one a prefix of the other) resolve
  * to the shorter's full char length, matching the descent's
  * truncated-window rule. Values are therefore IDENTICAL to the
  * descent's for any pair it could express (the island-length guard
  * that kept islands under 2^levels − 1 chars stays with the caller —
  * the DuckDB oracle still replays the fixed-level descent).
  */
case class CommonPrefixChars(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"common_prefix_chars requires (string, string), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "common_prefix_chars"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = a.asInstanceOf[UTF8String]
    val sb = b.asInstanceOf[UTF8String]
    val ba = sa.getBaseObject; val oa = sa.getBaseOffset; val na = sa.numBytes
    val bb = sb.getBaseObject; val ob = sb.getBaseOffset; val nb = sb.numBytes
    val max = math.min(na, nb)
    var i = 0
    while (i < max && Platform.getByte(ba, oa + i) == Platform.getByte(bb, ob + i)) i += 1
    // floor to a char-start boundary of the shared prefix (a byte is a
    // boundary iff it is the string end or not a UTF-8 continuation)
    var j = i
    while (j > 0 && j < na && (Platform.getByte(ba, oa + j) & 0xC0) == 0x80) j -= 1
    // count chars in the agreed prefix [0, j)
    var chars = 0L
    var p = 0
    while (p < j) {
      p += UTF8String.numBytesForFirstByte(Platform.getByte(ba, oa + p))
      chars += 1
    }
    chars
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CommonPrefixChars =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixChars {
  def commonPrefixChars(a: Column, b: Column): Column =
    GraftColumnBridge.column(CommonPrefixChars(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
