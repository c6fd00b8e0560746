package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined token k-grams of a token array in ONE pass — the shared
  * front of the shingle/n-gram dedup family (r11 optimization).
  *
  * The operators built k-grams two ways, both costly:
  *  - posexplode + (n−1) `lead()` window columns + `concat_ws` +
  *    `distinct()` (shinglePostings/ngramPostings): a doc-keyed shuffle
  *    + per-doc sort just to pair adjacent tokens, then a second
  *    shuffle for the distinct;
  *  - `transform(sequence(1, nG), i -> concat_ws(element_at…))`
  *    (dupNgramFrac/winnowSelect): interpreted lambda machinery per
  *    gram position, n boxed element_at walks each.
  *
  * This expression walks the token array once per document and emits
  * the grams directly — in positional order (`distinct = false`, so
  * `posexplode` recovers the gram position winnowing needs) or as the
  * first-occurrence-deduped set (`distinct = true`, replacing the
  * post-explode `.distinct()` shuffle at gram grain with a per-doc
  * hash set). Gram text is `UTF8String.concatWs(" ", …)` — identical
  * bytes to the `concat_ws(" ", …)` chains it replaces, so every
  * downstream hash (md5 portable families, xxhash64 keys) is bit-equal
  * and the DuckDB oracles replay unchanged.
  *
  * Arrays shorter than `n` yield the empty array (callers filter; kept
  * total). NULL in → NULL out. NULL elements cannot occur (`split`
  * never produces them); concatWs would skip them like concat_ws.
  */
case class TokenKgrams(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"token_kgrams requires n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_kgrams requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "token_kgrams"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val sep = TokenKgrams.Space
    val cnt = m - n + 1
    if (!distinct) {
      val out = new Array[Any](cnt)
      var i = 0
      while (i < cnt) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i < cnt) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenKgrams =
    copy(child = newChild)
}

object TokenKgrams {
  private val Space = UTF8String.fromString(" ")

  /** Column wrapper: array of space-joined `n`-grams of `tokens`, in
    * positional order, or first-occurrence-deduped when `distinct`.
    */
  def tokenKgrams(tokens: Column, n: Int, distinct: Boolean): Column =
    GraftColumnBridge.column(
      TokenKgrams(GraftColumnBridge.expression(tokens), n, distinct))
}
