package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, CodegenFallback}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native portable-minhash signature over a shingle array — the #49h
  * streaming gate's hot path as ONE codegen'd expression.
  *
  * The gate originally computed the signature with 32 chained
  * `array_min(transform(...))` higher-order functions over a
  * `transform(..., md5)` base-hash array. HOFs evaluate interpreted —
  * per element access they bind a lambda variable, box the value and
  * walk an expression tree — and 32 passes of that per row measured
  * **~80–180 ms/row** (tools/FuzzyGateProbe, jstack'd to the
  * interpreted `ArrayTransform`/`BinaryArithmetic.eval` frames): at
  * sf0.1 one gate pass was still inside its first task after 15
  * minutes. This expression is the same computation as a tight
  * primitive loop — per shingle one MD5 + 32 multiply-add-mods, no
  * boxing, no lambda machinery — the [[DotProduct]] preference order
  * (compose built-ins → native Expression → never a UDF) applied to
  * the one place composition itself was the bottleneck.
  *
  * Semantics are BIT-EQUAL to the HOF chain it replaces (spec-pinned):
  * base hash = `conv(substring(md5(s), 1, 8), 16, 10) % permM` — the
  * first 4 digest bytes read as an unsigned 32-bit integer, mod M —
  * and per permutation i the min over shingles of
  * `(permA(i)·h + permB(i)) % permM` (products < 2⁶² — no overflow).
  * Empty or NULL shingle arrays return NULL, matching `array_min` over
  * an empty transform (the band-key md5 then sees all-null parts on
  * both forms). NULL shingle elements are SKIPPED, exactly as
  * `array_min` skips the null the `transform(..., md5)` base pass maps
  * them to (ADVICE r8 — previously they hashed as empty bytes, a
  * divergence guarded only by the "shingles are built strings"
  * convention); an array whose elements are ALL null folds to NULL
  * like the empty array.
  */
case class PortableMinhashSig(child: Expression, permA: Array[Long],
                              permB: Array[Long], permM: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    PortableMinhashSig.signature(arr, n, permA, permB, permM)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val aRef = ctx.addReferenceObj("permA", permA, "long[]")
      val bRef = ctx.addReferenceObj("permB", permB, "long[]")
      val n = ctx.freshName("n")
      val r = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |    graft.functions.PortableMinhashSig.signature(
         |      $a, $n, $aRef, $bRef, ${permM}L);
         |  if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PortableMinhashSig =
    copy(child = newChild)
}

object PortableMinhashSig {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 4 MD5 digest bytes as an unsigned 32-bit value, mod M —
    * exactly `conv(substring(md5(s), 1, 8), 16, 10) % M`.
    */
  def baseHash(s: UTF8String, permM: Long): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % permM
  }

  /** The full signature loop — shared by eval and generated code.
    * Null elements are skipped (`array_min` semantics over the
    * null-mapping md5 transform); returns null when no non-null
    * element exists (the all-null array folds like the empty one).
    */
  def signature(arr: ArrayData, n: Int, permA: Array[Long],
                permB: Array[Long], permM: Long): GenericArrayData = {
    val perms = permA.length
    val mins = Array.fill(perms)(Long.MaxValue)
    var seen = false
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        seen = true
        val h = baseHash(s, permM)
        var i = 0
        while (i < perms) {
          val v = (permA(i) * h + permB(i)) % permM
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }
}

/** Sorted band-key candidate lookup for the #49h gate: given the 8
  * per-row band keys, return the distinct bench doc_ids sharing any
  * band key — a binary search per band over the driver-sorted
  * `(band, band_key, doc_id)` artifact, replacing the per-row
  * `filter(keysLit, …)` linear scan whose cost grew with
  * bands×benchDocs interpreted lambda evals per corpus row. One
  * expression eval per row (CodegenFallback — a single interpreted
  * call, not per-entry lambda machinery).
  */
case class BandKeyLookup(child: Expression, bandIdx: Array[Int],
                         bandKeys: Array[UTF8String], docIds: Array[Long])
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"band_key_lookup requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "band_key_lookup"

  override def nullSafeEval(input: Any): Any = {
    val bk = input.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.SortedSet[Long]()
    var b = 0
    val nBands = bk.numElements()
    while (b < nBands) {
      val key = bk.getUTF8String(b)
      if (key != null) {
        // lower bound of (b, key) in the parallel sorted arrays
        var lo = 0
        var hi = bandIdx.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          val c = if (bandIdx(mid) != b) Integer.compare(bandIdx(mid), b)
                  else bandKeys(mid).compareTo(key)
          if (c < 0) lo = mid + 1 else hi = mid
        }
        var i = lo
        while (i < bandIdx.length && bandIdx(i) == b && bandKeys(i).equals(key)) {
          out += docIds(i)
          i += 1
        }
      }
      b += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[Long]) else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression): BandKeyLookup =
    copy(child = newChild)
}

object MinhashSigOps {

  /** Column API: portable-minhash signature of an array<string> column. */
  def minhash_sig(shingles: Column, permA: Array[Long], permB: Array[Long],
                  permM: Long): Column =
    GraftColumnBridge.column(PortableMinhashSig(
      GraftColumnBridge.expression(shingles), permA, permB, permM))

  /** Column API: distinct bench ids colliding with any of the row's
    * band keys. `keys` must be sorted by (band, band_key, doc_id).
    */
  def band_key_lookup(bandKeysCol: Column,
                      keys: Array[(Int, String, Long)]): Column =
    GraftColumnBridge.column(BandKeyLookup(
      GraftColumnBridge.expression(bandKeysCol),
      keys.map(_._1), keys.map(k => UTF8String.fromString(k._2)),
      keys.map(_._3)))
}
