package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Seen-signature lookup for the streaming media gate (r11 — the media
  * twin of the #49h `BandKeyLookup` discipline): given a row's dHash
  * chunk keys (`array<int>`, one per 16-bit chunk), find the seen
  * signatures within `maxHamming` — candidacy by per-chunk BINARY
  * SEARCH over the driver-sorted `(chunk, chunk_key)` artifact
  * (pigeonhole: every signature within nChunks−1 bits collides on some
  * chunk, so the decision is EXACT for maxHamming ≤ nChunks−1), then
  * an exact hamming verify against only the candidates.
  *
  * Returns `struct(best_hamming int, n_matches bigint)`: the minimum
  * distance among seen signatures within the radius (null when none)
  * and how many distinct seen signatures matched — exactly the
  * [[graft.ops.Multimodal.mediaIncrementalNew]] verdict columns, which
  * is what lets the projection gate spec-prove row-equality against
  * the oracle-checked batch row.
  *
  * CodegenFallback like BandKeyLookup: ONE interpreted call per row
  * (a few binary searches + a handful of xor/popcounts), not
  * per-entry lambda machinery — the r8 FuzzyGateProbe lesson was about
  * 32-HOF chains evaluating bands×docs lambdas per row, not about a
  * single compact eval.
  */
case class MediaSigLookup(child: Expression, chunkIdx: Array[Int],
                          chunkKey: Array[Int], sigIdx: Array[Int],
                          sigs: Array[Array[Int]], maxHamming: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"media_sig_lookup requires array<int>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("best_hamming", IntegerType, nullable = true),
    StructField("n_matches", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "media_sig_lookup"

  private def noMatch: InternalRow = new GenericInternalRow(Array[Any](null, 0L))

  override def nullSafeEval(input: Any): Any = {
    val ks = input.asInstanceOf[ArrayData].toIntArray()
    // Candidate sig indices via per-chunk lower-bound binary search.
    val cand = scala.collection.mutable.SortedSet[Int]()
    var c = 0
    while (c < ks.length) {
      val key = ks(c)
      var lo = 0
      var hi = chunkIdx.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val cmp = if (chunkIdx(mid) != c) Integer.compare(chunkIdx(mid), c)
                  else Integer.compare(chunkKey(mid), key)
        if (cmp < 0) lo = mid + 1 else hi = mid
      }
      var i = lo
      while (i < chunkIdx.length && chunkIdx(i) == c && chunkKey(i) == key) {
        cand += sigIdx(i)
        i += 1
      }
      c += 1
    }
    if (cand.isEmpty) noMatch
    else {
      var best = Int.MaxValue
      var n = 0L
      cand.foreach { si =>
        val s = sigs(si)
        var h = 0
        var j = 0
        while (j < ks.length && h <= maxHamming) {
          h += Integer.bitCount(ks(j) ^ s(j))
          j += 1
        }
        if (h <= maxHamming) {
          n += 1
          if (h < best) best = h
        }
      }
      if (n == 0L) noMatch
      else new GenericInternalRow(Array[Any](best, n))
    }
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) noMatch else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression): MediaSigLookup =
    copy(child = newChild)
}

object MediaSigOps {

  /** Column API: seen-signature verdict for a row's chunk-key array.
    * `seen` is the (sigId-free) artifact: one Array[Int] of chunk keys
    * per seen signature; internally sorted into the per-chunk parallel
    * arrays the binary search needs.
    */
  def media_sig_lookup(chunksCol: Column, seen: Array[Array[Int]],
                       maxHamming: Int): Column = {
    val entries = for {
      si <- seen.indices
      c <- seen(si).indices
    } yield (c, seen(si)(c), si)
    val sorted = entries.sortBy(e => (e._1, e._2, e._3)).toArray
    GraftColumnBridge.column(MediaSigLookup(
      GraftColumnBridge.expression(chunksCol),
      sorted.map(_._1), sorted.map(_._2), sorted.map(_._3),
      seen, maxHamming))
  }
}
