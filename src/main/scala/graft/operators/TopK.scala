package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed top-k with rank assignment.
  *
  * `row_number().over(Window.orderBy(...))` forces every input row into
  * ONE partition (Spark logs "No Partition Defined for Window
  * operation") — harmless on day-grain inputs, but a whole-universe
  * single-task sort at a 100× symbol universe. The scale-safe shape is
  * `orderBy(...).limit(k)`, which compiles to TakeOrderedAndProject:
  * every partition keeps a local k-row heap and only those heaps merge.
  * Ranks are then assigned by ONE tiny aggregate over the k survivors —
  * no window, no global sort of the full input.
  */
object TopK {

  /** Ascending-encoded sort key for a DESCENDING numeric column: negate,
    * with nulls pushed last (+∞) matching desc-nulls-last default order,
    * and NaN pushed FIRST (−∞) matching Spark's NaN-greater-than-any
    * ordering under `desc` (a plain negate would send NaN last, silently
    * excluding NaN metrics from the top-k).
    *
    * Numeric-key contract: keys are compared as doubles, so integral
    * keys above 2^53 may collide in the encoding (ties then resolve by
    * the caller's tie-break key). For exact ordering on huge longs, pass
    * a natively-typed expression (e.g. `-c` on the long itself) instead.
    */
  def descNum(c: Column): Column = {
    val d = c.cast("double")
    when(isnan(d), lit(Double.NegativeInfinity))
      .otherwise(coalesce(-d, lit(Double.PositiveInfinity)))
  }

  /** Top-k rows of `df` under ascending lexicographic `ascKeys` order
    * (encode descending numerics with [[descNum]]), plus a 1-based
    * `rankCol` in that order. Keys should be total (tie-break on a
    * unique column) so ranks are deterministic.
    */
  def withRank(df: DataFrame, k: Int, ascKeys: Seq[Column], rankCol: String = "rk"): DataFrame = {
    val keyed = ascKeys.zipWithIndex.map { case (c, i) => c.as(s"__k$i") }
    val payload = struct(df.columns.map(col): _*).as("__p")
    df.select(struct(keyed :+ payload: _*).as("__s"))
      .orderBy(ascKeys.indices.map(i => col(s"__s.__k$i")): _*)
      .limit(k)
      // k rows survive: one aggregate re-sorts them locally and position
      // becomes rank. No window ⇒ no single-partition whole-input sort.
      .agg(sort_array(collect_list(col("__s"))).as("__rows"))
      .select(posexplode(col("__rows")).as(Seq("__pos", "__r")))
      .select((col("__pos") + 1).as(rankCol) +: df.columns.map(c => col(s"__r.__p.$c")): _*)
  }

  /** Per-group top-k with rank — the grouped twin of [[withRank]].
    *
    * `row_number().over(partitionBy(g))` ships EVERY candidate row into
    * the one reducer that owns group g: with a handful of groups (the
    * ANN rankers have nQueries=10) that collapses a corpus-wide scan
    * into ≤10 tasks, each holding a corpus-sized slice at 100×. The
    * bounded [[graft.functions.TopKStruct]] aggregate truncates to k
    * per group in the PARTIAL (map-side) aggregate, so the shuffle
    * moves at most k·partitions rows per group and the scan stays fully
    * parallel. Keys must be total per group (tie-break on a unique
    * column) for deterministic ranks.
    */
  def groupedWithRank(df: DataFrame, groupCols: Seq[Column], k: Int,
                      ascKeys: Seq[Column], rankCol: String = "rk"): DataFrame = {
    val keyed = ascKeys.zipWithIndex.map { case (c, i) => c.as(s"__k$i") }
    val payload = struct(df.columns.map(col): _*).as("__p")
    df.groupBy(groupCols: _*)
      .agg(graft.functions.TopKStruct.topk_struct(
        struct(keyed :+ payload: _*), k).as("__rows"))
      .select(posexplode(col("__rows")).as(Seq("__pos", "__r")))
      .select((col("__pos") + 1).as(rankCol) +: df.columns.map(c => col(s"__r.__p.$c")): _*)
  }
}
