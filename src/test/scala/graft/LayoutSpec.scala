package graft

import org.apache.spark.sql.functions.{col, lit, spark_partition_id}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

class LayoutSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def keys(bits: Int, pts: (Long, Long)*) =
    pts.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorderKey(col("a"), col("b"), bits).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("zorder key: hand-computed interleave, bijective on a grid") {
    val k = keys(4, (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (3L, 2L))
    assert(k((0L, 0L)) == 0L && k((1L, 0L)) == 1L)
    assert(k((0L, 1L)) == 2L && k((1L, 1L)) == 3L)
    // a=2(10),b=3(11): bits → 0·1 + 1·2 + 1·4 + 1·8 = 14; mirrored: 13
    assert(k((2L, 3L)) == 14L && k((3L, 2L)) == 13L)
    // bijective and exactly covering [0, 2^10) on a full 32×32 grid
    val grid = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val zs = keys(5, grid: _*).values.toSeq
    assert(zs.distinct.length == 1024 && zs.min == 0L && zs.max == 1023L)
  }

  test("zorder key: aligned 2x2 blocks are contiguous key runs — the locality law") {
    val grid = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val k = keys(4, grid: _*)
    for (a <- 0L until 16L by 2; b <- 0L until 16L by 2) {
      val base = k((a, b))
      assert(Seq(k((a + 1, b)), k((a, b + 1)), k((a + 1, b + 1))).sorted ==
        Seq(base + 1, base + 2, base + 3),
        s"block at ($a,$b) not contiguous")
    }
  }

  test("zorder layout: an aligned box lands in few range partitions") {
    // 64×64 grid → 16 range partitions (~256 keys each). An aligned
    // 8×8 box is ONE contiguous 64-key z-run, so it can straddle at
    // most two sampled partition boundaries — ≤3 partitions. A b-major
    // layout would put each of its 8 rows a full 64-key stride apart.
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b))
      .toDF("a", "b")
    val laid = Layout.zorderLayout(grid, col("a"), col("b"), numFiles = 16, bits = 6)
      .withColumn("pid", spark_partition_id())
    val boxPids = laid
      .filter(col("a") >= 16 && col("a") < 24 && col("b") >= 32 && col("b") < 40)
      .select("pid").distinct().count()
    assert(boxPids <= 3, s"aligned 8x8 box touched $boxPids partitions")
    // a caller column named __z would be clobbered by the scratch key
    // (ADVICE r9) — refused loudly instead
    val err = intercept[IllegalArgumentException](
      Layout.zorderLayout(grid.withColumn("__z", lit(1)),
        col("a"), col("b"), numFiles = 2, bits = 6))
    assert(err.getMessage.contains("__z"))
  }

  test("zorder key: loud guard out of range, NULL propagates, bits bound enforced") {
    val err = intercept[Exception](
      keys(4, (16L, 0L)))  // 16 >= 2^4
    assert(err.getMessage.contains("out of [0, 2^4)"))
    val err2 = intercept[Exception](keys(4, (0L, -1L)))
    assert(err2.getMessage.contains("out of [0, 2^4)"))
    // NULL dimension → NULL key, row kept
    val rows = Seq((Some(1L), Some(2L)), (None, Some(2L)))
      .toDF("a", "b")
      .select(Layout.zorderKey(col("a"), col("b"), 4).as("z"))
      .collect()
    assert(rows.length == 2 && !rows(0).isNullAt(0) && rows(1).isNullAt(0))
    intercept[IllegalArgumentException](Layout.zorderKey(lit(0L), lit(0L), 0))
    intercept[IllegalArgumentException](Layout.zorderKey(lit(0L), lit(0L), 32))
  }
}
