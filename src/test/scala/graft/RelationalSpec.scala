package graft

import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("q1 pricing summary groups by flag/status with positive measures") {
    val rows = operators.Relational.q1PricingSummary(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q3 returns at most 20 orders sorted by revenue desc") {
    val rows = operators.Relational.q3RevenueTopN(spark, dir).collect()
    assert(rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("q5 regional revenue covers regions") {
    val rows = operators.Relational.q5RegionalRevenue(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("r_name")).distinct.length >= 1)
  }

  test("topk customers per nation keeps rank <= 3") {
    val rows = operators.Relational.topkCustomersPerNation(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("rk")).max <= 3)
  }

  test("brand shares sum to ~100") {
    val rows = operators.Relational.partBrandShare(spark, dir).collect()
    val total = rows.map(_.getAs[Double]("share_pct")).sum
    assert(math.abs(total - 100.0) < 1e-3)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
