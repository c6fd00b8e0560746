package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scope

class ConfigScopeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val yaml =
    """screener:
      |  volume_mult: 2.5
      |  ma_fast: 5
      |curate:
      |  min_quality: 0.7
      |  langs: [en, fr]
      |scope:
      |  exchanges: [HSX, HNX]
      |""".stripMargin

  test("config: yaml parse, dotted get, typed views with defaults") {
    val cfg = GraftConfig.parse(yaml)
    assert(GraftConfig.getDouble(cfg, "screener.volume_mult", 1.5) == 2.5)
    assert(GraftConfig.getInt(cfg, "screener.ma_fast", 10) == 5)
    // absent key → operator default
    assert(GraftConfig.getInt(cfg, "screener.ma_slow", 20) == 20)
    assert(GraftConfig.getStrings(cfg, "curate.langs", Nil) == Seq("en", "fr"))
    val sc = ScreenConfig.from(cfg)
    assert(sc.volumeMult == 2.5 && sc.maFast == 5 && sc.maSlow == 20)
    val cc = CurateConfig.from(cfg)
    assert(cc.minQuality == 0.7 && cc.langs == Seq("en", "fr") && cc.valFrac == 0.05)
  }

  test("config: env overrides deep-merge over the file, scalars typed") {
    val cfg = GraftConfig.merge(GraftConfig.parse(yaml), GraftConfig.envOverrides(
      Map("GRAFT_SCREENER_VOLUME_MULT" -> "3.0",
          "GRAFT_CURATE_LANGS" -> "en,de",
          "HOME" -> "/root")))
    assert(GraftConfig.getDouble(cfg, "screener.volume_mult", 0) == 3.0)
    // non-overridden siblings survive the merge
    assert(GraftConfig.getInt(cfg, "screener.ma_fast", 0) == 5)
    assert(GraftConfig.getStrings(cfg, "curate.langs", Nil) == Seq("en", "de"))
    // A scalar and a section under the same name: the section wins
    // deterministically (an order-dependent fold threw or dropped one).
    val clash = GraftConfig.envOverrides(
      Map("GRAFT_LOG" -> "debug", "GRAFT_LOG_LEVEL" -> "info"))
    assert(GraftConfig.get(clash, "log.level").contains("info"))
    // Empty config is a no-op: typed views carry the OPERATORS' defaults.
    assert(ScreenConfig.from(Map.empty).volumeMult == 1.2)
  }

  test("config: validation lists every missing key at once") {
    val ex = intercept[IllegalArgumentException] {
      GraftConfig.validate(GraftConfig.parse(yaml),
        Seq("screener.volume_mult", "scope.mode", "paths.raw"))
    }
    assert(ex.getMessage.contains("scope.mode") && ex.getMessage.contains("paths.raw"))
    assert(!ex.getMessage.contains("volume_mult"))
  }

  test("config-driven screener changes the breakout threshold without recompiling") {
    import java.sql.Date
    // user 1: flat at 10 for 11 days (close == ma, so the cross
    // precondition prev_close <= prev_ma holds), then day 12 jumps to 20
    // on 10x volume — a breakout at mult 1.5 but not at mult 9.0.
    val bars = (1 to 12).map { i =>
      val close = if (i == 12) 20.0 else 10.0
      val vol = if (i == 12) 100L else 10L
      (1L, Date.valueOf(f"2024-01-${i}%02d"), close, close, close, close, vol, close)
    }.toDF("user_id", "date", "open", "high", "low", "close", "volume", "vwap")
    val loose = ScreenConfig.from(GraftConfig.parse("screener:\n  volume_mult: 1.5"))
    val strict = ScreenConfig.from(GraftConfig.parse("screener:\n  volume_mult: 9.0"))
    val looseHits = loose.breakouts(bars).count()
    val strictHits = strict.breakouts(bars).count()
    assert(looseHits >= strictHits,
      s"raising the volume threshold must not add breakouts ($looseHits < $strictHits)")
    assert(looseHits > 0, "the crafted volume spike must trip the loose screen")
  }

  test("ticker universe: alias normalization, membership, prefix exclusion, unique sorted") {
    val customer = Seq(
      (1L, "acme corp ", 10L), (2L, "VFETF FUND", 10L),
      (3L, "beta inc", 20L), (4L, "gamma ltd", 30L)
    ).toDF("c_custkey", "c_name", "c_nationkey")
    val nation = Seq((10L, "hsx"), (20L, "HNX"), (30L, "UPCOMM"))
      .toDF("n_nationkey", "n_name")
    // request HOSE via the HSX alias; UPCOMM normalizes to UPCOM
    val out = Scope.tickerUniverse(customer, nation,
        exchanges = Seq("HSX", "upcom"))
      .orderBy("symbol").collect()
    // entity 2 is ETF-prefix-excluded; entity 3 is HNX (not requested)
    assert(out.map(_.getAs[Long]("entity_id")).toSeq == Seq(1L, 4L))
    assert(out.map(_.getAs[String]("exchange")).toSeq == Seq("HOSE", "UPCOM"))
    assert(out.head.getAs[String]("symbol") == "ACME CORP")
  }

  test("exchange cap: primaries kept whole, junior top-N by liquidity, dropna, foreign dropped") {
    val universe = Seq(
      (1L, "AAA", "HOSE"), (2L, "BBB", "HNX"),
      (3L, "UP1", "UPCOM"), (4L, "UP2", "UPCOM"), (5L, "UP3", "UPCOM"),
      (6L, "UP4", "UPCOM"), // no liquidity row → dropped (dropna, never pads)
      (7L, "XXX", "OTC")    // neither primary nor capped → dropped
    ).toDF("entity_id", "symbol", "exchange")
    val activity = Seq((1L, 9.0), (3L, 5.0), (4L, 7.0), (5L, 6.0))
      .toDF("entity_id", "liquidity")
    val out = Scope.capExchangeByLiquidity(universe, activity,
        primary = Seq("HOSE", "HNX"), capped = "UPCOM", capN = 2)
      .orderBy("exchange", "symbol").collect()
    assert(out.map(_.getAs[String]("symbol")).toSeq == Seq("BBB", "AAA", "UP2", "UP3"),
      out.mkString(", "))
    // BBB (HNX) kept with null liquidity — primaries are never filtered
    assert(out.head.isNullAt(out.head.fieldIndex("liquidity")))
  }

  test("exchange cap: no usable liquidity falls back to first capN by symbol") {
    val universe = Seq(
      (1L, "AAA", "HOSE"),
      (3L, "UP3", "UPCOM"), (4L, "UP1", "UPCOM"), (5L, "UP2", "UPCOM")
    ).toDF("entity_id", "symbol", "exchange")
    val empty = Seq.empty[(Long, Double)].toDF("entity_id", "liquidity")
    val out = Scope.capExchangeByLiquidity(universe, empty,
        primary = Seq("HOSE"), capped = "UPCOM", capN = 2)
      .orderBy("exchange", "symbol").collect()
    assert(out.map(_.getAs[String]("symbol")).toSeq == Seq("AAA", "UP1", "UP2"))
  }
}
