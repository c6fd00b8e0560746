package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Technical indicators over per-key ordered bar series.
  *
  * Spark re-expression of the reference's `TechnicalIndicators`
  * (/root/reference/src/transformers/technical_indicators.py). There each
  * indicator is a pandas rolling/ewm call on one symbol's frame inside a
  * per-symbol thread loop; here each is a window function over
  * `partitionBy(key).orderBy(date)` — one shuffle on the key shared by
  * every indicator, executed for the whole universe at once.
  *
  * Rolling semantics replicate pandas `rolling(window=p, min_periods=p)`:
  * the aggregate is null until p non-null observations fill the frame
  * (gated via `count(x) over frame == p`).
  *
  * EMA (`ewm(span, adjust=False)`) is a linear recursion, which no SQL
  * window expresses directly. It's computed as a per-key fold:
  * `collect_list` the (small, bar-grain) series per key, fold with the
  * `aggregate` higher-order function (stays inside Catalyst/codegen),
  * `posexplode` back. Parallelism is across keys; per-key state is the
  * bar-grain series (years of daily bars ≈ KBs), never tick grain.
  */
object Indicators {
  val KeyCol = "user_id"
  val OrdCol = "date"

  /** Hard ceiling on the per-key series length the collect_list fold
    * paths ([[withEma]]/[[withMacd]]) will materialize. One key's whole
    * series becomes a single array in one task — bar-grain series are
    * KBs, but a tick-grain misuse would OOM the executor silently.
    * Past the ceiling the fold raises instead (use
    * [[withEmaStreaming]], whose per-key state is O(spans), or raise
    * the limit knowingly). 100k rows ≈ a year of minute bars ≈ 800 KB
    * per array — comfortably inside a task, far outside accident range.
    */
  val MaxFoldSeriesLen: Int = 100000

  /** Full enrichment chain — every indicator family in one call, the
    * Spark twin of the reference applying its whole `TechnicalIndicators`
    * battery per symbol. Fold-based indicators (MACD, EMA) run first so
    * their per-key series collection carries only bar-grain columns;
    * the window families then share one (key)-partitioned sort.
    */
  def enrichAll(bars: DataFrame,
                smaPeriods: Seq[Int] = Seq(5, 10, 20),
                emaSpans: Seq[Int] = Seq(5, 12, 26),
                rsiPeriod: Int = 14,
                macd: (Int, Int, Int) = (12, 26, 9),
                bollinger: (Int, Double) = (20, 2.0),
                atrPeriod: Int = 20,
                momentumHorizons: Seq[Int] = Seq(5, 10)): DataFrame = {
    val (f, s, sig) = macd
    val (bp, bk) = bollinger
    val afterFolds = withEma(withMacd(bars, f, s, sig), emaSpans)
    withReturns(
      withVolumeMetrics(
        withAtr(
          withBollinger(
            withRsi(
              withSma(afterFolds, smaPeriods), rsiPeriod), bp, bk), atrPeriod)),
      momentumHorizons)
  }

  def byKey: WindowSpec =
    Window.partitionBy(col(KeyCol)).orderBy(col(OrdCol))

  private def rolling(p: Int): WindowSpec = byKey.rowsBetween(-(p - 1), 0)

  /** pandas rolling(p, min_periods=p).mean() */
  def gatedAvg(c: Column, p: Int): Column =
    when(count(c).over(rolling(p)) === p, avg(c).over(rolling(p)))

  /** pandas rolling(p, min_periods=p).std() (sample stddev) */
  def gatedStd(c: Column, p: Int): Column =
    when(count(c).over(rolling(p)) === p, stddev_samp(c).over(rolling(p)))

  /** SMA columns `ma_{p}` + distance-from-MA `dist_ma_{p}`
    * (technical_indicators.py:17 add_moving_averages, :175 dist columns).
    */
  def withSma(bars: DataFrame, periods: Seq[Int]): DataFrame =
    periods.foldLeft(bars) { (df, p) =>
      df.withColumn(s"ma_$p", gatedAvg(col("close"), p))
        .withColumn(s"dist_ma_$p",
          (col("close") - col(s"ma_$p")) / nullif(col(s"ma_$p"), lit(0.0)))
    }

  /** SQL fold expression: pandas ewm(span, adjust=False) over an array.
    * alpha is written as the expression `2.0/(span+1)` so Spark and the
    * DuckDB oracle evaluate the identical double.
    */
  private def emaFoldSql(src: String, span: Int): String = {
    // 2.0D: a plain `2.0` literal parses as DECIMAL(2,1) and decimal
    // division truncates alpha to 6 decimals (0.153846 != 2.0/13) —
    // the double literal keeps the full-precision recursion.
    val a = s"(2.0D/${span + 1})"
    s"""aggregate(
       |  slice($src, 2, size($src) - 1),
       |  array(element_at($src, 1)),
       |  (acc, v) -> array_append(acc, $a * v + (1.0 - $a) * element_at(acc, -1)))""".stripMargin
  }

  /** Collect the per-key series once: returns (grouped df with column `s`
    * = date-sorted array of row structs and `closes` = array of close).
    */
  private def collectSeries(bars: DataFrame,
                            maxLen: Int = MaxFoldSeriesLen): (DataFrame, Seq[String]) = {
    val others = bars.columns.filter(_ != KeyCol).toSeq
    val ordered = Seq(OrdCol) ++ others.filterNot(_ == OrdCol)
    // The guard must fire BEFORE collect_list materializes a key's whole
    // series — a post-hoc size(s) check would OOM the aggregate first
    // for a truly tick-grain key. A keyed window count buffers rows in
    // a spill-safe sorter (never an array) and raises per oversized
    // key; it evaluates inside the SAME single derivation of `bars`
    // (an aggregate-plus-join guard would re-derive the whole upstream
    // bars pipeline a second time — measured 2× on enrichAll queries),
    // and its hash partitioning on the key is what the groupBy needs,
    // so guard + collect share one Exchange.
    val byKeyAll = org.apache.spark.sql.expressions.Window.partitionBy(col(KeyCol))
    val guarded = bars
      .withColumn("__n", count(lit(1)).over(byKeyAll))
      .withColumn("__chk",
        when(col("__n") > maxLen, raise_error(concat(
          lit(s"Indicators fold: per-key series exceeds maxSeriesLen=$maxLen (n="),
          col("__n").cast("string"),
          lit(") — the array fold holds one key's whole series in a task; " +
            "use withEmaStreaming for long series or raise maxSeriesLen"))))
          .otherwise(lit(1)))
      .filter(col("__chk") === 1).drop("__n", "__chk")
    val g = guarded
      .groupBy(col(KeyCol))
      .agg(sort_array(collect_list(struct(ordered.map(col): _*))).as("s"))
      .withColumn("closes", expr("transform(s, x -> x.close)"))
    (g, others)
  }

  private def explodeSeries(g: DataFrame, others: Seq[String], extra: Seq[String]): DataFrame = {
    val exploded = g.select(
      (col(KeyCol) +: extra.map(col)) :+ posexplode(col("s")): _*)
    others.foldLeft(exploded)((df, c) => df.withColumn(c, col("col").getField(c)))
  }

  /** EMA columns `ema_{span}` (technical_indicators.py:44 add_ema):
    * null until span observations (min_periods), recursion seeded at the
    * first bar exactly as pandas ewm(adjust=False).
    */
  def withEma(bars: DataFrame, spans: Seq[Int],
              maxSeriesLen: Int = MaxFoldSeriesLen): DataFrame = {
    val (g0, others) = collectSeries(bars, maxSeriesLen)
    val g = spans.foldLeft(g0) { (df, sp) =>
      df.withColumn(s"__ea_$sp", expr(emaFoldSql("closes", sp)))
    }
    val arrCols = spans.map(sp => s"__ea_$sp")
    val e = explodeSeries(g, others, arrCols)
    spans.foldLeft(e) { (df, sp) =>
      df.withColumn(s"ema_$sp",
        when(col("pos") >= sp - 1, element_at(col(s"__ea_$sp"), col("pos") + 1)))
    }.drop(Seq("col", "pos", "closes") ++ arrCols: _*)
  }

  /** Long-series EMA: the same `ema_{span}` columns and pandas
    * ewm(adjust=False) recursion as [[withEma]], computed as a streaming
    * per-partition fold instead of a per-key collect_list array —
    * per-key state is O(spans) doubles regardless of series length, so
    * a minute-grain 100×-scale deployment (millions of rows per key)
    * never materializes a series. Shape: one hash repartition on the
    * key, sortWithinPartitions on (key, date, remaining columns) — the
    * exact per-key order `sort_array` gives the fold — then a single
    * mapPartitions pass carrying the running EMA per span. Arithmetic
    * is the identical `a*v + (1-a)*prev` double recursion with
    * a = 2.0/(span+1): bit-equal output (spec-asserted), including the
    * null-close poison semantics of the array fold (a null close nulls
    * that key's EMAs from that row on).
    */
  def withEmaStreaming(bars: DataFrame, spans: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val inSchema = bars.schema
    val outSchema = StructType(inSchema.fields ++
      spans.map(sp => StructField(s"ema_$sp", DoubleType, nullable = true)))
    val keyIdx = inSchema.fieldIndex(KeyCol)
    val closeIdx = inSchema.fieldIndex("close")
    val spanArr = spans.toArray
    val alphas = spanArr.map(sp => 2.0 / (sp + 1))
    val others = bars.columns.filter(_ != KeyCol).toSeq
    val ordered = Seq(OrdCol) ++ others.filterNot(_ == OrdCol)
    bars
      .repartition(col(KeyCol))
      .sortWithinPartitions((KeyCol +: ordered).map(col): _*)
      .mapPartitions { it =>
        var started = false
        var curKey: Any = null
        var pos = 0L
        var poisoned = false
        val e = new Array[Double](spanArr.length)
        it.map { row =>
          val k = row.get(keyIdx)
          if (!started || k != curKey) {
            started = true; curKey = k; pos = 0L; poisoned = false
          } else pos += 1
          val cNull = row.isNullAt(closeIdx)
          if (cNull) poisoned = true
          else {
            val c = row.getDouble(closeIdx)
            var i = 0
            while (i < e.length) {
              e(i) = if (pos == 0L) c else alphas(i) * c + (1.0 - alphas(i)) * e(i)
              i += 1
            }
          }
          val out = new Array[Any](spanArr.length)
          var i = 0
          while (i < spanArr.length) {
            out(i) = if (!poisoned && pos >= spanArr(i) - 1)
              java.lang.Double.valueOf(e(i)) else null
            i += 1
          }
          Row.fromSeq(row.toSeq ++ out)
        }
      }(Encoders.row(outSchema))
  }

  /** MACD (technical_indicators.py:83 add_macd): macd = EMA_fast−EMA_slow
    * masked to null before `slow` observations; signal = EMA(span=sig) of
    * the masked macd series (recursion seeded at the first non-null macd,
    * matching pandas ewm over a leading-NaN series); hist = macd − signal.
    */
  def withMacd(bars: DataFrame, fast: Int = 12, slow: Int = 26, sig: Int = 9,
               maxSeriesLen: Int = MaxFoldSeriesLen): DataFrame = {
    val (g0, others) = collectSeries(bars, maxSeriesLen)
    val aSig = s"(2.0D/${sig + 1})"
    val g = g0
      .withColumn("__ef", expr(emaFoldSql("closes", fast)))
      .withColumn("__es", expr(emaFoldSql("closes", slow)))
      .withColumn("__macd", expr("zip_with(__ef, __es, (f, s) -> f - s)"))
      .withColumn("__sig", expr(
        s"""aggregate(
           |  slice(__macd, ${slow + 1}, size(__macd) - $slow),
           |  array(element_at(__macd, $slow)),
           |  (acc, v) -> array_append(acc, $aSig * v + (1.0 - $aSig) * element_at(acc, -1)))""".stripMargin))
    val e = explodeSeries(g, others, Seq("__macd", "__sig"))
    e.withColumn("macd",
        when(col("pos") >= slow - 1, element_at(col("__macd"), col("pos") + 1)))
      .withColumn("macd_signal",
        when(col("pos") >= slow + sig - 2, element_at(col("__sig"), col("pos") - slow + 2)))
      .withColumn("macd_hist", col("macd") - col("macd_signal"))
      .drop("col", "pos", "closes", "__macd", "__sig")
  }

  /** RSI (technical_indicators.py:62 add_rsi): rolling-mean smoothing
    * (the reference's choice — not Wilder's), rs = avg_gain/avg_loss with
    * zero-loss → null, plus the overbought/oversold/neutral signal.
    */
  def withRsi(bars: DataFrame, p: Int = 14): DataFrame = {
    val delta = col("close") - lag(col("close"), 1).over(byKey)
    val gain = when(delta.isNotNull, greatest(delta, lit(0.0)))
    val loss = when(delta.isNotNull, greatest(-delta, lit(0.0)))
    bars
      .withColumn("__gain", gain)
      .withColumn("__loss", loss)
      .withColumn("__ag", gatedAvg(col("__gain"), p))
      .withColumn("__al", gatedAvg(col("__loss"), p))
      .withColumn("rsi",
        lit(100.0) - lit(100.0) / (lit(1.0) + col("__ag") / nullif(col("__al"), lit(0.0))))
      .withColumn("rsi_signal",
        when(col("rsi") > 70, "overbought")
          .when(col("rsi") < 30, "oversold")
          .otherwise("neutral"))
      .drop("__gain", "__loss", "__ag", "__al")
  }

  /** Bollinger bands (technical_indicators.py:104): SMA ± k·stddev,
    * width, and 0–1 clipped band position.
    */
  def withBollinger(bars: DataFrame, p: Int = 20, k: Double = 2.0): DataFrame = {
    val middle = gatedAvg(col("close"), p)
    bars
      .withColumn("bb_middle", middle)
      .withColumn("__dev", gatedStd(col("close"), p))
      .withColumn("bb_upper", col("bb_middle") + lit(k) * col("__dev"))
      .withColumn("bb_lower", col("bb_middle") - lit(k) * col("__dev"))
      .withColumn("bb_width",
        (col("bb_upper") - col("bb_lower")) / nullif(col("bb_middle"), lit(0.0)))
      .withColumn("bb_position",
        least(greatest(
          (col("close") - col("bb_lower")) /
            nullif(col("bb_upper") - col("bb_lower"), lit(0.0)),
          lit(0.0)), lit(1.0)))
      .drop("__dev")
  }

  /** ATR + volatility (technical_indicators.py:136): true range is
    * high−low on the first bar (pandas rowwise max skips the NaN
    * prev-close terms), else max(h−l, |h−pc|, |l−pc|).
    */
  def withAtr(bars: DataFrame, p: Int = 20): DataFrame = {
    val pc = lag(col("close"), 1).over(byKey)
    val tr = when(pc.isNull, col("high") - col("low"))
      .otherwise(greatest(
        col("high") - col("low"),
        abs(col("high") - pc),
        abs(col("low") - pc)))
    bars
      .withColumn("__tr", tr)
      .withColumn("atr", gatedAvg(col("__tr"), p))
      .withColumn("close_std", gatedStd(col("close"), p))
      .withColumn("volatility_ratio", col("atr") / nullif(col("close"), lit(0.0)))
      .drop("__tr")
  }

  /** Volume metrics (technical_indicators.py:160): vol SMAs, ratio, OBV
    * (running sum of sign(Δclose)·volume, first direction = 0), VPT.
    */
  def withVolumeMetrics(bars: DataFrame): DataFrame = {
    val delta = col("close") - lag(col("close"), 1).over(byKey)
    val direction = coalesce(signum(delta), lit(0.0))
    bars
      .withColumn("vol_sma_10", gatedAvg(col("volume"), 10))
      .withColumn("vol_sma_20", gatedAvg(col("volume"), 20))
      .withColumn("volume_ratio", col("volume") / col("vol_sma_20"))
      .withColumn("obv", sum(direction * col("volume"))
        .over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("volume_price_trend", col("volume") * delta)
  }

  /** Returns & momentum (technical_indicators.py:175): daily pct/abs
    * change, cumulative return (close/first − 1, null on the first bar as
    * pandas cumprod leaves the seed NaN), momentum over k bars, and
    * month-to-date momentum (the reference's YTD, scaled to the corpus).
    */
  def withReturns(bars: DataFrame, horizons: Seq[Int] = Seq(5, 10)): DataFrame = {
    val prev = lag(col("close"), 1).over(byKey)
    val firstClose = first(col("close"))
      .over(byKey.rowsBetween(Window.unboundedPreceding, 0))
    val monthWin = Window
      .partitionBy(col(KeyCol), date_trunc("month", col(OrdCol)))
      .orderBy(col(OrdCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    // nullif on every denominator: a 0.0 close (present in the raw feed)
    // must yield NULL as in the DuckDB oracle, not an ANSI divide error.
    val withBase = bars
      .withColumn("daily_return_pct", col("close") / nullif(prev, lit(0.0)) - lit(1.0))
      .withColumn("daily_return_abs", col("close") - prev)
      .withColumn("cumulative_return",
        when(row_number().over(byKey) >= 2,
          col("close") / nullif(firstClose, lit(0.0)) - lit(1.0)))
      .withColumn("momentum_mtd",
        col("close") / nullif(first(col("close")).over(monthWin), lit(0.0)) - lit(1.0))
    horizons.foldLeft(withBase) { (df, h) =>
      df.withColumn(s"momentum_$h",
        col("close") / nullif(lag(col("close"), h).over(byKey), lit(0.0)) - lit(1.0))
    }
  }
}
