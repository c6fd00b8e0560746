package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of wall-times.
  *
  * Each query is materialized through the noop sink so the full plan
  * (windows, folds, final sort) executes — a bare `count()` lets Catalyst
  * prune unreferenced projections and under-measures indicator work.
  * Failures are recorded as -1 (and logged), never as a fast success.
  *
  * Regression gate: BASELINE.md's fenced `baseline` block freezes the
  * best demonstrated per-query time at sf0.1. A query slower than
  * drift × max(2 × baseline, baseline + 1 s) is a SUSPECT, where
  * `drift` is the run-wide median of time/baseline clamped to ≥1 —
  * ambient machine slowdown moves every query together and must not
  * trip a per-query gate (round 3 drifted 1.33× globally with zero code
  * change and rc=2'd three untouched queries). Suspects are then
  * re-timed in steady state — once, and on a second GC-settled probe
  * if the first also reads over — and only CONFIRMED regressions
  * (every re-probe over threshold) fail the run (rc=2), AFTER the JSON
  * line prints so the driver's parse survives a gated round. The JSON
  * publishes min(measurement, re-probes) per query plus a `reprobes`
  * map recording the numbers, the per-suspect gate threshold and the
  * verdict — the artifact never shows a transient the gate cleared
  * without proof beside it.
  * Armed only on the sf0.1 testdata; `SPARK_GRAFT_BASELINE=off` skips.
  */
object Bench {
  /** name → frozen seconds, from BASELINE.md's ```baseline fence. */
  def loadBaseline(path: String = "BASELINE.md"): Map[String, Double] = {
    val f = new java.io.File(path)
    if (!f.exists()) return Map.empty
    val lines = scala.io.Source.fromFile(f)(scala.io.Codec.UTF8)
    try {
      lines.getLines()
        .dropWhile(!_.startsWith("```baseline")).drop(1)
        .takeWhile(!_.startsWith("```"))
        .flatMap { l =>
          l.trim.split("\\s+") match {
            case Array(name, secs) => secs.toDoubleOption.map(name -> _)
            case _ => None
          }
        }.toMap
    } finally lines.close()
  }

  def regressionThreshold(base: Double): Double = math.max(2 * base, base + 1.0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed steady-state warmup: JIT, codegen cache, parquet footers.
    // Without it the alphabetically-first query absorbs several seconds
    // of one-time JVM cost and the per-query numbers lie.
    graft.sources.Tables.all.foreach { t =>
      try {
        (if (t == "events") graft.sources.Tables.events(spark, sfDir)
         else graft.sources.Tables.load(spark, sfDir, t)).count()
      } catch { case _: Throwable => () }
    }
    var failures = 0
    // Two passes, report the per-query minimum: steady-state numbers,
    // not first-run codegen compilation. A failure in either pass is a
    // failure.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    def timeThunk(name: String, mk: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          failures += 1
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
      } finally
        // Several operators persist() intermediates they cannot safely
        // unpersist themselves (the caller owns the returned frame's
        // lifetime). In a 60+ query shared JVM those leak and one query's
        // cache pressure degrades another's timing — drop them between
        // measurements so every query starts from the same storage state.
        spark.catalog.clearCache()
    }
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      timeThunk(name, () => fn(spark, sfDir))
    // Optional name filter (local profiling: `runMain graft.Bench q1,q2`);
    // a filtered run never arms the regression gate.
    val only = args.headOption.map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Report-over-frame twins (r7 item 8): setup runs UNTIMED (builds +
    // eagerly checkpoints the upstream frame); the thunk timed below is
    // the report alone, so the artifact splits pipeline cost from
    // report cost. localCheckpoint frames survive clearCache().
    // A setup failure must surface as that row's -1, never crash the
    // run before the JSON line prints (the driver parses it even on a
    // gated round) — the failing thunk reports through timeThunk's
    // existing catch.
    val reportFns: Seq[(String, () => org.apache.spark.sql.DataFrame)] =
      graft.operators.LlmQueries.reportQueries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.forall(_.contains(n)) }
        .map { case (n, setup) =>
          n -> (try setup(spark, sfDir) catch {
            case e: Throwable =>
              System.err.println(s"[bench] $n setup FAILED: ${e.getMessage}")
              () => throw new RuntimeException(s"report setup failed: ${e.getMessage}", e)
          })
        }
    // In a full run the 60+ earlier queries amortize JVM/codegen warmup;
    // a filtered run has no such cushion and its first timed pass reads
    // 1.5–2× hot (observed repeatedly) — warm each selected query once
    // untimed so solo numbers are comparable to in-run ones.
    if (only.isDefined) selected.foreach { case (name, fn) => timeOnce(name, fn) }
    failures = 0
    val results = selected.map { case (name, fn) =>
      val times = (1 to passes).map(_ => timeOnce(name, fn))
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    } ++ reportFns.map { case (name, thunk) =>
      val times = (1 to passes).map(_ => timeThunk(name, thunk))
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val baseline = loadBaseline()
    // Run-wide drift: median of time/baseline over baselined queries,
    // clamped to ≥1 (a fast environment never tightens the gate). Printed
    // in the JSON line so every round records how hot the machine ran.
    val ratios = results.collect {
      case (n, t) if t >= 0 && baseline.contains(n) => t / baseline(n)
    }.sorted
    // Clamp [1, 1.5]: a fast environment never tightens the gate, and a
    // genuine run-wide regression (shared helper / session config / table
    // loader touching every query) must not inflate drift without bound
    // and gate-proof itself — past 1.5× the slowdown is treated as code.
    val rawDrift = if (ratios.isEmpty) 1.0 else ratios(ratios.size / 2)
    val drift = math.min(1.5, math.max(1.0, rawDrift))
    if (rawDrift > 1.5)
      System.err.println(
        f"[bench] WARNING run-wide drift $rawDrift%.2f exceeds the 1.5 cap — " +
          "either the machine is badly loaded or a shared-path change slowed everything")
    val mainFailures = failures
    val gateArmed = mainFailures == 0 && only.isEmpty && sfDir.contains("sf0.1") &&
      !sys.env.get("SPARK_GRAFT_BASELINE").contains("off")
    def over(name: String, t: Double): Boolean =
      t > drift * regressionThreshold(baseline(name))
    // Reproduce-before-fail: a one-off scheduler/GC hiccup in a 60+
    // query shared-JVM run must not read as a code regression. Suspects
    // re-time BEFORE the JSON is built so the artifact publishes the
    // number the gate judged — min(measurement, re-probes) — with the
    // re-probes themselves beside it in a machine-readable `reprobes`
    // map (round-5 verdict: the artifact showed 5× transients the gate
    // had already cleared, with no way to tell them from real
    // regressions). Each re-probe runs GC-settled (round-6 lesson: the
    // two "confirmed" regressions were adjacent in run order and their
    // re-probes ran back-to-back into the same heap churn — a re-probe
    // that inherits the previous query's garbage is not steady state),
    // and a suspect gets a SECOND settled re-probe before it can
    // confirm: under the burst noise the r6 artifact records (ind_macd
    // 9.08 s measured, 0.89 s re-probed — a 10× ambient spike on
    // untouched code), one unlucky re-probe must not fail the round,
    // while a real regression fails every probe anyway. The map also
    // publishes the gate's per-suspect `threshold`
    // (drift × max(2×baseline, baseline+1s)) so a red artifact is
    // self-explaining without BASELINE.md in hand.
    final case class Reprobe(name: String, t: Double, t2: Double,
                             t3: Option[Double], confirmed: Boolean)
    val reportFnMap = reportFns.toMap
    def reprobeOnce(name: String): Double =
      reportFnMap.get(name) match {
        case Some(thunk) => timeThunk(name, thunk)
        case None => timeOnce(name, SparkEntry.queries(name))
      }
    def settledTime(name: String): Double = {
      System.gc(); Thread.sleep(200); System.gc()
      reprobeOnce(name)
    }
    val reprobes: Seq[Reprobe] =
      if (!gateArmed) Seq.empty
      else results.collect {
        case (name, t) if t >= 0 && baseline.contains(name) && over(name, t) =>
          val t2 = reprobeOnce(name)
          val t2Clear = t2 >= 0 && !over(name, t2)
          val t3 = if (t2Clear) None else Some(settledTime(name))
          val confirmed = !t2Clear && !t3.exists(v => v >= 0 && !over(name, v))
          if (!confirmed)
            System.err.println(
              f"[bench] transient slowdown $name: ${t}%.2fs, re-probes ${t2}%.2fs/${t3.fold("-")(v => f"$v%.2fs")} (baseline ${baseline(name)}%.2fs, drift $drift%.2f) — not gated")
          Reprobe(name, t, t2, t3, confirmed)
      }
    val reprobeMap = reprobes.map(r => r.name -> r).toMap
    val published = results.map { case (n, t) =>
      n -> (reprobeMap.get(n) match {
        case Some(r) =>
          (Seq(t, r.t2) ++ r.t3.toSeq).filter(_ >= 0) match {
            case Seq() => t
            case ok => ok.min
          }
        case _ => t
      })
    }
    val qs = published.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rp = reprobes.map { r =>
      val thr = drift * regressionThreshold(baseline(r.name))
      val t3s = r.t3.fold("")(v => s""","reprobe2":$v""")
      f""""${r.name}":{"time":${r.t},"reprobe":${r.t2}$t3s,"threshold":$thr%.3f,"suspect":true,"confirmed":${r.confirmed}}"""
    }.mkString("{", ",", "}")
    val total = published.collect { case (_, v) if v >= 0 => v }.sum
    val jsonLine =
      f"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reprobes":$rp,"failures":$mainFailures,"drift":$drift%.3f,"raw_drift":$rawDrift%.3f,"sf":"$sfDir"}"""
    println(jsonLine)
    // The driver's capture lost the JSON line on both gated rounds (r3,
    // r4 record `parsed: null`) — persist it to a file too, and re-print
    // it as the very last stdout line after the gate decides, so a rc!=0
    // exit still leaves parseable numbers. FULL runs only: a filtered
    // profiling run must not clobber the suite-wide artifact with a
    // partial total (that happened — three round-8 seeding runs each
    // overwrote the 100-query snapshot).
    if (only.isEmpty) try {
      val w = new java.io.PrintWriter("bench_result.json", "UTF-8")
      try w.println(jsonLine) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write bench_result.json: ${e.getMessage}")
    }
    def finalReport(): Unit = println(jsonLine)
    spark.stop()
    if (mainFailures > 0) { finalReport(); sys.exit(1) }
    val confirmed = reprobes.collect { case r if r.confirmed =>
      f"${r.name}: ${r.t}%.2fs, re-probes ${r.t2}%.2fs/${r.t3.fold("-")(v => f"$v%.2fs")} vs baseline ${baseline(r.name)}%.2fs (drift $drift%.2f)"
    }
    if (confirmed.nonEmpty) {
      confirmed.foreach(r => System.err.println(s"[bench] REGRESSION $r"))
      finalReport()
      sys.exit(2)
    }
    finalReport()
  }
}
