package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall seconds.
  *
  * Methodology (round 17 — kill-proof): the timed action is unchanged
  * (`df.count()`, min over warm passes per query, sorted name order;
  * cold section re-pays memoized chain builds), but artifact DELIVERY is
  * restructured. Rounds 15 AND 16 both produced `rc:124, parsed:null`
  * driver artifacts — the engine numbers existed but were printed only
  * after the final pass, so a wall-cap kill under co-tenant contention
  * (this host has measured 4–14x contended slowdowns, SCALE.md) erased
  * them. Two fixes:
  *
  *  1. INCREMENTAL EMISSION — after warmup and after EVERY timed pass
  *     (warm and cold) the current artifact line is printed (marked
  *     `"partial":"warmup"|"pass1"|...`) and BENCH_DETAIL.json is
  *     rewritten. The driver parses the LAST complete JSON line in the
  *     stdout tail, so a kill at any point after warmup still delivers a
  *     parsed payload; the final line is unmarked.
  *  2. WHOLE-WALL BUDGET — `SPARK_GRAFT_BENCH_BUDGET_S` (default 900 s)
  *     now bounds the wall from `main` entry INCLUDING warmup (it used
  *     to bound only the timed passes, leaving a 400 s unbudgeted warmup
  *     floor). Warmup and pass STARTS are deadline-guarded, and (round
  *     18) passes 2+ and every cold pass re-check the deadline BETWEEN
  *     queries — a contended stall truncates the pass (the partial pass
  *     still feeds the per-query min for the queries it completed) and
  *     the budget is never overrun by more than one query. Pass 1 is
  *     the ONE deliberately unguarded phase: it is the artifact's
  *     backbone — a query missing from the final `queries` map reads as
  *     dropped-from-bench downstream, which is strictly worse than a
  *     late line — so once started it always runs to completion. If
  *     warmup alone eats the budget the warmup-derived line is emitted
  *     and the run exits 0.
  *
  * The warmup itself is also ~3x cheaper: full runs only for the
  * [[coldNames]] chain queries (their memoized builds are the one-time
  * cost warm passes must not carry); every other query gets a PLAN-TOUCH
  * — with AQE off, `groupBy().count()` (the exact shape the timed
  * `df.count()` executes) is planned and its RDD lineage built, which
  * Janino-compiles every whole-stage-codegen span and builds broadcast
  * relations without submitting a result job. An actual partial RUN
  * (limit(1)) would NOT be cheap here: every declared query carries a
  * total ORDER BY, so limit(1) executes the whole plan.
  */
object Bench {
  /** The memoized-chain queries timed COLD (caches dropped before each):
    * the memoized dedup/graph/index chains push shared build cost into
    * warmup, so these queries' warm numbers hide a build the cold section
    * reports separately. DERIVABLE, not just curated: [[ColdDetect]]
    * recomputes the chain map empirically (invalidate-all → run → which
    * chains repopulated?) and fails on a stale entry or an unrepresented
    * chain, so the list can't silently rot as operators are added.
    * Queries that touch only an already-represented chain are
    * deliberately NOT listed (each cold sample re-pays the full rebuild;
    * 50+ rebuilds would blow the bench budget for no new information).
    * Per-entry rationale: dedup shingle/pair/label chain (q34/35/47/49/
    * 54), quantizer + codebook fits (q38/67/83/85 + q68's against-index),
    * iterative graph fixpoints (q84/87/88/98/101/112/125/131/220/155/
    * 168/132), rule mining (q102), co-occurrence mine (q115), BPE
    * merge-table fit + segmentation replay (q129/130), span/winnow/
    * standing-index builds (q231/237/242/245), memoized corpus stats
    * (q69), corpus-mix plan-build count (q63). */
  val coldNames: Seq[String] = Seq(
    "q34_dedup_ngram_jaccard", "q35_dedup_minhash_lsh",
    "q47_dedup_clusters", "q49_dedup_keep_best", "q54_passage_overlap",
    "q38_ann_ivf", "q67_semantic_dedup", "q68_minhash_against",
    "q83_ann_pq", "q85_ann_ivfpq", "q84_pagerank", "q87_pagerank_personalized",
    "q88_triangles", "q98_hits", "q101_label_propagation",
    "q102_association_rules", "q112_pagerank_weighted",
    "q115_cooccurrence_pmi", "q125_kcore", "q131_bfs_distance",
    "q220_harmonic_closeness", "q155_connected_components",
    "q168_shortest_path", "q132_link_predict", "q129_bpe_fit",
    "q130_bpe_encode", "q231_repeated_spans", "q237_decontam_spans",
    "q242_winnow_fingerprints", "q245_incremental_minhash",
    "q69_bm25_topk", "q63_mix_sources")
    .filter(SparkEntry.queries.contains)

  /** Deny exactly one known-benign message on one logger, leaving every
    * other message at that logger visible (vs Configurator.setLevel,
    * which mutes the whole logger and would hide a NEW warning class). */
  private def muteMessage(logger: String, substring: String): Unit = {
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.{Filter, LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.config.LoggerConfig
    import org.apache.logging.log4j.core.filter.AbstractFilter
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val deny = new AbstractFilter() {
      override def filter(event: LogEvent): Filter.Result =
        if (event.getMessage.getFormattedMessage.contains(substring))
          Filter.Result.DENY
        else Filter.Result.NEUTRAL
    }
    val lc =
      if (cfg.getLoggerConfig(logger).getName == logger)
        cfg.getLoggerConfig(logger)
      else {
        // no explicit config for this logger yet — create one that
        // inherits level + appenders from its parent (additive, null level)
        val fresh = new LoggerConfig(logger, null, true)
        cfg.addLogger(logger, fresh)
        fresh
      }
    lc.addFilter(deny)
    ctx.updateLoggers()
  }

  def main(args: Array[String]): Unit = {
    val tMain = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - tMain) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Keep the captured WARN tail a real signal channel: the 13 audited
    // bounded-input global-window queries (PlanSpec whitelist) each emit a
    // "No Partition Defined" WARN per run, and local-mode re-registration
    // emits "Block ... already exists" — hundreds of known-benign lines
    // that drown any NEW warning in the 2000-char tail the driver keeps
    // (the round-11 hint flood lesson). Silence exactly those two
    // MESSAGES, not the loggers: a blanket logger-level mute would also
    // swallow a DIFFERENT WindowExec/BlockManager warning from a future
    // unaudited query (the round-13 advice), so the filter is keyed on
    // the audited message text and everything else still surfaces.
    muteMessage("org.apache.spark.sql.execution.window.WindowExec",
      "No Partition Defined")
    muteMessage("org.apache.spark.storage.BlockManager",
      "already exists on this machine")
    val names = SparkEntry.queries.keys.toSeq.sorted
    // WHOLE-wall budget, default 900 s: the driver's cap is ~3600 s and
    // this host has measured contended slowdowns of 4–14x, so the quiet
    // wall must stay well under a quarter of the cap for the full
    // schedule to survive contention — and when it doesn't, the deadline
    // guards below degrade the schedule instead of overrunning.
    val budgetS = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_S")
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(900.0)
    def remaining: Double = budgetS - elapsed
    // a query that THROWS must be visible, not a normal-looking elapsed
    // time: q163 crashed at sf0.1 for a round (ANSI long overflow) with
    // zero bench signal because the catch swallowed it
    val failed = scala.collection.mutable.SortedSet.empty[String]
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => failed += name }
      (System.nanoTime() - t0) / 1e9
    }
    // fixed-work calibration probe: an in-memory aggregate whose cost is
    // independent of sf and of the query set, timed at session start,
    // mid-session and at session end. Same-code probe times disagreeing
    // means ambient machine load moved DURING the run — round 13 lost its
    // headline to exactly that, and the probe makes the artifact
    // self-adjudicating instead of leaving the judge to diff per-query
    // medians across rounds. ~1s of fixed work: long enough that
    // scheduler jitter can't fake a >15% probe disagreement.
    val calibN = 4500000000L
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, calibN, 1L, cpus.toInt)
        .selectExpr("sum(id % 1000003) AS s").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // 1-min system load average (bench included) — read alongside the
    // probes: probes say "this JVM's fixed work got slower", load says
    // "the box had other work". Both in the artifact = self-adjudicating.
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage

    // ------------------------------------------------------------------
    // Emission: all state the artifact is built from, mutated as phases
    // complete; emit() serialises the CURRENT state. Called after warmup
    // and after every pass so a kill at any later second still leaves a
    // complete, parseable line in the stdout tail (and a fresh
    // BENCH_DETAIL.json on disk).
    // ------------------------------------------------------------------
    val warmPasses = scala.collection.mutable.ArrayBuffer.empty[Map[String, Double]]
    val passWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
    val coldPassList = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, Double)]]
    val warmupWalls = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var warmupS = 0.0
    var touchedN = 0
    val probes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val loads = scala.collection.mutable.ArrayBuffer.empty[Double]
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def f2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def jmap(m: Seq[(String, Double)], f: Double => String): String =
      m.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    def spreadOf(ps: Seq[Map[String, Double]]): Double = {
      val ts = ps.map(_.values.sum)
      if (ts.isEmpty) 1.0 else ts.max / math.max(ts.min, 1e-9)
    }
    def probeDisagree(a: Double, b: Double): Boolean =
      math.max(a, b) / math.max(math.min(a, b), 1e-9) > 1.15
    val detailPath = "BENCH_DETAIL.json"
    def shortKey(n: String): String = n.indexOf('_') match {
      case -1 => n
      case i  => n.substring(0, i)
    }
    /** Build the artifact from current state; write the detail file and
      * print the stdout line. `partial=None` marks the final emission. */
    def emit(partial: Option[String]): Unit = {
      val passes = warmPasses.toSeq
      // before any timed pass the only per-query walls are the warmup's
      // chain full-runs: a last-resort payload, clearly marked "warmup".
      // Passes 2+ may be TRUNCATED by the mid-pass deadline guard, so the
      // per-query min runs over the passes that contain the query; pass 1
      // is complete by design, so every name always has a value.
      val results: Seq[(String, Double)] =
        if (passes.nonEmpty)
          names.flatMap { n =>
            val vs = passes.flatMap(_.get(n))
            if (vs.nonEmpty) Some(n -> vs.min) else warmupWalls.get(n).map(n -> _)
          }
        else warmupWalls.toSeq.sortBy(_._1)
      val coldPasses = coldPassList.toSeq
      val coldByName = coldPasses.map(_.toMap)
      // cold passes are truncatable too: report the queries at least one
      // cold pass completed (cold is supplementary — the headline is warm)
      val cold = coldNames.flatMap { n =>
        val vs = coldByName.flatMap(_.get(n))
        if (vs.nonEmpty) Some(n -> vs.min) else None
      }
      val coldMax = coldNames.flatMap { n =>
        val vs = coldByName.flatMap(_.get(n))
        if (vs.nonEmpty) Some(n -> vs.max) else None
      }
      val total = results.map(_._2).sum
      val coldTotal = cold.map(_._2).sum
      val passTotals = passes.map(_.values.sum).map(f3).mkString("[", ",", "]")
      val coldPassTotals = coldPasses.map(_.map(_._2).sum).map(f3)
        .mkString("[", ",", "]")
      // warm-pass max/min ratio: >~1.3 means a contended run — read the
      // per-pass totals before believing any regression. Computed over
      // COMPLETE passes only: a truncated pass's smaller total is a
      // schedule artifact, not contention evidence.
      val fullPasses = passes.filter(_.size == names.size)
      val passSpread = f3(spreadOf(fullPasses))
      val calib = probes.map(f3).mkString("[", ",", "]")
      val loadsJ = loads.map(f2).mkString("[", ",", "]")
      val contended = spreadOf(fullPasses) > 1.15 ||
        (probes.nonEmpty && probeDisagree(probes.max, probes.min))
      val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      // self-describing schedule: how many passes actually ran, against
      // what whole-wall budget, how the warmup was split (full chain runs
      // vs plan-touches) and the wall so far — a reduced run (contended
      // box) is distinguishable from a full one without archaeology
      val truncated = passes.count(_.size != names.size) +
        coldPasses.count(_.size != coldNames.size)
      val sched = s"""{"budget_s":${f3(budgetS)},"warmup_s":${f3(warmupS)},"chain_warm":${warmupWalls.size},"touched":$touchedN,"warm_passes":${passes.size},"cold_passes":${coldPasses.size},"truncated_passes":$truncated,"wall_s":${f3(elapsed)}}"""
      val part = partial.map(p => s""","partial":"$p"""").getOrElse("")
      val detail = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":${jmap(results, f3)},"cold":${jmap(cold, f3)},"cold_max":${jmap(coldMax, f3)},"pass_totals":$passTotals,"cold_pass_totals":$coldPassTotals,"pass_spread":$passSpread,"calibration_s":$calib,"load_avg":$loadsJ,"contended":$contended,"sched":$sched,"failed":$failedJson$part,"sf":"$sfDir"}"""
      try java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
        (detail + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () }
      // The driver captures only the LAST 2000 chars of stdout and parses
      // the last complete JSON line out of that tail — rounds 6/7
      // overflowed it (parsed: null) once the query map passed ~100
      // entries. Full-precision detail goes to the file; stdout gets a
      // line guaranteed to fit, degrading per-query keys
      // ("q75_interval_overlap" -> "q75") and, if even that overflows,
      // keeping only the slowest entries.
      def line(qs: Seq[(String, Double)], omitted: Int): String = {
        val omit = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
        val fl = if (failed.isEmpty) "" else s""","failed":$failedJson"""
        s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":${jmap(qs, f2)}$omit,"cold_total":${f3(coldTotal)},"pass_totals":$passTotals,"cold_pass_totals":$coldPassTotals,"pass_spread":$passSpread,"calibration_s":$calib,"load_avg":$loadsJ,"contended":$contended,"sched":$sched$fl$part,"detail":"$detailPath","sf":"$sfDir"}"""
      }
      val shortAll = results.map { case (k, v) => shortKey(k) -> v }
      val bySlow = shortAll.sortBy(-_._2)
      val candidates = Iterator(line(shortAll, 0)) ++
        Iterator(60, 30, 10, 0).map(n =>
          line(bySlow.take(n).sortBy(_._1), shortAll.size - n))
      val out = candidates.find(_.length <= 1900)
        .getOrElse(line(Nil, shortAll.size))
      println(out)
    }

    // ------------------------------------------------------------------
    // Warmup. Full runs ONLY for the cold-chain queries (their memoized
    // builds are what later passes must find warm); a plan-touch for the
    // other ~240. The touch plans the exact count() shape the timed
    // action executes and calls executedPlan.execute() with AQE off:
    // that builds the RDD lineage — Janino-compiling every whole-stage-
    // codegen span and building broadcast relations — but submits no
    // result job (with AQE ON the same call would materialise every
    // shuffle stage, i.e. run the query). Deadline-guarded per query so
    // a contended box degrades to fewer warm queries, never to rc:124.
    // ------------------------------------------------------------------
    calibrate() // untimed: JIT + codegen warmup of the probe itself
    val warmupT0 = System.nanoTime()
    val coldSet = coldNames.toSet
    coldNames.foreach { n =>
      if (remaining > 0.55 * budgetS) warmupWalls(n) = runOne(n)
    }
    // Touches are driver-side work (Catalyst + Janino, ~0.5 s/query
    // single-threaded — 240 queries would cost ~2 min sequentially) that
    // submits no result jobs, so they parallelise across a small pool;
    // the AQE-off window covers the whole pool (every touch wants it
    // off, and memoized-chain lookups key on THIS session, so a cloned
    // per-thread session would miss the chains just built above and
    // rebuild them). Each task re-checks the deadline so a contended box
    // degrades to fewer warm queries, never to rc:124.
    locally {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val touched = new java.util.concurrent.atomic.AtomicInteger(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val tasks = names.filterNot(coldSet).map { n =>
          pool.submit(new Runnable {
            def run(): Unit = if (remaining > 0.45 * budgetS) {
              try SparkEntry.queries(n)(spark, sfDir)
                .groupBy().count().queryExecution.executedPlan.execute()
              catch { case _: Throwable => () }
              touched.incrementAndGet()
            }
          })
        }
        tasks.foreach(t => try t.get() catch { case _: Throwable => () })
      } finally {
        pool.shutdown()
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      touchedN = touched.get()
    }
    warmupS = (System.nanoTime() - warmupT0) / 1e9
    // warmup-only failures are not timed-pass failures: a query that fails
    // in every TIMED pass re-enters the set below; one that only failed
    // during warmup (e.g. a racing fixture) must not be reported as failed
    failed.clear()
    loads += loadAvg()
    probes += calibrate()
    emit(Some("warmup"))

    // ------------------------------------------------------------------
    // Timed warm passes: always 1; a 2nd for min-of-N and the spread
    // when it fits; a 3rd when it AND the planned cold section fit; an
    // escalation pass when the spread or probes disagree (taken BEFORE
    // the cold section, which drops the memoized chains — a pass taken
    // after those drops re-pays the chain builds and poisons the spread
    // it was meant to adjudicate).
    // ------------------------------------------------------------------
    def runPass(): Unit = {
      val t0 = System.nanoTime()
      // pass 1 always runs to completion (the artifact's backbone: a name
      // missing from `queries` reads as dropped-from-bench downstream);
      // passes 2+ re-check the whole-wall deadline between queries and
      // truncate instead of overrunning (budget excess ≤ 1 query).
      val truncatable = warmPasses.nonEmpty
      val acc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      var cut = false
      for (n <- names if !cut) {
        if (truncatable && remaining <= 0) cut = true
        else acc(n) = runOne(n)
      }
      warmPasses += acc.toMap
      // a truncated pass must not feed the pass-wall estimate the
      // schedule gates divide by
      if (!cut) passWalls += (System.nanoTime() - t0) / 1e9
      emit(Some(s"pass${warmPasses.size}"))
    }
    // pass-1 gate (ADVICE r17): warmupS is dominated by the cheap
    // plan-touches since the round-17 warmup restructure, so it badly
    // underestimates a full pass; the 32 chain queries' cold walls are
    // the better same-run estimate (measured ≈ 0.7–1.1× a full warm
    // pass — the chains are the slowest queries and cold at that).
    val pass1Est = math.max(warmupWalls.values.sum, warmupS - warmupWalls.values.sum)
    if (remaining < pass1Est && warmupWalls.nonEmpty) {
      // contention ate the whole budget during warmup: the warmup-derived
      // line is the artifact — exit 0 cleanly rather than overrun
      spark.stop()
      emit(Some("warmup"))
      return
    }
    runPass()
    def avgWarm: Double = passWalls.sum / passWalls.size
    // cold-pass estimate: the 32 cold queries re-pay their chain rebuilds
    // ≈ 0.85x a steady warm pass (the committed BENCH_DETAIL ratio with
    // headroom — actual cold passes run ~0.5x, so this over-reserves).
    def coldEst: Double = 0.85 * avgWarm
    // pass 2 is the most valuable remaining work (the headline is the
    // warm min-of-N; a single-pass warm number is contention-hostage) so
    // it reserves nothing for the cold section; pass 3 must leave room
    // for the full planned cold section
    // min-of-N and spread decisions count only COMPLETE passes (a
    // truncated pass contributes per-query mins but is not a sample of
    // the pass wall)
    def fullWarm: Seq[Map[String, Double]] =
      warmPasses.toSeq.filter(_.size == names.size)
    if (remaining > avgWarm) runPass()
    if (fullWarm.size >= 2 && remaining > avgWarm + 2 * coldEst)
      runPass()
    probes += calibrate()
    if (fullWarm.size >= 2 &&
        (spreadOf(fullWarm) > 1.15 ||
         probeDisagree(probes.head, probes.last)) &&
        remaining > avgWarm + 2 * coldEst)
      runPass()

    // ------------------------------------------------------------------
    // Cold passes: min per query over up to two passes (a single cold
    // sample is hostage to driver contention — r8 reported q84 cold at
    // 13.4s where an isolated run measures 2.8s; the per-query max is
    // kept in the detail file so a contended run is self-evident).
    // ------------------------------------------------------------------
    def coldPass(): Unit = {
      // every cold pass re-checks the deadline between queries: cold is
      // supplementary (the headline is warm), so truncating is always
      // preferable to overrunning the whole-wall budget
      val r = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      var cut = false
      for (name <- coldNames if !cut) {
        if (remaining <= 0) cut = true
        else {
          graft.operators.Text.invalidateCaches(spark, sfDir)
          val q0 = System.nanoTime()
          try SparkEntry.queries(name)(spark, sfDir).count()
          catch { case _: Throwable => failed += name }
          r += (name -> (System.nanoTime() - q0) / 1e9)
        }
      }
      coldPassList += r.toSeq
      emit(Some(s"cold${coldPassList.size}"))
    }
    // 0.5x: the measured steady cold/warm pass ratio (r16 committed
    // detail: 112.6/209.6) — coldEst's 0.85x padding is for RESERVING
    // ahead of a warm pass, not for gating the cold attempt itself
    if (remaining > 0.5 * avgWarm) coldPass()
    val cold1S = coldPassList.lastOption.map(_.map(_._2).sum).getOrElse(0.0)
    if (coldPassList.size == 1 && remaining > cold1S) coldPass()

    // end-of-session probe: closes the ambient-load story over the WHOLE
    // run (warmup + warm + escalation + cold). The contended flag is true
    // if the warm passes disagreed or ANY probe pair disagreed — a reader
    // never mistakes ambient load for a regression (nor a quiet rerun for
    // an improvement).
    probes += calibrate()
    loads += loadAvg()
    // stop Spark BEFORE the final emission so no shutdown logging can
    // interleave after it — the driver parses the LAST complete JSON line
    // from the stream tail
    spark.stop()
    emit(None)
  }
}
