package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}. Results are
  * materialized with a noop-format write — unlike count(), that executes
  * the full plan (all columns, final sort) without touching disk.
  *
  * Timeout-proofing (rounds 7/8 both ended rc=124 with NO bench signal):
  *  - `bench_out.json` is rewritten after EVERY timed query run, so a
  *    SIGKILL at any point leaves a complete, parseable file holding the
  *    minima over whatever passes finished ("passes": N, "partial": true
  *    while the run is still live).
  *  - a wall-clock budget (SPARK_GRAFT_BENCH_BUDGET seconds, default 600,
  *    measured from process start) stops further reps early and prints
  *    the final stdout line BEFORE any external timeout can fire. The
  *    budget is checked before each query run, so an overrun is bounded
  *    by one query, not one pass.
  *  - a PER-QUERY watchdog (SPARK_GRAFT_BENCH_CAP seconds, default 20;
  *    adaptively 4× the query's previous recorded time when that is
  *    larger) cancels a run's job group past the cap: rounds 17/18 both
  *    lost 20-50% of the budget to a handful of one-shot cold spikes
  *    (44-120 s on queries that measure ~1 s warm), which is why no
  *    driver artifact ever contained a complete pass. Capped samples are
  *    reported as lower bounds in "capped", never as timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val wallStart = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - wallStart) / 1e9
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "600").toDouble
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm each query once at the smallest SF before timing it at the
    // target SF: Janino whole-stage-codegen compilation is a one-shot
    // cost (measured up to 10 s on the widest generated aggregates) that
    // would otherwise be billed to whichever query runs first with a
    // given code shape. The generated-class cache is keyed on source, so
    // the warm run at sf0.001 compiles what the timed run reuses.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    // PER-QUERY WATCHDOG (round 18: four single-query cold spikes of
    // 44-120 s — vs 0.8-1.2 s warm — ate 320 of the 600 s driver budget,
    // and after six rounds the artifact had still never recorded a
    // complete pass). Each run executes in a daemon thread under its own
    // job group; past the cap the group is cancelled and the sample
    // recorded as CAPPED (a lower bound, never a fake timing), so one
    // spike costs the budget capSec, not two minutes, and min-of-N gets
    // its later passes. A thread stuck where cancellation cannot reach
    // (Janino compile runs driver-side before any job exists) is left to
    // die as a daemon; its group is re-cancelled before every later run
    // so late-submitted jobs die too.
    val capBase = sys.env.getOrElse("SPARK_GRAFT_BENCH_CAP", "20").toDouble
    val zombieGroups = scala.collection.mutable.Set.empty[String]
    /** (ok, capped, seconds). `ok=false` only on a REAL failure — a
      * cancelled run reports (true, capped=true, cap). */
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                dir: String, name: String, capSec: Double): (Boolean, Boolean, Double) = {
      zombieGroups.foreach(g =>
        try spark.sparkContext.cancelJobGroup(g) catch { case _: Throwable => () })
      val group = s"bench-$name-${System.nanoTime()}"
      @volatile var ok = true
      @volatile var err: String = null
      val done = new java.util.concurrent.CountDownLatch(1)
      val worker = new Thread(() => {
        try {
          spark.sparkContext.setJobGroup(group, s"bench $name", true)
          fn(spark, dir).write.format("noop").mode("overwrite").save()
        } catch { case e: Throwable => ok = false; err = String.valueOf(e.getMessage) }
        finally done.countDown()
      }, group)
      worker.setDaemon(true)
      val t0 = System.nanoTime()
      worker.start()
      val finished = done.await(math.max(1L, (capSec * 1000).toLong),
        java.util.concurrent.TimeUnit.MILLISECONDS)
      val dt = (System.nanoTime() - t0) / 1e9
      val capped = !finished
      if (capped) {
        System.err.println(f"[bench] $name capped at $capSec%.0f s on $dir — cancelling job group")
        try spark.sparkContext.cancelJobGroup(group) catch { case _: Throwable => () }
        worker.interrupt()
        // short grace so an already-running job unwinds before the next
        // query's timing window opens; past it the daemon thread is a
        // zombie whose group gets re-cancelled on every later run
        if (!done.await(2000, java.util.concurrent.TimeUnit.MILLISECONDS))
          zombieGroups += group
      } else if (!ok && err != null) {
        System.err.println(s"[bench] $name failed on $dir: $err")
      }
      // the dedup operators persist() intermediates; drop them so caches
      // don't accumulate across 40+ queries and GC-churn the tail
      spark.catalog.clearCache()
      // clearCache() only drops catalog-cached plans; localCheckpoint()ed
      // RDDs (the dedup/cluster operators' lineage truncation) keep their
      // blocks until the ContextCleaner GCs them — across 60+ queries that
      // is enough block-manager pressure to slow unrelated neighbors
      // (round-3 bench: l1/l20/l21/l22 2.8-3.6x their quiet-box timings).
      // The run's result frame is discarded here, so dropping its blocks
      // eagerly is safe.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (ok || capped, capped, dt)
    }
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json")
    // CHEAPEST-FIRST pass order when a previous run's file copy is
    // readable (the env-named path, else the repo-committed copy):
    // under a wall-clock budget the cut then truncates the EXPENSIVE
    // tail, not the lexicographic tail — round 17's driver run timed
    // 84/199 because the budget fired mid-alphabet while the priciest
    // queries sat unmeasured. Queries with no previous number (new
    // this round, or -1 failures) assume 1.0 s — mid-pack, so they
    // still get timed before the known-expensive tail.
    val prevTimes: Map[String, Double] = {
      val re = "\"([A-Za-z0-9_]+)\":(-?[0-9][0-9.]*)".r
      Seq(outPath, "/root/repo/bench_out.json").distinct.iterator.flatMap { p =>
        try {
          val s = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8)
          val tag = "\"queries\":{"
          val start = s.indexOf(tag)
          val end = if (start < 0) -1 else s.indexOf('}', start)
          if (start < 0 || end < 0) None
          else {
            val m = re.findAllMatchIn(s.substring(start + tag.length, end))
              .map(x => x.group(1) -> x.group(2).toDouble).toMap
            if (m.nonEmpty) Some(m) else None
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }.nextOption().getOrElse(Map.empty)
    }
    val ordered = {
      val base = SparkEntry.queries.toSeq.sortBy(_._1)
      if (prevTimes.isEmpty) base
      else base.sortBy { case (n, _) =>
        (prevTimes.get(n).filter(_ >= 0).getOrElse(1.0), n) }
    }
    // r18's bucketed-table CTAS is one-time-per-(session, dir) prep —
    // do it here so no timed rep (and not even warmup rep 1) pays the
    // two table writes inside its measurement window
    try {
      graft.queries.RelationalQueries.ensureBucketedTables(spark, warmDir)
      graft.queries.RelationalQueries.ensureBucketedTables(spark, sfDir)
      // one-shot native/class-init costs (zstd-jni JNI load, xz and
      // commons-compress class graphs) belong to prep, not to whichever
      // archive-ingest query happens to run first
      graft.sources.Tar.warmCodecs()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] prep failed: ${e.getMessage}")
    }
    // best-of-N (default 5): single-shot timings on a shared box are
    // noisy (observed 3-10x spikes from transient load — round 2's driver
    // run recorded t9 at 6.7 s where 4 quiet reps measure 0.84 s); the
    // minimum is the standard way to report the query's actual cost, and
    // 5 reps makes it robust to a spike streak.
    // Reps run as ROUND-ROBIN PASSES (all queries rep 1, then rep 2, …),
    // not back-to-back per query: the box's load transients last minutes,
    // so 5 consecutive reps of one query can ALL fall inside one spike
    // (round 6: r16 recorded min 37.5 s across 5 reps where a quiet box
    // measures 0.6 s). Round-robin spreads a query's 5 samples across 5
    // separate time windows — a transient now poisons at most one sample
    // per query, which min-of-N discards.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val failed = scala.collection.mutable.Set.empty[String]
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    // queries whose runs hit the watchdog cap, with the cap they hit:
    // a later un-capped pass promotes them into `times`; a query that
    // NEVER finished under its cap reports the cap as a lower bound and
    // is named in the "capped" list so no reader mistakes it for a
    // steady-state number
    val cappedAt = scala.collection.mutable.Map.empty[String, Double]
    // explicit-locale formatting: the f-interpolator honors the JVM default
    // locale, and a comma-decimal locale would emit invalid JSON
    def fmt(d: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    // Render the full result from whatever samples exist right now. A
    // query with zero samples (budget hit before its first timed rep)
    // goes to "skipped", not to the queries map — a real number there
    // would be a lie and -1 is reserved for genuine failures.
    def render(passes: Int, partial: Boolean): (String, String) = {
      val results = ordered.map { case (name, _) =>
        // a failed query must not masquerade as a fast one: report -1 so
        // the driver (and a human) sees the hole instead of a bogus
        // timing; an always-capped query reports its cap (a truthful
        // lower bound, named in "capped" below). A query with a GOOD
        // earlier-pass sample keeps it even if a later pass errors
        // (observed: an external SIGTERM mid-pass-2 shut the context
        // down under 22 in-flight queries and the -1s discarded their
        // valid pass-1 timings); the "errors" list still names it.
        (name, if (failed(name) && times(name).isEmpty) -1.0
               else if (times(name).nonEmpty) times(name).min
               else cappedAt.getOrElse(name, Double.NaN),
         failed(name) && times(name).isEmpty, times(name))
      }
      val measured = results.filter { case (_, v, f, _) => f || !v.isNaN }
      val skipped = results.collect { case (k, v, false, _) if v.isNaN => "\"" + k + "\"" }
        .mkString("[", ",", "]")
      val cappedNames = results.collect {
        case (k, _, false, ts) if ts.isEmpty && cappedAt.contains(k) => "\"" + k + "\""
      }.mkString("[", ",", "]")
      val cappedCount = results.count { case (k, _, f, ts) =>
        !f && ts.isEmpty && cappedAt.contains(k) }
      val qs = measured.map { case (k, v, _, _) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      // all rep timings in run order, so the next reader can separate a
      // transient spike (one bad rep) from a real regression (all reps
      // high) without re-running the bench
      val spread = measured.map { case (k, _, _, ts) =>
        "\"" + k + "\":" + ts.map(fmt).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      // errors name EVERY query that failed on ANY pass — including one
      // that kept a good earlier-pass timing (its value stays the valid
      // minimum, but the failure must not be hidden as a clean run)
      val errors = ordered.collect { case (k, _) if failed(k) => "\"" + k + "\"" }
        .mkString("[", ",", "]")
      val timedCount = measured.count { case (_, _, f, _) => !f }
      val errorCount = ordered.count { case (k, _) => failed(k) }
      val skippedCount = results.count { case (_, v, f, _) => !f && v.isNaN }
      val total = measured.collect { case (_, v, false, _) => v }.sum
      // "cold": fewer than 2 complete passes means the min-of-N could
      // not discard the one-shot JIT/warm-up sample — per-query numbers
      // then carry compile time, NOT steady-state cost. Round 14's
      // recorded single-pass JSON manufactured phantom 3-7x
      // "regressions" on exactly the queries that run first in catalog
      // order; this flag makes a one-pass capture self-describing.
      val cold = passes < 2
      // The stdout line must survive the driver's 2000-char TAIL capture
      // as parseable JSON (rounds 14-16: the full 189-entry times dict
      // pushed ~3 KB past the capture window, so BENCH_r{14,15,16}.json
      // all recorded parsed=null). stdout therefore carries counts plus
      // only the SLOWEST-20 per-query times (the ones a cross-round
      // regression read actually wants); the full dict + per-rep spread
      // live in the file copy at `outPath`.
      val slowest = measured.collect { case (k, v, false, _) => (k, v) }
        .sortBy(-_._2).take(20)
        .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val stdoutLine =
        s"""{"metric":"total","value":${fmt(total)},"unit":"sec","timed_count":$timedCount,"skipped_count":$skippedCount,"errors_count":$errorCount,"capped_count":$cappedCount,"passes":$passes,"cold":$cold,"partial":$partial,"sf":"$sfDir","queries_note":"slowest 20 of $timedCount timed; full per-query times in $outPath","queries":$slowest}"""
      (stdoutLine,
       s"""{"metric":"total","value":${fmt(total)},"unit":"sec","timed_count":$timedCount,"skipped_count":$skippedCount,"errors_count":$errorCount,"capped_count":$cappedCount,"capped":$cappedNames,"queries":$qs,"spread":$spread,"errors":$errors,"skipped":$skipped,"passes":$passes,"cold":$cold,"partial":$partial,"sf":"$sfDir"}""")
    }
    def writeFile(passes: Int, partial: Boolean): Unit = {
      val (_, fileLine) = render(passes, partial)
      // write-then-rename so a kill mid-write can't leave a torn file
      try {
        val tmp = java.nio.file.Paths.get(outPath + ".tmp")
        java.nio.file.Files.write(tmp,
          (fileLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(outPath),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
      }
    }
    var passesDone = 0
    var budgetHit = false
    // COVERAGE-FIRST under budget pressure: warmup is interleaved — each
    // query warms at sf0.001 immediately before its FIRST timed run,
    // instead of a front-loaded all-query warmup pass. Rounds 15/16 both
    // died under the driver's 600 s budget with warmup having eaten half
    // the clock: 20 timed / 169 skipped. Interleaving means a budget cut
    // at query k leaves queries 1..k each with a (warmed) timing — every
    // second spent buys a number.
    val warmedUp = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    // PARALLEL WARMUP PHASE (round 19): the round-18 run spent ~150 s of
    // its 600 s budget on 205 SEQUENTIAL sf0.001 warmups — pass 2 then
    // died at query 128, so the artifact stayed cold (passes < 2) for the
    // seventh round. Warmup is not a measurement (its only job is paying
    // the one-shot Janino/codec costs the timed runs must not carry), so
    // it is safe to overlap: a small pool drains the warmup list
    // concurrently while timed passes stay strictly sequential. Each
    // warmup runs on its OWN SparkSession clone — `newSession()` shares
    // the SparkContext, SharedState (external catalog with the bucketed
    // prep tables, file-index caches) and the JVM-global codegen cache,
    // but isolates the session conf, so operators that scope a conf flag
    // around a build (nanosAsLong events reads, the constraint-
    // propagation guards in the iterative operators) cannot race each
    // other. A budget valve stops the phase at 35% of the budget; any
    // query the phase did not reach falls back to the interleaved warmup
    // below, exactly as before. Warmup failures are tolerated (the timed
    // run decides pass/fail); leftover jobs are cancelled by group.
    locally {
      val warmBudget = budgetSec * 0.35
      val pool = math.min(8, math.max(2, Runtime.getRuntime.availableProcessors() / 4))
      val exec = java.util.concurrent.Executors.newFixedThreadPool(pool,
        (r: Runnable) => { val t = new Thread(r, "bench-warm"); t.setDaemon(true); t })
      val started = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      ordered.foreach { case (name, fn) =>
        exec.submit(new Runnable {
          def run(): Unit = {
            if (elapsedSec < warmBudget && !warmedUp.contains(name)) {
              started.add(s"warm-$name")
              try {
                val sess = spark.newSession()
                sess.sparkContext.setJobGroup(s"warm-$name", s"warm $name", true)
                fn(sess, warmDir).write.format("noop").mode("overwrite").save()
                warmedUp.add(name)
              } catch { case _: Throwable => () }
            }
          }
        })
      }
      // TARGET-SF warmup leg for the known-expensive tail (round 20):
      // the sf0.001 warmup pays Janino codegen (keyed on source, shared)
      // but NOT the volume-dependent one-shot costs — C2 JIT of codec /
      // decode inner loops only kicks in after thousands of invocations,
      // which 5 rows never trigger. Round 19's driver run capped l135/
      // l151/l62/l116 at 20 s on pass 1 where their steady state is
      // 1.4-3.8 s: the caps were pure first-run-at-volume cost. Queries
      // whose previous time is ≥ 1.5 s therefore ALSO warm once at the
      // TARGET dir, slowest first, inside the same budget valve — warmup
      // is not a measurement (nothing from these runs is recorded), it
      // only moves the one-shot costs out of pass 1's timing window; the
      // timed passes still compute everything from the parquet inputs.
      val heavy = ordered.collect {
        case (name, fn) if prevTimes.get(name).exists(_ >= 1.5) =>
          (name, fn, prevTimes(name))
      }.sortBy(-_._3)
      heavy.foreach { case (name, fn, _) =>
        exec.submit(new Runnable {
          def run(): Unit = {
            if (elapsedSec < warmBudget) {
              started.add(s"warm2-$name")
              try {
                val sess = spark.newSession()
                sess.sparkContext.setJobGroup(s"warm2-$name", s"warm2 $name", true)
                fn(sess, sfDir).write.format("noop").mode("overwrite").save()
              } catch { case _: Throwable => () }
            }
          }
        })
      }
      exec.shutdown()
      val headroom = math.max(1L, ((warmBudget - elapsedSec) * 1000).toLong)
      if (!exec.awaitTermination(headroom, java.util.concurrent.TimeUnit.MILLISECONDS)) {
        System.err.println(f"[bench] warmup valve at $elapsedSec%.1f s — " +
          s"${warmedUp.size} of ${ordered.size} warmed, rest interleave")
        exec.shutdownNow()
        started.forEach(g =>
          try spark.sparkContext.cancelJobGroup(g) catch { case _: Throwable => () })
      } else {
        System.err.println(f"[bench] parallel warmup done at $elapsedSec%.1f s " +
          s"(${warmedUp.size} of ${ordered.size})")
      }
      // drop whatever the warmups persisted/checkpointed before timing
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    for (pass <- 1 to reps if !budgetHit) {
      for ((name, fn) <- ordered if !budgetHit) {
        if (elapsedSec >= budgetSec) {
          System.err.println(f"[bench] budget ${budgetSec}%.0f s hit at $elapsedSec%.1f s " +
            s"(pass $pass, before $name) — stopping early with $passesDone complete pass(es)")
          budgetHit = true
        } else {
          // Warm once per query at the smallest SF right before its first
          // timed rep: Janino whole-stage-codegen compilation is a
          // one-shot cost (up to 10 s on the widest generated aggregates,
          // 173 s observed on l118's first cold run) that must not be
          // billed to the timed run. The generated-class cache is keyed
          // on source, so the warm run compiles what the timed run reuses.
          // Warmup is BEST-EFFORT under budget pressure: past 65% of the
          // budget an unwarmed (JIT-tainted, "cold"-flagged) timing beats
          // a skipped query — coverage first.
          if (!warmedUp.contains(name)) {
            if (elapsedSec < budgetSec * 0.65) runOnce(fn, warmDir, name, capBase)
            warmedUp.add(name)
          }
          // adaptive cap: 4× the query's best time (this run's minimum
          // when one exists, else the previous round's file), floored at
          // capBase — a genuinely slow query is never falsely capped,
          // while a cold spike on a known-1 s query is cut at capBase.
          // PROGRESSIVE on repeat caps: a query whose every run so far
          // hit the watchdog gets 3× its last cap on the next pass —
          // round 19's driver run capped the same 4 queries at 20 s on
          // every pass (the cap never grew), so they finished the round
          // with lower bounds instead of timings and the artifact
          // recorded 20.0 as if it were a measurement.
          val best = if (times(name).nonEmpty) Some(times(name).min)
                     else prevTimes.get(name).filter(_ > 0)
          val cap = math.max(capBase,
            math.max(best.getOrElse(0.0) * 4.0,
              cappedAt.getOrElse(name, 0.0) * 3.0))
          val (ok, capped, dt) = runOnce(fn, sfDir, name, cap)
          if (!ok) failed += name
          else if (capped) cappedAt(name) = math.max(cap, cappedAt.getOrElse(name, 0.0))
          else times(name) = times(name) :+ dt
          writeFile(pass - 1, partial = true)
        }
      }
      if (!budgetHit) {
        passesDone = pass
        writeFile(passesDone, partial = true)
      }
    }
    // final file copy: partial=true iff the wall-clock budget truncated
    // the run — "exited cleanly" and "all reps completed" are different
    // facts, and a reader must not mistake a budget-cut result for a
    // full run without cross-checking passes/skipped
    writeFile(passesDone, partial = budgetHit)
    // drop the r18 prep tables (and their warehouse files) so a bench
    // run leaves no graft_*_b… litter behind
    try {
      graft.queries.RelationalQueries.dropBucketedTables(spark, warmDir)
      graft.queries.RelationalQueries.dropBucketedTables(spark, sfDir)
    } catch { case _: Throwable => () }
    // Stop Spark BEFORE printing: shutdown logs go to stderr, and with
    // build.sbt's StdoutOutput + showSuccess:=false this print is the
    // process's (and sbt's) final stdout line — exactly what the
    // driver's metric extraction wants.
    try spark.stop() catch { case _: Throwable => () }
    val (stdoutLine, _) = render(passesDone, partial = budgetHit)
    println(stdoutLine)
  }
}
