package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
object Bench {
  /** 1-min loadavg, for the provenance stamp (r17, VERDICT r16 ask #8):
    * a committed run and a driver re-run of the same tree must be
    * distinguishable from the artifacts alone, without `git diff`.
    */
  private def loadAvg(): Double =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Min-of-3 for ONE query in its OWN JVM (the bench_isolated.sh
    * machinery, in-process) — the self-adjudication measurement behind
    * a surviving gate violation (r18, VERDICT r17 ask #1b). The child
    * runs Bench with the query filter and SPARK_GRAFT_NO_ADJUDICATE so
    * it can never recurse; returns -1 on any failure (which
    * [[BenchGate.adjudicationClass]] maps to `plan` — a failed
    * re-measure can never clear a violation). Exposed for
    * BenchGateSpec's end-to-end spawn pin.
    */
  private[graft] def isolatedMin(key: String, sfDir: String,
      cpus: String): Double = try {
    val classes = new java.io.File(
      getClass.getProtectionDomain.getCodeSource.getLocation.toURI).getPath
    val sparkJars = new java.io.File(
      classOf[SparkSession].getProtectionDomain.getCodeSource
        .getLocation.toURI).getParent
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    val addOpens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq("-Xmx8g", "-cp",
      s"$classes:$sparkJars/*", "graft.Bench")).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
    pb.environment().put("SPARK_GRAFT_ONLY", key)
    pb.environment().put("SPARK_GRAFT_CPUS", cpus)
    pb.environment().put("SPARK_GRAFT_TIMED_RUNS", "3")
    pb.environment().put("SPARK_GRAFT_NO_ADJUDICATE", "1")
    val proc = pb.start()
    val errDrain = new Thread(() =>
      try {
        val in = proc.getErrorStream
        val buf = new Array[Byte](8192)
        while (in.read(buf) >= 0) ()
      } catch { case _: Throwable => })
    errDrain.setDaemon(true); errDrain.start()
    val watchdog = new Thread(() => {
      if (!proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS))
        proc.destroyForcibly()
    })
    watchdog.setDaemon(true); watchdog.start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream)
      .getLines().filter(_.startsWith("{\"metric\"")).toSeq
    proc.waitFor()
    out.lastOption.map { line =>
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      Option(om.readTree(line).get("queries")).map(_.get(key))
        .filter(_ != null).map(_.asDouble(-1.0)).getOrElse(-1.0)
    }.getOrElse(-1.0)
  } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val startedAtMs = System.currentTimeMillis()
    val loadStart = loadAvg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The streaming queries (stream_file_source / watermark_late_drop /
      // stream_dedup) leave a StateStore maintenance thread scheduled; at JVM
      // shutdown it races the stopped RpcEnv and prints a stack trace AFTER
      // the final bench line, flooding the driver's bounded stdout tail
      // (round-2 BENCH parse failure). Push the maintenance interval past the
      // bench lifetime so the thread never wakes.
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Page-cache warm pass (untimed): stream every fixture byte through
    // the OS read path once, so a cold-booted VM times steady-state
    // execution instead of first-touch disk reads. BENCH_r05 read 94.5 s
    // cold vs 56.9 s warm for byte-identical plans — the artifact should
    // report the plan, not the VM's boot state. Raw reads (not a parquet
    // scan) so column pruning can't skip bytes a later query touches.
    def warm(f: java.io.File): Unit =
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(warm))
      else {
        val in = new java.io.FileInputStream(f)
        val buf = new Array[Byte](1 << 20)
        try { while (in.read(buf) >= 0) () } finally in.close()
      }
    try warm(new java.io.File(sfDir)) catch { case _: Throwable => }
    // Warm JVM/codegen/file-listing once so the first timed query doesn't
    // absorb several seconds of one-time session cost.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // Steady-state timing: run each query once untimed (whole-stage
    // codegen compiles the generated classes on first execution — ~1-2 s
    // per query, independent of data size), then time the second run.
    // At sf0.1 the compile cost would otherwise dominate every number.
    // Optional comma-separated filter for local iteration on a few queries.
    // empty/blank SPARK_GRAFT_ONLY means "no filter" (scale_gate's ALL
    // mode exports an empty var), not "zero queries"
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.trim)
      .filter(_.nonEmpty).map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(ks =>
      SparkEntry.queries.filter(kv => ks(kv._1)))
    // min-of-N is tunable (r18, VERDICT r17 ask #5): the scale gate's
    // sf0.01 leg runs min-of-5 so sub-quarter-second denominators are
    // measured tightly enough to band fewer queries as floor noise
    val timedRuns = sys.env.getOrElse("SPARK_GRAFT_TIMED_RUNS", "3").toInt
    // Each query: one untimed codegen-warm run, then the MIN of three
    // timed runs. Min (not mean) rejects shared-VM load spikes — the
    // plans are deterministic, so any excess over the fastest observed
    // run is scheduler noise, not plan cost. (Driver totals read 1.7×
    // the warm truth two rounds running from exactly such spikes
    // smearing over unrelated keys; the r9 pairs showed single-run
    // spikes of 2-3× on an idle-plan query, so two samples were still
    // occasionally both unlucky — three damp that tail.)
    // A query that THROWS must not masquerade as a 2 ms entry (BENCH_r08:
    // a fixture schema change failed 31 queries, and their fail-fast times
    // read as the round's best numbers). Track failures per query; they
    // are named in the artifact and on stderr, and excluded from nothing —
    // the time still counts, but the label makes the number un-mistakable.
    val failedQs = scala.collection.mutable.SortedSet[String]()
    // Shared-JVM state shedding (r12 verdict #1): a 435-query single
    // process accumulates localCheckpoint block storage (each timed run
    // builds FRESH checkpoints — 4 invocations × 23 checkpoint sites),
    // cached relations, and heap garbage; by the suite's tail this
    // inflated committed numbers up to 34× over isolated truth
    // (group_hash_agg 4.66 s committed vs 0.21 s isolated) while the
    // plans were healthy. Between queries, release every persistent
    // RDD (nothing cross-query is RDD-backed: layouts are parquet on
    // disk, model state is driver-side — checked r13), clear the
    // catalog cache, and every 25 queries force a full GC so dead
    // codegen classes and block metadata don't pressure later timings.
    // Shedding runs BETWEEN queries only, never between a query's warm
    // and timed runs.
    var sinceGc = 0
    def shedState(): Unit = {
      try graft.functions.GlobalRank.releaseCheckpoints(spark)
      catch { case _: Throwable => }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => }
      try spark.catalog.clearCache() catch { case _: Throwable => }
      sinceGc += 1
      if (sinceGc >= 25) { sinceGc = 0; System.gc() }
    }
    // The suite's heaviest keys get a FULL shed (unpersist + GC) right
    // before their warm run (r16, VERDICT r15 ask #4): BENCH_ISOLATED
    // showed dup_span_detect running up to 1.69x its own-JVM cost
    // in-suite — accumulated heap/block pressure from the ~500 queries
    // before it, not a plan defect. Forcing the GC turn for these keys
    // costs ~100 ms each and buys back whole seconds of measurement
    // honesty on the keys that dominate the headline.
    val heavyKeys = Set("dup_span_detect", "graph_modularity_labels",
      "chatterjee_xi_corr", "triangle_participation_rate",
      "incremental_bm25_maintain", "knn_graph_topk")
    def measure(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Seq[Double] = {
      if (heavyKeys(name)) sinceGc = 25
      shedState()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        failedQs += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      (1 to timedRuns).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => failedQs += name }
        (System.nanoTime() - t0) / 1e9
      }
    }
    // ---- load calibration probe (r18, VERDICT r17 ask #1a) -------------
    // Time the fixed reference probe (BenchGate.ProbeKey — the cheapest,
    // most plan-stable anchor) at sweep start AND end; the anchor caps
    // scale by the worse probe's ratio to its cross-round isolated truth
    // (clamped). A loaded epoch slows probe and anchors alike, so the
    // absolute-seconds anchor gate stops coin-flipping on host load (the
    // r17 driver re-run rejected itself on a 1.136 s posexplode at
    // loadavg 5.02 over a bit-identical plan). Skipped in targeted runs
    // unless an anchor key is in the selection (the gate only reads
    // anchors that ran).
    // the anchor caps are sf0.1 isolated truths — at any other fixture
    // (the scale gate's sf0.01 leg, scale_sf1's sf1.0 decade, where the
    // anchor keys now ride along via the exec-fingerprint union) they
    // would fire nonsense violations, so they apply only at sf0.1
    val anchorsApply = new java.io.File(sfDir).getName == "sf0.1"
    val probeNeeded = anchorsApply && (only.isEmpty ||
      selected.keys.exists(BenchGate.anchors.contains))
    def probeSec(): Double =
      if (!probeNeeded) -1.0
      else try {
        val fn = SparkEntry.queries(BenchGate.ProbeKey)
        shedState()
        fn(spark, sfDir).count() // codegen warm
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
      } catch { case _: Throwable => -1.0 }
    val probeStart = probeSec()
    val allRuns = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    selected.foreach { case (name, fn) => allRuns(name) = measure(name, fn) }
    val probeEnd = probeSec()
    val loadFactor =
      BenchGate.loadFactor(math.max(probeStart, probeEnd))
    val scaledCaps =
      if (anchorsApply) BenchGate.scaledAnchors(loadFactor)
      else Map.empty[String, Double]
    if (probeNeeded)
      System.err.println(f"[bench] load probe ${BenchGate.ProbeKey}: " +
        f"start $probeStart%.3fs end $probeEnd%.3fs vs ref " +
        f"${BenchGate.ProbeRefSec}%.2fs -> anchor cap scale $loadFactor%.2fx")
    // ---- run-time sanity gate (r15, VERDICT r14 ask #1) ----------------
    // The gate used to live only in scripts/bench_gate.sh, so only the
    // builder's script path was protected: the driver's direct
    // `runMain graft.Bench` committed a load-noisy artifact that failed
    // the gate post hoc (r14's 190.992 s run, 8 violations, every one
    // cleared by the judge's isolated re-bench). Move the checks INTO the
    // sweep: any query whose numbers a loaded VM inflated is re-measured
    // in-process (state shed + full GC first, bounded retries), and the
    // final JSON carries "gate":"pass"|"reject" + the surviving
    // violations — so ANY caller either produces a quotable artifact or
    // one that declares itself unquotable. The two checks mirror
    // scripts/bench_gate.sh exactly (that script stays as the external
    // re-verifier):
    //   - SANITY ANCHORS: stable-cost queries must come in under ~2x
    //     their cross-round isolated truth; a breach means shared-VM load.
    //   - RISING TRIPLES (r16, VERDICT r15 ask #2): a strictly rising
    //     (r1, r2, r3) is a VIOLATION only when the triple's MIN — the
    //     quoted stat — also regressed past 1.5x the prior round's
    //     committed figure; a run-3 spike that leaves min-of-3 untouched
    //     is recorded as a NOTE, never a rejection (the r15 false-reject:
    //     rich_club_knn [0.780, 0.780, 1.847] unquotified a 501-query
    //     artifact while the quoted 0.78 was clean). Rules + the prior
    //     loader live in graft.BenchGate so BenchGateSpec can pin both
    //     directions: spike-run-3 passes, genuine-inflation rejects.
    // Priors default to AUTO — the newest committed gate-pass BENCH_rNN
    // artifact (ADVICE r16 #1: the untracked bench_full.json is rewritten
    // by every full run, gate-pass or not, so a load-inflated rejected
    // run could seed the next run's thresholds).
    val priors = BenchGate.loadPriors(
      sys.env.getOrElse("SPARK_GRAFT_PRIOR_BENCH", "AUTO"), sfDir)
    if (priors.isEmpty)
      System.err.println("[bench] no sf-matched prior artifact - rising " +
        "triples downgrade to notes")
    def violations(rs: Iterable[(String, Seq[Double])]): Seq[String] =
      BenchGate.check(rs, priors, scaledCaps).violations
    val maxRetryPasses = 3
    var pass = 0
    var gateViolations = violations(allRuns)
    while (gateViolations.nonEmpty && pass < maxRetryPasses) {
      pass += 1
      val suspects = gateViolations.map(_.split(" ")(1).stripSuffix(":"))
        .distinct.filter(selected.contains)
      System.err.println(s"[bench] gate retry pass $pass: re-running " +
        s"${suspects.size} suspect(s): ${suspects.mkString(", ")}")
      // full shed before the retry block: the suspect was (by hypothesis)
      // measured under transient load or accumulated-state pressure
      sinceGc = 25
      suspects.foreach { name =>
        val fresh = measure(name, selected(name))
        // keep whichever triple has the lower min — an HONEST retry: a
        // real plan cost reproduces and the violation survives; only
        // load noise improves
        if (allRuns(name).isEmpty || fresh.min < allRuns(name).min)
          allRuns(name) = fresh
      }
      gateViolations = violations(allRuns)
    }
    // ---- isolated-JVM self-adjudication (r18, VERDICT r17 ask #1b) ----
    // A violation that survives the in-process retries is re-measured in
    // its OWN JVM (the bench_isolated.sh machinery, in-process): shared
    // heap/block/codegen state cannot follow it there, so an isolated
    // min within the violation's threshold proves the in-suite number
    // was load (`violation_class=load`, downgraded to a note and stamped
    // into the artifact), while a reproducing cost is a real plan
    // regression (`violation_class=plan`, the run stays rejected). The
    // child runs with SPARK_GRAFT_NO_ADJUDICATE so it can never recurse.
    final case class Adj(key: String, kind: String, inSuiteS: Double,
        isolatedS: Double, thresholdS: Double, cls: String)
    def isolatedMin(key: String): Double =
      Bench.isolatedMin(key, sfDir, cpus)
    val adjudications = scala.collection.mutable.ArrayBuffer[Adj]()
    val vRe = """^(ANCHOR|RISING) ([^:]+):.*$""".r
    if (gateViolations.nonEmpty
        && !sys.env.contains("SPARK_GRAFT_NO_ADJUDICATE")) {
      val targets = gateViolations.collect { case vRe(kind, key) =>
        (kind, key) }.distinct.filter(t => selected.contains(t._2)).take(5)
      targets.foreach { case (kind, key) =>
        System.err.println(s"[bench] adjudicating $kind $key in an " +
          "isolated JVM ...")
        val iso = isolatedMin(key)
        val threshold = kind match {
          case "ANCHOR" => scaledCaps.getOrElse(key, Double.MaxValue)
          case _ => BenchGate.RisingMinFactor *
            math.max(priors.getOrElse(key, 0.0), 0.05)
        }
        val cls = BenchGate.adjudicationClass(iso, threshold)
        adjudications +=
          Adj(key, kind.toLowerCase, allRuns(key).min, iso, threshold, cls)
        System.err.println(f"[bench] adjudication $key: in-suite " +
          f"${allRuns(key).min}%.3fs isolated $iso%.3fs vs threshold " +
          f"$threshold%.3fs -> $cls")
      }
      val loadCleared = adjudications
        .filter(_.cls == "load").map(a => (a.kind.toUpperCase, a.key)).toSet
      gateViolations = gateViolations.filter {
        case vRe(kind, key) => !loadCleared((kind, key))
        case _ => true
      }
    }
    if (failedQs.nonEmpty)
      gateViolations = gateViolations :+
        s"FAILED QUERIES: ${failedQs.mkString(",")}"
    val gateNotes = BenchGate.check(allRuns, priors, scaledCaps).notes ++
      adjudications.filter(_.cls == "load").map(a =>
        f"adjudicated load: ${a.kind} ${a.key} in-suite ${a.inSuiteS}%.3fs " +
          f"but isolated ${a.isolatedS}%.3fs <= threshold " +
          f"${a.thresholdS}%.3fs - quoted number is load-smeared, plan is " +
          "healthy")
    val gate = if (gateViolations.isEmpty) "pass" else "reject"
    val gateJson = {
      def arr(xs: Seq[String]) = xs
        .map(v => "\"" + v.replace("\"", "'") + "\"").mkString("[", ",", "]")
      val adjJson = adjudications.map { a =>
        f"""{"key":"${a.key}","kind":"${a.kind}","in_suite_s":${a.inSuiteS}%.3f,"isolated_s":${a.isolatedS}%.3f,"threshold_s":${a.thresholdS}%.3f,"violation_class":"${a.cls}"}"""
      }.mkString("[", ",", "]")
      val probeJson =
        f""""load_probe":{"key":"${BenchGate.ProbeKey}","ref_sec":${BenchGate.ProbeRefSec}%.2f,"start_sec":$probeStart%.3f,"end_sec":$probeEnd%.3f,"factor":$loadFactor%.3f}"""
      s""""gate":"$gate","gate_retry_passes":$pass,""" +
        s""""gate_violations":${arr(gateViolations)},""" +
        s""""gate_notes":${arr(gateNotes)},""" +
        s"""$probeJson,"adjudications":$adjJson"""
    }
    val results = allRuns.map { case (name, runs) => name -> runs.min }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Provenance stamp (r17, VERDICT r16 ask #8): run id + wall-clock
    // span + host-load summary make two runs of the same tree
    // self-describing — "which number is quotable" no longer needs git.
    val provJson = {
      val iso = java.time.Instant.ofEpochMilli(startedAtMs).toString
      val wallSec = (System.currentTimeMillis() - startedAtMs) / 1000.0
      f""""run_id":"$runId","started_at":"$iso","wall_clock_sec":$wallSec%.1f,"loadavg_start":$loadStart%.2f,"loadavg_end":${loadAvg()}%.2f"""
    }
    def line(qs: Iterable[(String, Double)]): String = {
      val q = qs.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"n_failed":${failedQs.size},$provJson,$gateJson,"queries":$q,"sf":"$sfDir"}"""
    }
    // The artifact states its own methodology (ADVICE r7): per-query raw
    // (run1, run2) pairs make a load-noise round diagnosable from the
    // file alone — spiky pairs with a fast min = VM contention, both
    // runs slow = a real plan cost — and "method" names the protocol so
    // numbers are only compared like-for-like.
    def fullLine: String = {
      val runsJson = allRuns.map { case (k, rs) =>
        s""""$k":[${rs.map(r => f"$r%.3f").mkString(",")}]"""
      }.mkString("{", ",", "}")
      val failedJson = failedQs.map(k => s""""$k"""").mkString("[", ",", "]")
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"n_failed":${failedQs.size},"failed":$failedJson,$provJson,$gateJson,"method":"state-shed between queries (full GC before heavy keys) + untimed warm pass + min of $timedRuns timed runs + in-process anchor gate (caps scaled by start/end load probe vs cross-round isolated truth) + rising-triple-vs-prior gate (reject only when min > 1.5x prior committed figure) with bounded re-runs + isolated-JVM load-vs-plan adjudication of surviving violations","queries":${results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")},"runs":$runsJson,"sf":"$sfDir"}"""
    }
    // Tear down ALL state machinery BEFORE printing, then print the compact
    // line truly last: the driver machine-reads a bounded stdout tail, so
    // nothing — shutdown logs, state-store maintenance stack traces — may
    // write after it. Full per-query map → file (consumer-friendly artifact);
    // stdout gets the full line AND, LAST, a compact top-20 line that fits
    // the driver's 2000-char tail.
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case _: Throwable => }
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    // only a FULL run writes the full-runs artifact, and only to a
    // clearly-scratch path (r18, VERDICT r17 ask #8): the old untracked
    // working-dir `bench_full.json` doubled as a default input for the
    // gate scripts, so a stale or gate-rejected leftover could be
    // adjudicated by a positional-arg slip. Now the run artifact lives
    // under target/ (never committed) and every consumer names its
    // input explicitly or resolves AUTO to the newest committed
    // gate-pass BENCH_rNN.json.
    if (only.isEmpty) {
      val outPath = Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_OUT", "target/bench_run.json"))
      Option(outPath.getParent).foreach(Files.createDirectories(_))
      Files.writeString(outPath, fullLine + "\n")
    }
    println(line(results))
    println(line(results.toSeq.sortBy(-_._2).take(20)))
  }
}
