package graft

/** Run-time bench sanity gate, extracted from Bench.main so the rules are
  * spec-testable (round 16, VERDICT r15 ask #2). Two checks:
  *
  *   - SANITY ANCHORS: stable-cost queries must come in under ~2× their
  *     cross-round isolated truth; a breach means the whole run was taken
  *     under shared-VM load and nothing in it should be quoted.
  *   - RISING TRIPLES: a strictly rising (r1, r2, r3) means contention
  *     grew DURING the measurement — but the quoted stat is min-of-3, and
  *     in a rising triple the min is run 1, measured under the LEAST
  *     load. r15 proved the old rule (reject any rising triple with
  *     spread > 2×) over-cautious: the driver's re-run self-rejected a
  *     501-query artifact on `rich_club_knn` runs [0.780, 0.780, 1.847]
  *     whose min — the quoted number — was untouched (the judge's
  *     isolated re-measure, 1.128 s, confirmed nothing regressed). The
  *     r16 rule: a rising triple is a VIOLATION only when the triple's
  *     MIN also regressed past 1.5× the prior round's committed figure
  *     for that query (a real plan cost reproduces in run 1; a run-3
  *     load spike does not). Without a prior figure (new query, or no
  *     committed artifact at this scale factor) the rising shape is
  *     recorded as an informational NOTE in the artifact, never a
  *     rejection.
  *
  * Priors come from the previous round's COMMITTED gate-pass artifact
  * (r17, ADVICE r16 #1): the old loader read the untracked working-tree
  * `bench_full.json` — which Bench rewrites on every full run even when
  * its own gate verdict is `reject` — so a load-inflated rejected run
  * could become the next run's prior and raise the 1.5× threshold. Now:
  *
  *   - the default prior path is `AUTO`, which resolves to the
  *     highest-numbered committed `BENCH_rNN.json` in the working
  *     directory whose `"sf"` matches and whose `"gate"` is `"pass"`;
  *   - an explicit path is REFUSED (no priors) unless its `"gate"`
  *     field is literally `"pass"` — a rejected or gate-less artifact
  *     can never seed the thresholds;
  *   - only the `"queries"` object is parsed (never bare name:float
  *     pairs scattered through the file), so metadata keys and the
  *     per-run `"runs"` triples can't masquerade as priors.
  */
object BenchGate {

  /** Violations reject the artifact; notes are informational and ride
    * along in the JSON so a load-noisy round stays diagnosable.
    */
  final case class Result(violations: Seq[String], notes: Seq[String])

  /** Cross-round isolated-truth ceilings (~2× the r13 judge's isolated
    * measurements at sf0.1) — must match scripts/bench_gate.sh.
    */
  val anchors: Map[String, Double] = Map(
    "group_hash_agg" -> 0.3,
    "kneser_ney_continuation" -> 1.0,
    "scan_orc_roundtrip" -> 1.0,
    "posexplode_tracknum" -> 1.0,
    "hurst_rs_daily" -> 1.0)

  // ---- load calibration (r18, VERDICT r17 ask #1) ----------------------
  // The anchor caps are ABSOLUTE seconds on a shared VM whose load varies
  // 2x run-to-run — the r17 driver re-run became the first-ever
  // gate:reject on `posexplode_tracknum` 1.136 s > 1.0 s at loadavg 5.02
  // while the plan (fingerprint, git history) was bit-unchanged. Fix:
  // time a fixed reference PROBE (the cheapest, most plan-stable anchor)
  // at sweep start and end, and scale every anchor cap by the probe's
  // ratio to its cross-round isolated truth. A loaded epoch slows probe
  // and anchors alike (both are full-suite in-JVM measurements), so the
  // ratio cancels the epoch out of the verdict; the scale is clamped so
  // a pathological probe can never stretch the caps boundlessly.

  /** The calibration probe: single hash-agg over lineitem, the suite's
    * most plan-stable cheap query (anchored since r13, plan fingerprint
    * unchanged since r5).
    */
  val ProbeKey = "group_hash_agg"

  /** Cross-round isolated truth for the probe at sf0.1 (BENCH_ISOLATED
    * r13–r17 measured 0.14–0.19 s; committed in-suite figures 0.16–0.21).
    */
  val ProbeRefSec = 0.17

  /** Ceiling on the cap scale: past 3× the machine is not measuring
    * anything quotable and the isolated-JVM adjudication (not a wider
    * cap) is the honest path.
    */
  val MaxLoadScale = 3.0

  /** Probe-derived anchor scale: never below 1 (an idle machine does not
    * TIGHTEN caps set at 2× isolated truth), clamped at [[MaxLoadScale]].
    * A probe that failed to run (negative) scales nothing.
    */
  def loadFactor(probeSec: Double): Double =
    if (probeSec <= 0) 1.0
    else math.min(MaxLoadScale, math.max(1.0, probeSec / ProbeRefSec))

  /** The anchor caps under a measured load factor. */
  def scaledAnchors(factor: Double): Map[String, Double] =
    anchors.map { case (k, cap) => k -> cap * factor }

  /** One isolated-JVM self-adjudication of a surviving gate violation
    * (r18, VERDICT r17 ask #1b): `isolatedSec` is the key's min-of-3 in
    * its OWN JVM; `thresholdSec` is what the violation compared against
    * (the scaled anchor cap, or RisingMinFactor × prior). Within
    * threshold ⇒ the in-suite number was shared-JVM/VM load
    * (`violation_class=load`, downgraded to a note); above ⇒ the cost
    * reproduces under isolation (`violation_class=plan`, the run stays
    * rejected).
    */
  def adjudicationClass(isolatedSec: Double, thresholdSec: Double): String =
    if (isolatedSec >= 0 && isolatedSec <= thresholdSec) "load" else "plan"

  /** Rising-triple regression factor: the min must exceed this multiple
    * of the prior committed figure to turn a rising shape into a
    * violation. 1.5× clears min-of-3 jitter (BENCH_ISOLATED ratios run
    * 0.9–1.25 on healthy plans) while a genuine plan regression —
    * historically ≥2× when real (r9: single-run spikes of 2–3×) — still
    * trips it.
    */
  val RisingMinFactor = 1.5

  /** Floor under the prior before applying the factor: sub-50 ms numbers
    * are session overhead, not plan cost (the scale_gate denominator
    * discipline).
    */
  private val PriorFloor = 0.05

  def isRising(runs: Seq[Double]): Boolean =
    runs.size >= 3 && runs.sliding(2).forall(p => p.head < p.last) &&
      runs.max > 2.0 * math.max(runs.min, PriorFloor)

  def check(runs: Iterable[(String, Seq[Double])],
      priors: Map[String, Double]): Result = check(runs, priors, anchors)

  def check(runs: Iterable[(String, Seq[Double])],
      priors: Map[String, Double],
      anchorCaps: Map[String, Double]): Result = {
    val vs = Seq.newBuilder[String]
    val ns = Seq.newBuilder[String]
    runs.foreach { case (name, rs) =>
      anchorCaps.get(name)
        .filter(cap => rs.nonEmpty && rs.min > cap)
        .foreach(cap => vs += f"ANCHOR $name: ${rs.min}%.3fs > $cap%.3fs")
      if (isRising(rs)) {
        val shape =
          s"runs ${rs.map(r => f"$r%.3f").mkString("[", ",", "]")}"
        priors.get(name) match {
          case Some(prior)
              if rs.min > RisingMinFactor * math.max(prior, PriorFloor) =>
            vs += f"RISING $name: $shape min ${rs.min}%.3f > " +
              f"$RisingMinFactor%.1fx prior $prior%.3f"
          case Some(prior) =>
            ns += f"rising $name: $shape (min ${rs.min}%.3f within " +
              f"$RisingMinFactor%.1fx prior $prior%.3f - run-3 load spike, " +
              "quoted min untouched)"
          case None =>
            ns += s"rising $name: $shape (no prior figure - informational)"
        }
      }
    }
    Result(vs.result(), ns.result())
  }

  /** Highest-numbered committed `BENCH_rNN.json` in `dir`, descending —
    * the AUTO prior candidates. Exposed for BenchGateSpec.
    */
  def committedArtifacts(dir: String = "."): Seq[java.io.File] = {
    val re = """BENCH_r(\d+)\.json""".r
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty).toSeq
      .flatMap(f => f.getName match {
        case re(n) => Some((n.toInt, f))
        case _ => None
      })
      .sortBy(-_._1).map(_._2)
  }

  /** Parse per-query priors out of a committed bench artifact — STRICT
    * (r17, ADVICE r16 #1): real JSON parsing (jackson, on Spark's own
    * classpath), never a bare name:float regex that would collect
    * metadata keys or runs-triples. The artifact must carry
    * `"gate":"pass"` (rejected or gate-less runs never seed the
    * thresholds) and its `"sf"` must name the same fixture dir as
    * `sfDir`; only the `"queries"` object is read. Both committed
    * shapes are handled: the builder's fullLine and the driver's
    * wrapper (whose payload lives under `"parsed"`). `path = "AUTO"`
    * resolves to the newest committed `BENCH_rNN.json` that satisfies
    * all checks. Returns empty when nothing qualifies.
    */
  def loadPriors(path: String, sfDir: String): Map[String, Double] =
    if (path == "AUTO")
      committedArtifacts().view
        .map(f => loadPriors(f.getPath, sfDir))
        .collectFirst { case m if m.nonEmpty => m }
        .getOrElse(Map.empty)
    else {
      val f = new java.io.File(path)
      if (!f.isFile) return Map.empty
      try {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = om.readTree(f)
        val node =
          if (root.has("parsed") && root.get("parsed").isObject)
            root.get("parsed")
          else root
        val sfName = new java.io.File(sfDir).getName // e.g. "sf0.1"
        val sfVal = Option(node.get("sf")).map(_.asText("")).getOrElse("")
        if (new java.io.File(sfVal).getName != sfName && sfVal != sfName)
          return Map.empty
        if (Option(node.get("gate")).map(_.asText("")).getOrElse("")
            != "pass") {
          System.err.println(s"[bench] prior artifact $path has no " +
            """"gate":"pass" stamp - refused (ADVICE r16 #1)""")
          return Map.empty
        }
        val q = node.get("queries")
        if (q == null || !q.isObject) return Map.empty
        val b = Map.newBuilder[String, Double]
        q.fields().forEachRemaining { e =>
          if (e.getValue.isNumber) b += e.getKey -> e.getValue.asDouble()
        }
        b.result()
      } catch { case _: Throwable => Map.empty }
    }

  /** Per-query cost map for RANKING (not gating): prefer `path`, fall
    * back to the newest committed artifact carrying at least `minSize`
    * query figures (the driver's wrapper only embeds the top-20 line,
    * so a fresh clone may need to walk back to a builder fullLine
    * artifact for full coverage), then to any nonempty artifact.
    */
  def loadCosts(path: String, sfDir: String, minSize: Int)
      : Map[String, Double] = {
    val direct = if (path == "AUTO") Map.empty[String, Double]
                 else loadPriors(path, sfDir)
    if (direct.size >= minSize) direct
    else committedArtifacts().view
      .map(f => loadPriors(f.getPath, sfDir))
      .collectFirst { case m if m.size >= minSize => m }
      .getOrElse(if (direct.nonEmpty) direct else loadPriors("AUTO", sfDir))
  }
}
