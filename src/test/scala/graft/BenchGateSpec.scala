package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r16 rising-triple rule (VERDICT r15 ask #2) in both
  * directions: a run-3 load spike that leaves min-of-3 untouched must
  * NOT unquotify an artifact; a genuinely inflated triple (the min
  * itself regressed past 1.5x the prior committed figure) must still
  * reject. Plus the anchor check and the prior-loader's sf-matching.
  */
class BenchGateSpec extends AnyFunSuite {

  private val priors = Map("q_spike" -> 0.50, "q_regressed" -> 0.50)

  test("run-3 spike with untouched min is a note, not a violation") {
    // the r15 false-reject shape: strictly rising, spread > 2x, min at
    // the prior figure (rich_club_knn [0.780, 0.780, 1.847] modulo the
    // strictness of the middle step)
    val r = BenchGate.check(
      Seq("q_spike" -> Seq(0.50, 0.60, 1.50)), priors)
    assert(r.violations.isEmpty)
    assert(r.notes.size == 1 && r.notes.head.contains("q_spike"))
  }

  test("genuinely inflated rising triple still rejects") {
    // all three runs high AND rising: min 1.2 > 1.5 x prior 0.5
    val r = BenchGate.check(
      Seq("q_regressed" -> Seq(1.20, 1.40, 3.00)), priors)
    assert(r.violations.size == 1)
    assert(r.violations.head.startsWith("RISING q_regressed"))
  }

  test("rising triple with no prior figure is informational only") {
    val r = BenchGate.check(Seq("q_new" -> Seq(0.50, 0.60, 1.50)), priors)
    assert(r.violations.isEmpty)
    assert(r.notes.size == 1 && r.notes.head.contains("no prior figure"))
  }

  test("non-rising triples never flag, regardless of level") {
    // stable-high is a real (plan) cost — the planfp/SCALE gates own it
    val r = BenchGate.check(
      Seq("q_regressed" -> Seq(3.00, 3.10, 3.05)), priors)
    assert(r.violations.isEmpty && r.notes.isEmpty)
  }

  test("anchor breach rejects independently of priors") {
    val r = BenchGate.check(
      Seq("group_hash_agg" -> Seq(0.45, 0.44, 0.46)), Map.empty)
    assert(r.violations.size == 1)
    assert(r.violations.head.startsWith("ANCHOR group_hash_agg"))
  }

  test("small-spread rising shapes are not rising (2x spread floor)") {
    val r = BenchGate.check(
      Seq("q_regressed" -> Seq(1.20, 1.25, 1.30)), priors)
    assert(r.violations.isEmpty && r.notes.isEmpty)
  }

  test("prior loader: sf-matched artifact parses, mismatched yields none") {
    val body =
      """{"metric":"total","value":212.053,"n_queries":2,"gate":"pass",""" +
        """"queries":{"q_a":0.123,"q_b":4.567},"sf":"/root/testdata/sf0.1"}"""
    val f = java.nio.file.Files.createTempFile("benchgate", ".json")
    java.nio.file.Files.writeString(f, body)
    val hit = BenchGate.loadPriors(f.toString, "/root/testdata/sf0.1")
    assert(hit.get("q_a").contains(0.123) && hit.get("q_b").contains(4.567))
    val miss = BenchGate.loadPriors(f.toString, "/root/testdata/sf0.01")
    assert(miss.isEmpty)
    assert(BenchGate.loadPriors("/nonexistent.json", "sf0.1").isEmpty)
  }

  test("prior loader refuses gate-reject and gate-less artifacts " +
      "(ADVICE r16 #1)") {
    def art(gate: String) =
      s"""{"metric":"total","value":9.9,$gate""" +
        """"queries":{"q_a":0.123},"sf":"/root/testdata/sf0.1"}"""
    val rej = java.nio.file.Files.createTempFile("benchgate_rej", ".json")
    java.nio.file.Files.writeString(rej, art(""""gate":"reject","""))
    assert(BenchGate.loadPriors(rej.toString, "/root/testdata/sf0.1").isEmpty)
    val none = java.nio.file.Files.createTempFile("benchgate_none", ".json")
    java.nio.file.Files.writeString(none, art(""))
    assert(BenchGate.loadPriors(none.toString, "/root/testdata/sf0.1").isEmpty)
  }

  test("prior loader reads ONLY the queries object, never stray " +
      "name:float pairs (ADVICE r16 #1)") {
    // a bare-regex loader would collect "value", "wall_clock_sec", and
    // the runs-triple entries as priors; the strict loader must not
    val body =
      """{"metric":"total","value":212.053,"wall_clock_sec":218.1,""" +
        """"gate":"pass","queries":{"q_a":0.123},""" +
        """"runs":{"q_a":[0.123,0.456,0.789]},"sf":"sf0.1"}"""
    val f = java.nio.file.Files.createTempFile("benchgate_strict", ".json")
    java.nio.file.Files.writeString(f, body)
    val m = BenchGate.loadPriors(f.toString, "/root/testdata/sf0.1")
    assert(m == Map("q_a" -> 0.123))
  }

  // ---- load calibration + self-adjudication (r18, VERDICT r17 ask #1) --

  test("load factor: clamped to [1, MaxLoadScale], probe-failure neutral") {
    assert(BenchGate.loadFactor(BenchGate.ProbeRefSec) == 1.0)
    // an idle machine never TIGHTENS the caps
    assert(BenchGate.loadFactor(0.05) == 1.0)
    // a 2x-loaded probe doubles the caps
    assert(math.abs(BenchGate.loadFactor(2 * BenchGate.ProbeRefSec) - 2.0)
      < 1e-9)
    // pathological probe clamps at MaxLoadScale
    assert(BenchGate.loadFactor(100.0) == BenchGate.MaxLoadScale)
    // probe never ran -> scale nothing
    assert(BenchGate.loadFactor(-1.0) == 1.0)
    assert(BenchGate.loadFactor(0.0) == 1.0)
  }

  test("scaled anchors clear the r17 contested rejection " +
      "(posexplode 1.136s at a 2x-loaded epoch)") {
    // the r17 driver re-run: loadavg 5.02 vs the committed run's 3.09,
    // posexplode_tracknum min-of-3 1.136 s > the absolute 1.0 s cap over
    // a bit-identical plan. Under a probe that measures the same 2x
    // epoch, the scaled cap absorbs it ...
    val loaded = BenchGate.scaledAnchors(2.0)
    val r = BenchGate.check(
      Seq("posexplode_tracknum" -> Seq(1.136, 4.172, 9.652)),
      Map("posexplode_tracknum" -> 0.598), loaded)
    // the rising triple still compares min vs 1.5x prior (1.136 > 0.897)
    // — that half stays a violation for the isolated-JVM adjudication,
    // but the ANCHOR half no longer fires
    assert(!r.violations.exists(_.startsWith("ANCHOR")))
    // ... while on an idle machine (factor 1) the same numbers still
    // reject: the cap is only as loose as the measured load
    val idle = BenchGate.check(
      Seq("posexplode_tracknum" -> Seq(1.136, 4.172, 9.652)),
      Map.empty, BenchGate.scaledAnchors(1.0))
    assert(idle.violations.exists(_.startsWith("ANCHOR")))
  }

  test("adjudication class: isolated within threshold = load, " +
      "reproducing = plan, failed isolated run = plan") {
    // r17's posexplode case: isolated truth ~0.6 s vs the 1.0 s cap
    assert(BenchGate.adjudicationClass(0.598, 1.0) == "load")
    // a genuine plan regression reproduces under isolation
    assert(BenchGate.adjudicationClass(1.7, 1.0) == "plan")
    // a failed isolated re-measure must never CLEAR a violation
    assert(BenchGate.adjudicationClass(-1.0, 1.0) == "plan")
  }

  test("isolated-JVM re-measure spawns, parses, and returns a real " +
      "figure (the adjudication measurement, end to end)") {
    // the cheapest declared query at the cheapest fixture: one child
    // JVM, warm + min-of-3, parsed from its own bench line. A broken
    // classpath, recursion guard, or parse would return -1 here — and
    // -1 classifies as `plan`, so a silent break would surface as
    // spurious rejects, not silent passes; this pins the happy path.
    val t = Bench.isolatedMin(BenchGate.ProbeKey,
      "/root/testdata/sf0.001", "4")
    assert(t > 0, s"isolated re-measure returned $t")
    assert(t < 60, s"isolated min $t s is not a min-of-3 figure")
  }

  test("anchor keys all declared queries (exec-fingerprint union " +
      "depends on it)") {
    BenchGate.anchors.keys.foreach(k =>
      assert(SparkEntry.queries.contains(k), s"anchor $k not declared"))
    assert(SparkEntry.queries.contains(BenchGate.ProbeKey))
  }
}
