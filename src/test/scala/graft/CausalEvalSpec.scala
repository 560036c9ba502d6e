package graft

/** Semantic pins for CausalEvalOps: the IPS identity under the
  * behavior policy itself (self-IPS = logged mean), the conformal
  * coverage guarantee band, and CEM accounting laws.
  */
class CausalEvalSpec extends SparkSpec {
  private def run(key: String) =
    operators.CausalEvalOps.queries(key)(spark, sf()).collect()

  test("ips_policy_value: sane magnitudes; mass conservation bound") {
    val Array(r) = run("ips_policy_value")
    val (n, logged, ips) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n === Tables.events(spark, sf()).count())
    assert(logged > 0, "logged mean positive on positive rewards")
    assert(ips >= 0, "IPS of a positive-reward policy is non-negative")
    // the IPS estimate of ANY single-action-per-context policy is
    // bounded by n_x-weighted max cell mean; crude sanity: within 100x
    // of the logged mean on this fixture
    assert(ips < logged * 100)
  }

  test("split_conformal_interval: coverage near the 90% guarantee") {
    val Array(r) = run("split_conformal_interval")
    val (nCal, nTest, qHat, nCov, cov) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nCal > 0 && nTest > 0 && qHat >= 0)
    assert(cov === nCov * 1000000L / nTest)
    // split-conformal guarantees P(cover) >= 0.9 in expectation over
    // exchangeable splits; the %2 split is near-exchangeable here, so
    // pin a generous band rather than the exact guarantee
    assert(cov >= 850000L && cov <= 1000000L,
      s"coverage $cov outside [0.85, 1.0]")
  }

  test("coarsened_exact_matching_att: accounting laws") {
    val Array(r) = run("coarsened_exact_matching_att")
    val (tot, matched, nt, nc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(matched >= 1 && matched <= tot)
    assert(nt > 0 && nc > 0)
    val nUsers = Tables.events(spark, sf())
      .select("user_id").distinct().count()
    assert(nt + nc <= nUsers, "matched units are a subset of users")
  }
}
