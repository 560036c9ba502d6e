package graft

/** Semantic pins for CorpusEvalOps: the precision/recall identities
  * (hits bounded by both sides, fp ratios replay from counts), the
  * backoff sanity laws (log-probs strictly negative, seen-mass
  * dominance), and the entropy bounds (0 ≤ H ≤ ln(charset)).
  */
class CorpusEvalSpec extends SparkSpec {
  private def run(key: String) =
    operators.CorpusEvalOps.queries(key)(spark, sf()).collect()

  test("minhash_candidate_quality: hit bounds and fp ratio replay") {
    val Array(r) = run("minhash_candidate_quality")
    val (ns, nt, nc, nh) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(ns > 0)
    assert(nh <= nt && nh <= nc, "hits are an intersection")
    if (nc > 0) assert(r.getLong(4) === nh * 1000000L / nc)
    if (nt > 0) assert(r.getLong(5) === nh * 1000000L / nt)
    // a sane LSH config has to find SOMETHING when truth is non-empty
    if (nt > 0) assert(nh > 0, "band candidates must overlap exact truth")
  }

  test("stupid_backoff_logprob: strictly negative averages per source") {
    val rows = run("stupid_backoff_logprob")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sum, avg) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0)
      // every scored bigram has probability < 1 ⇒ ln < 0 (floor'd)
      assert(sum < 0 && avg < 0)
      // avg replays from the sum (toward-zero)
      assert(avg === sum / n)
    }
  }

  test("lsh_s_curve_calibration: rates in range; theory curve monotone") {
    val rows = run("lsh_s_curve_calibration")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, n, c, meas, theo) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(b >= 0 && b <= 9 && c <= n)
      assert(meas === c * 1000000L / n)
      // theory replays: 1-(1-j^4)^4 at the bucket center
      val j = (2 * b + 1) / 20.0
      val expect = math.floor(
        (1.0 - math.pow(1.0 - math.pow(j, 4.0), 4.0)) * 1e6).toLong
      assert(theo === expect)
    }
    val theos = rows.sortBy(_.getLong(0)).map(_.getLong(4))
    assert(theos.zip(theos.tail).forall { case (a, b) => a <= b },
      "S-curve is monotone in J")
  }

  test("cluster_policy_disagreement: partition accounting") {
    val Array(r) = run("cluster_policy_disagreement")
    val (n, same, dis, rate) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n >= 1 && same + dis === n, "every cluster classified once")
    assert(rate === dis * 1000000L / n)
  }

  test("dedup_savings_estimate: accounting identities") {
    val Array(r) = run("dedup_savings_estimate")
    val (n, dups, total, saved, fp) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n === Tables.documents(spark, sf()).count())
    assert(dups >= 0 && dups < n)
    assert(saved <= total && saved >= 0)
    assert(fp === saved * 1000000L / total)
    // n_dup_docs = n_docs − distinct hashes
    val distinctHashes = Tables.documents(spark, sf())
      .selectExpr("sha2(text, 256) AS h").distinct().count()
    assert(dups === n - distinctHashes)
  }

  test("char_entropy_by_source: 0 <= H <= ln(distinct chars)") {
    val rows = run("char_entropy_by_source")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k, h) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0 && k >= 1 && k <= n)
      assert(h >= -k, "entropy >= 0 up to per-char floor slack")
      val hMax = (math.log(k.toDouble) * 1e9).toLong
      assert(h <= hMax, s"H bounded by ln(k): $h vs $hMax")
    }
  }
}
