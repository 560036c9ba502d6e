package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-calibration and tuning-curve operators (round-10 widening):
  * the evaluation layer over the pipeline's own classifiers and dedup
  * knobs — confusion matrices for the heuristic language-ID, the
  * pair-yield curve a dedup threshold sweep produces before anyone
  * picks τ, and percentile-rank feature normalization. The reference's
  * analytics stage exists to answer exactly these "how good is the
  * pipeline's own metadata" questions over staged data
  * (`/root/reference/app.py:129-152`, `/root/reference/README.md:180-205`).
  *
  * Determinism & scale design:
  *   - Everything downstream of the corpus collapses to enum-bounded
  *     state (lang×lang cells, 5 thresholds, event-type groups);
  *     shares/ratios are exact 1e-6 integer divisions.
  *   - The threshold sweep reuses the SAME df-capped inverted-index
  *     candidates as the production near-dup ops — the sweep costs one
  *     candidate pass, not five.
  *   - Percentile ranks route through GlobalRank's grouped two-phase
  *     rank (the low-cardinality window-partition trap: event_type has
  *     5 values, so a plain window would put 20% of the stream in one
  *     task).
  */
object CalibrationOps extends OpGroup {

  /** Beta-binomial method-of-moments shrinkage leaf (1e-6 fp): the
    * prior mean p̄ and strength M = p̄(1−p̄)/v − 1 derive from the exact
    * cross-brand rate moments (sr = Σ rate_fp, srr = Σ rate_fp², nb =
    * #brands); each brand's posterior mean is (k + p̄M)/(n + M). When
    * the rates are tighter than binomial noise allows (v ≤ 0 or
    * M ≤ 0) the CASE falls back to the raw rate — identical text on
    * both engines.
    */
  private def ebShrunkSql(intDiv: String): String = {
    val pbar = "(CAST(sr AS DOUBLE) / nb / 1000000.0)"
    val vv = """((CAST(nb AS DOUBLE) * srr - CAST(sr AS DOUBLE) * sr)
      | / (CAST(nb AS DOUBLE) * (nb - 1)) / 1000000000000.0)"""
      .stripMargin.replace("\n", " ")
    val m = s"($pbar * (1.0 - $pbar) / $vv - 1.0)"
    s"""CASE WHEN $vv <= 0 OR $m <= 0 THEN k * 1000000 $intDiv n
       | ELSE CAST(FLOOR((CAST(k AS DOUBLE) + $pbar * $m)
       |   / (CAST(n AS DOUBLE) + $m) * 1000000.0) AS BIGINT) END"""
      .stripMargin.replace("\n", " ")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Empirical-Bayes rate shrinkage (r12, second session): per-brand
    // return rates shrunk toward the cross-brand beta-binomial prior
    // by method of moments (Robbins 1956 / the standard "stabilize
    // small-sample rates" recipe) — what a quality monitor publishes
    // instead of raw rates so a 3-line brand can't top the leaderboard
    // on noise. One lineitem⨝part pass folds to |brands| (k, n) cells;
    // the prior moments are three integer aggregates over that
    // bounded table; the posterior leaf is ONE shared IEEE formula.
    "eb_shrinkage_rates" -> ((s, d) => {
      val per = Tables.lineitem(s, d)
        .join(Tables.part(s, d).select(col("p_partkey").as("l_partkey"),
          col("p_brand").as("brand")), "l_partkey")
        .groupBy("brand")
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("k"))
        .withColumn("raw_fp", expr("k * 1000000 DIV n"))
      val mom = per.agg(count(lit(1)).as("nb"), sum("raw_fp").as("sr"),
        sum(expr("raw_fp * raw_fp")).as("srr"))
      per.crossJoin(broadcast(mom))
        .withColumn("shrunk_fp", expr(ebShrunkSql("DIV")))
        .select("brand", "n", "k", "raw_fp", "shrunk_fp")
        .orderBy("brand")
    }),

    // lang-ID confusion matrix: stored label × stopword-scored
    // prediction, with per-stored-lang recall shares — the acceptance
    // report for the L-family lang_id_ngram heuristic. Composes the
    // EXISTING operator's projection verbatim (one code path to audit),
    // then folds to the |langs|² cell table.
    "lang_confusion_matrix" -> ((s, d) => {
      val pred = TrainingDataOps.queries("lang_id_ngram")(s, d)
        .select("lang_stored", "lang_pred")
      val cells = pred.groupBy("lang_stored", "lang_pred")
        .agg(count(lit(1)).as("n_docs"))
      val tot = cells.groupBy("lang_stored").agg(sum("n_docs").as("n_stored"))
      cells.join(broadcast(tot), Seq("lang_stored"))
        .select(col("lang_stored"), col("lang_pred"), col("n_docs"),
          col("n_stored"),
          expr("n_docs * 1000000 DIV n_stored").as("share_fp"),
          (col("lang_stored") === col("lang_pred")).as("correct"))
        .orderBy("lang_stored", "lang_pred")
    }),

    // dedup threshold sweep: candidate-pair and affected-doc yield at
    // τ ∈ {0.5 .. 0.9} — the tuning curve read before fixing a near-dup
    // threshold. ONE df-capped candidate pass (shared with
    // ngram_jaccard_pairs / containment_near_dup) feeds all five
    // thresholds via a 5-way explode of the tiny threshold array; both
    // aggregates are threshold-cardinality-sized.
    "dedup_threshold_sweep" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("source"),
          array_distinct(split(col("text"), " ")).as("ws"))
      val jt = graft.functions.TextSim
        .jaccardPairs(docs, "doc_id", "source", "ws", LlmOps.JaccardDfCap)
        .withColumn("j_fp", expr("inter * 1000000 DIV (na + nb - inter)"))
      val hits = jt.select(col("doc_a"), col("doc_b"), col("j_fp"),
          explode(expr(
            "transform(sequence(5, 9), t -> CAST(t * 100000 AS BIGINT))"))
            .as("threshold_fp"))
        .filter(col("j_fp") >= col("threshold_fp"))
      val np = hits.groupBy("threshold_fp").agg(count(lit(1)).as("n_pairs"))
      val nd = hits
        .select(col("threshold_fp"),
          explode(array(col("doc_a"), col("doc_b"))).as("doc"))
        .distinct()
        .groupBy("threshold_fp").agg(count(lit(1)).as("n_dup_docs"))
      np.join(nd, Seq("threshold_fp")).orderBy("threshold_fp")
    }),

    // Shannon entropy profile of the pipeline's categorical columns —
    // the one-number-per-column skew gauge a profiler publishes next to
    // null rates (entropy ≈ 0: a constant/near-constant column; near
    // ln|domain|: uniform). Each column collapses map-side to its
    // (column, value) count table (enum-bounded state); per-column
    // totals broadcast; each −p·ln p term FLOOR-fixed-pointed 1e-9 at
    // the leaf over exact int64 counts then integer-summed.
    "column_entropy_profile" -> ((s, d) => {
      val streams = Seq(
        Tables.events(s, d)
          .select(lit("events.event_type").as("col_name"),
            col("event_type").as("val")),
        Tables.documents(s, d)
          .select(lit("documents.lang").as("col_name"),
            col("lang").as("val")),
        Tables.documents(s, d)
          .select(lit("documents.source").as("col_name"),
            col("source").as("val")),
        Tables.customer(s, d)
          .select(lit("customer.c_mktsegment").as("col_name"),
            col("c_mktsegment").as("val")))
      val counts = streams.reduce(_ union _)
        .groupBy("col_name", "val").agg(count(lit(1)).as("c"))
      val tots = counts.groupBy("col_name").agg(sum("c").as("n_rows"))
      counts.join(broadcast(tots), Seq("col_name"))
        .withColumn("term_fp", expr(
          """CAST(FLOOR((CAST(c AS DOUBLE) / n_rows)
            | * ln(CAST(c AS DOUBLE) / n_rows) * 1000000000.0) AS BIGINT)"""
            .stripMargin.replace("\n", " ")))
        .groupBy("col_name")
        .agg(max("n_rows").as("n_rows"), count(lit(1)).as("n_values"),
          (-sum("term_fp")).as("entropy_fp"))
        .orderBy("col_name")
    }),

    // percentile-rank normalization: each event's value mapped to its
    // within-type percentile rank in 1e-6 fixed point — the
    // distribution-free feature scaling a heterogeneous metric mix
    // needs before any cross-type model. Rank is the GROUPED two-phase
    // rank over (v_fp, event_id) (total order ⇒ engine-independent);
    // per-type counts broadcast; n=1 groups are zero-armed identically
    // on both engines.
    "percentile_rank_normalize" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("event_type"),
        expr("CAST(round(value * 1000) AS BIGINT)").as("v_fp"))
      val cnt = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      graft.functions.GlobalRank
        .rowNumber(ev, "rn", Seq("event_type"), Seq("v_fp", "event_id"))
        .join(broadcast(cnt), Seq("event_type"))
        .withColumn("pct_fp", expr(
          "CASE WHEN n = 1 THEN 0 ELSE (rn - 1) * 1000000 DIV (n - 1) END"))
        .select("event_id", "event_type", "v_fp", "pct_fp")
        .orderBy("event_id")
    }),

    // Quantile normalization of doc length onto the corpus reference
    // distribution (r12): each doc's n_chars is replaced by the CORPUS
    // value at its within-source percentile — the batch-effect
    // correction (bioinformatics' quantile normalization, generalized
    // to unequal group sizes by rank-mapping into the corpus ECDF)
    // that makes per-source length gates comparable when sources have
    // systematically different length scales. Ranks are GlobalRank
    // two-phase numberings (corpus = partition-less two-phase, source
    // = grouped) over the TOTAL (n_chars, doc_id) order; the target
    // index ⌈srank·N/n_s⌉ runs in DECIMAL(38,0) (srank·N ≈ 1e22 at
    // 100 TB passes int64) and the value lookup is an equi-join on the
    // UNIQUE corpus rank.
    "quantile_normalize_doclen" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "source", "n_chars")
      val n = Tables.rowCount(s, d, "documents")
      val g = graft.functions.GlobalRank
        .rowNumber(docs, "grank", Nil, Seq("n_chars", "doc_id"))
      val lookup = g.select(col("grank").as("target"),
        col("n_chars").as("qn_chars"))
      val sizes = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
      graft.functions.GlobalRank
        .rowNumber(docs, "srank", Seq("source"), Seq("n_chars", "doc_id"))
        .join(broadcast(sizes), "source")
        .withColumn("target", expr(
          s"CAST((CAST(srank AS DECIMAL(38,0)) * ${n}L + n_s - 1) " +
            "DIV n_s AS BIGINT)"))
        .join(lookup, "target")
        .select("doc_id", "source", "n_chars", "qn_chars")
        .orderBy("doc_id")
    }),

    // Expected Calibration Error (Guo et al. 2017) of the langid
    // heuristic: confidence = Laplace-smoothed best-score share
    // (best+1)/(Σ scores+4) — smoothing makes confidence track the
    // EVIDENCE MASS (a 9-stopword win states more confidence than a
    // 1-stopword win), which is exactly the axis calibration audits;
    // the raw ratio is degenerately 1.0 whenever only one list fires.
    // Binned into 10 fixed-width bins; per bin the mean stated
    // confidence vs the empirical accuracy, and the n-weighted ECE —
    // the "can we trust this classifier's own confidence" read that
    // decides whether low-confidence docs need human/model review.
    // Everything is exact integer ppm off the SAME lang_id_ngram
    // projection the confusion matrix audits; bins are value-fixed
    // (never rank-defined), so the state is 10 cells at any scale.
    "langid_calibration_ece" -> ((s, d) => {
      val scored = TrainingDataOps.queries("lang_id_ngram")(s, d)
        .filter(col("lang_pred") =!= "unknown")
        .withColumn("stotal", expr("s_en + s_de + s_es + s_fr"))
        .withColumn("best",
          greatest(col("s_en"), col("s_de"), col("s_es"), col("s_fr")))
        .withColumn("conf_fp", expr("(best + 1) * 1000000 DIV (stotal + 4)"))
        .withColumn("bin",
          expr("least(CAST(conf_fp DIV 100000 AS INT), 9)"))
        .withColumn("hit",
          (col("lang_pred") === col("lang_stored")).cast("long"))
      val bins = scored.groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("conf_fp").as("sum_conf"),
          sum("hit").as("n_correct"))
        .withColumn("mean_conf_fp", expr("sum_conf DIV n"))
        .withColumn("acc_fp", expr("n_correct * 1000000 DIV n"))
        .withColumn("gap_fp", abs(col("mean_conf_fp") - col("acc_fp")))
      val ece = bins.agg(
        expr("CAST(sum(n * gap_fp) DIV sum(n) AS BIGINT)").as("ece_fp"))
      bins.crossJoin(broadcast(ece))
        .select("bin", "n", "mean_conf_fp", "acc_fp", "gap_fp", "ece_fp")
        .orderBy("bin")
    }),

    // Bowker's symmetry test over the lang-ID confusion matrix (r12,
    // fifth session; Bowker 1948, the k×k McNemar): are the OFF-
    // diagonal confusions symmetric — is en→de as common as de→en?
    // Asymmetry means the classifier has a directional bias toward
    // some language (usually the stopword-list prior), which recall
    // shares and MCC both average away. χ² = Σ_{i<j}(n_ij−n_ji)²/
    // (n_ij+n_ji) over discordant pairs — each term an exact integer
    // rational (floored at 1e-6), dof = pairs with any mass. Scale:
    // the |langs|²-bounded cell grid pairs with its own transpose —
    // a bounded self-join; the corpus pass is lang_id_ngram's scoring.
    "bowker_symmetry_langid" -> ((s, d) => {
      val cells = TrainingDataOps.queries("lang_id_ngram")(s, d)
        .groupBy("lang_stored", "lang_pred").agg(count(lit(1)).as("o"))
      val mirror = cells.select(col("lang_stored").as("lang_pred"),
        col("lang_pred").as("lang_stored"), col("o").as("o_rev"))
      val pairs = cells.join(mirror, Seq("lang_stored", "lang_pred"),
          "full_outer")
        .withColumn("a", coalesce(col("o"), lit(0L)))
        .withColumn("b", coalesce(col("o_rev"), lit(0L)))
        .filter(col("lang_stored") < col("lang_pred"))
        .filter(col("a") + col("b") > 0)
      pairs.agg(count(lit(1)).as("dof"),
          sum(expr("(a - b) * (a - b) * 1000000 DIV (a + b)"))
            .as("bowker_fp"))
        .select(col("dof"), col("bowker_fp"))
    }),

    // Multi-class Matthews correlation coefficient (r12, fifth
    // session; Gorodkin 2004 R_K generalization) over the SAME
    // lang_id_ngram confusion cells — the single chance-corrected
    // accuracy number the per-cell matrix and Cohen's κ sit beside
    // (MCC stays honest under class imbalance where raw accuracy and
    // even κ mislead; the standard model-acceptance scalar).
    // MCC = (c·s − Σₖpₖtₖ)/√((s²−Σpₖ²)(s²−Σtₖ²)) over exact integer
    // class counts — everything from the |langs|²-bounded cell grid;
    // the only IEEE op is the terminal guarded sqrt ratio (round 6).
    "mcc_langid" -> ((s, d) => {
      val pred = TrainingDataOps.queries("lang_id_ngram")(s, d)
        .select("lang_stored", "lang_pred")
      val cells = pred.groupBy("lang_stored", "lang_pred")
        .agg(count(lit(1)).as("o"))
      val tk = cells.groupBy("lang_stored").agg(sum("o").as("t"))
      val pk = cells.groupBy("lang_pred").agg(sum("o").as("p"))
      val cross = tk.select(col("lang_stored").as("lg"), col("t"))
        .join(pk.select(col("lang_pred").as("lg"), col("p")), Seq("lg"),
          "full_outer")
        .agg(sum(expr("coalesce(t, 0L) * coalesce(p, 0L)")).as("sum_pt"),
          sum(expr("coalesce(t, 0L) * coalesce(t, 0L)")).as("sum_t2"),
          sum(expr("coalesce(p, 0L) * coalesce(p, 0L)")).as("sum_p2"))
      val base = cells.agg(sum("o").as("s_tot"),
        sum(when(col("lang_stored") === col("lang_pred"), col("o"))
          .otherwise(0L)).as("c_correct"))
      base.crossJoin(broadcast(cross))
        .select(col("s_tot"), col("c_correct"), col("sum_pt"),
          col("sum_t2"), col("sum_p2"),
          expr(mccSql).as("mcc"))
    }),
  )

  /** Gorodkin R_K as ONE guarded IEEE expression over the exact
    * integer aggregates — identical text both engines.
    */
  private val mccSql =
    """CASE WHEN s_tot * s_tot - sum_t2 <= 0
      |  OR s_tot * s_tot - sum_p2 <= 0 THEN CAST(NULL AS DOUBLE)
      |ELSE round((CAST(c_correct AS DOUBLE) * s_tot - CAST(sum_pt AS DOUBLE))
      |  / (sqrt(CAST(s_tot AS DOUBLE) * s_tot - CAST(sum_p2 AS DOUBLE))
      |     * sqrt(CAST(s_tot AS DOUBLE) * s_tot - CAST(sum_t2 AS DOUBLE))),
      |  6) END""".stripMargin.replace("\n", " ")

  val oracleSql: Map[String, String] = Map(
    "eb_shrinkage_rates" ->
      s"""WITH per AS (
         |  SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS k
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1),
         |r AS (SELECT *, CAST(k * 1000000 // n AS BIGINT) AS raw_fp
         |      FROM per),
         |mom AS (
         |  SELECT CAST(count(*) AS BIGINT) AS nb,
         |         CAST(sum(raw_fp) AS BIGINT) AS sr,
         |         CAST(sum(raw_fp * raw_fp) AS BIGINT) AS srr
         |  FROM r)
         |SELECT brand, n, k, raw_fp,
         |       CAST(${ebShrunkSql("//")} AS BIGINT) AS shrunk_fp
         |FROM r CROSS JOIN mom ORDER BY brand""".stripMargin,

    "lang_confusion_matrix" ->
      s"""WITH pred AS (${TrainingDataOps.oracleSql("lang_id_ngram")}),
         |cells AS (
         |  SELECT lang_stored, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM pred GROUP BY lang_stored, lang_pred),
         |tots AS (
         |  SELECT lang_stored, CAST(sum(n_docs) AS BIGINT) AS n_stored
         |  FROM cells GROUP BY lang_stored)
         |SELECT lang_stored, lang_pred, n_docs, n_stored,
         |       CAST(n_docs * 1000000 // n_stored AS BIGINT) AS share_fp,
         |       lang_stored = lang_pred AS correct
         |FROM cells JOIN tots USING (lang_stored)
         |ORDER BY lang_stored, lang_pred""".stripMargin,

    "dedup_threshold_sweep" ->
      s"""WITH ${LlmOps.jaccardCtesDuck},
         |jt AS (
         |  SELECT doc_a, doc_b,
         |         CAST(inter * 1000000 // (na + nb - inter) AS BIGINT) AS j_fp
         |  FROM pairs),
         |th AS (SELECT CAST(unnest([500000, 600000, 700000, 800000,
         |                           900000]) AS BIGINT) AS threshold_fp),
         |hits AS (
         |  SELECT threshold_fp, doc_a, doc_b
         |  FROM jt CROSS JOIN th WHERE j_fp >= threshold_fp),
         |np AS (SELECT threshold_fp, CAST(count(*) AS BIGINT) AS n_pairs
         |       FROM hits GROUP BY threshold_fp),
         |nd AS (
         |  SELECT threshold_fp, CAST(count(*) AS BIGINT) AS n_dup_docs
         |  FROM (SELECT DISTINCT threshold_fp, doc FROM
         |         (SELECT threshold_fp, doc_a AS doc FROM hits
         |          UNION ALL
         |          SELECT threshold_fp, doc_b AS doc FROM hits))
         |  GROUP BY threshold_fp)
         |SELECT threshold_fp, n_pairs, n_dup_docs
         |FROM np JOIN nd USING (threshold_fp)
         |ORDER BY threshold_fp""".stripMargin,

    "column_entropy_profile" ->
      """WITH vals AS (
        |  SELECT 'events.event_type' AS col_name, event_type AS val
        |  FROM events
        |  UNION ALL
        |  SELECT 'documents.lang', lang FROM documents
        |  UNION ALL
        |  SELECT 'documents.source', source FROM documents
        |  UNION ALL
        |  SELECT 'customer.c_mktsegment', c_mktsegment FROM customer),
        |counts AS (
        |  SELECT col_name, val, CAST(count(*) AS BIGINT) AS c
        |  FROM vals GROUP BY col_name, val),
        |tots AS (
        |  SELECT col_name, CAST(sum(c) AS BIGINT) AS n_rows
        |  FROM counts GROUP BY col_name),
        |terms AS (
        |  SELECT col_name, n_rows,
        |         CAST(FLOOR((CAST(c AS DOUBLE) / n_rows)
        |           * ln(CAST(c AS DOUBLE) / n_rows) * 1000000000.0)
        |           AS BIGINT) AS term_fp
        |  FROM counts JOIN tots USING (col_name))
        |SELECT col_name, CAST(max(n_rows) AS BIGINT) AS n_rows,
        |       CAST(count(*) AS BIGINT) AS n_values,
        |       CAST(-sum(term_fp) AS BIGINT) AS entropy_fp
        |FROM terms GROUP BY col_name ORDER BY col_name""".stripMargin,

    "percentile_rank_normalize" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |         CAST(round(value * 1000) AS BIGINT) AS v_fp
        |  FROM events),
        |cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |        FROM ev GROUP BY event_type),
        |rk AS (
        |  SELECT event_id, event_type, v_fp,
        |         CAST(row_number() OVER (PARTITION BY event_type
        |           ORDER BY v_fp, event_id) AS BIGINT) AS rn
        |  FROM ev)
        |SELECT event_id, rk.event_type, v_fp,
        |       CAST(CASE WHEN n = 1 THEN 0
        |                 ELSE (rn - 1) * 1000000 // (n - 1) END AS BIGINT)
        |         AS pct_fp
        |FROM rk JOIN cnt ON rk.event_type = cnt.event_type
        |ORDER BY event_id""".stripMargin,

    "quantile_normalize_doclen" ->
      """WITH docs AS (SELECT doc_id, source, n_chars FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
        |g AS (
        |  SELECT n_chars AS qn_chars,
        |         row_number() OVER (ORDER BY n_chars, doc_id) AS grank
        |  FROM docs),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
        |       FROM docs GROUP BY source),
        |r AS (
        |  SELECT d.doc_id, d.source, d.n_chars,
        |         row_number() OVER (PARTITION BY d.source
        |           ORDER BY d.n_chars, d.doc_id) AS srank, s.n_s
        |  FROM docs d JOIN sz s USING (source))
        |SELECT r.doc_id, r.source, r.n_chars, g.qn_chars
        |FROM r CROSS JOIN n
        |JOIN g ON g.grank = (CAST(r.srank AS HUGEINT) * n.nn + r.n_s - 1)
        |                      // r.n_s
        |ORDER BY r.doc_id""".stripMargin,

    "langid_calibration_ece" ->
      s"""WITH pred AS (${TrainingDataOps.oracleSql("lang_id_ngram")}),
         |scored AS (
         |  SELECT lang_stored, lang_pred,
         |         s_en + s_de + s_es + s_fr AS stotal,
         |         greatest(s_en, s_de, s_es, s_fr) AS best
         |  FROM pred WHERE lang_pred <> 'unknown'),
         |conf AS (
         |  SELECT lang_stored, lang_pred,
         |         (best + 1) * 1000000 // (stotal + 4) AS conf_fp,
         |         least(CAST((best + 1) * 1000000 // (stotal + 4) // 100000
         |           AS INT), 9) AS bin,
         |         CASE WHEN lang_pred = lang_stored THEN 1 ELSE 0 END AS hit
         |  FROM scored),
         |bins AS (
         |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(conf_fp) // count(*) AS BIGINT) AS mean_conf_fp,
         |         CAST(sum(hit) * 1000000 // count(*) AS BIGINT) AS acc_fp
         |  FROM conf GROUP BY bin),
         |g AS (SELECT bin, n, mean_conf_fp, acc_fp,
         |             abs(mean_conf_fp - acc_fp) AS gap_fp
         |      FROM bins),
         |e AS (SELECT CAST(sum(n * gap_fp) // sum(n) AS BIGINT) AS ece_fp
         |      FROM g)
         |SELECT bin, n, mean_conf_fp, acc_fp, CAST(gap_fp AS BIGINT) AS gap_fp,
         |       ece_fp
         |FROM g CROSS JOIN e ORDER BY bin""".stripMargin,

    // same transpose pairing / exact per-pair rationals
    "bowker_symmetry_langid" ->
      s"""WITH pred AS (${TrainingDataOps.oracleSql("lang_id_ngram")}),
         |cells AS (
         |  SELECT lang_stored, lang_pred, CAST(count(*) AS BIGINT) AS o
         |  FROM pred GROUP BY 1, 2),
         |p AS (
         |  SELECT coalesce(c.lang_stored, m.lang_stored) AS ls,
         |         coalesce(c.lang_pred, m.lang_pred) AS lp,
         |         coalesce(c.o, 0) AS a, coalesce(m.o_rev, 0) AS b
         |  FROM cells c
         |  FULL OUTER JOIN (SELECT lang_pred AS lang_stored,
         |                          lang_stored AS lang_pred, o AS o_rev
         |                   FROM cells) m
         |    ON m.lang_stored = c.lang_stored
         |   AND m.lang_pred = c.lang_pred),
         |d AS (SELECT a, b FROM p WHERE ls < lp AND a + b > 0)
         |SELECT CAST(count(*) AS BIGINT) AS dof,
         |       CAST(sum((a - b) * (a - b) * 1000000 // (a + b))
         |         AS BIGINT) AS bowker_fp
         |FROM d""".stripMargin,

    // same cells / margins; identical guarded R_K leaf
    "mcc_langid" ->
      s"""WITH pred AS (${TrainingDataOps.oracleSql("lang_id_ngram")}),
         |cells AS (
         |  SELECT lang_stored, lang_pred, CAST(count(*) AS BIGINT) AS o
         |  FROM pred GROUP BY 1, 2),
         |tk AS (SELECT lang_stored AS lg, CAST(sum(o) AS BIGINT) AS t
         |       FROM cells GROUP BY 1),
         |pk AS (SELECT lang_pred AS lg, CAST(sum(o) AS BIGINT) AS p
         |       FROM cells GROUP BY 1),
         |cr AS (
         |  SELECT CAST(sum(coalesce(t, 0) * coalesce(p, 0)) AS BIGINT)
         |           AS sum_pt,
         |         CAST(sum(coalesce(t, 0) * coalesce(t, 0)) AS BIGINT)
         |           AS sum_t2,
         |         CAST(sum(coalesce(p, 0) * coalesce(p, 0)) AS BIGINT)
         |           AS sum_p2
         |  FROM tk FULL OUTER JOIN pk USING (lg)),
         |base AS (
         |  SELECT CAST(sum(o) AS BIGINT) AS s_tot,
         |         CAST(sum(CASE WHEN lang_stored = lang_pred THEN o
         |                  ELSE 0 END) AS BIGINT) AS c_correct
         |  FROM cells)
         |SELECT s_tot, c_correct, sum_pt, sum_t2, sum_p2, $mccSql AS mcc
         |FROM base CROSS JOIN cr""".stripMargin,
  )
}
