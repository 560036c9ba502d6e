package graft.operators

import graft.OpGroup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Link prediction and structure statistics over the kNN similarity
  * graph (round-10 widening, fourth session): common-neighbors and
  * Adamic–Adar candidate scoring — the standard "which pairs are
  * probably near-duplicates we MISSED" audit a dedup pipeline runs over
  * its own neighborhood graph — plus degree assortativity (do
  * well-connected items cluster together, the graph-shape number that
  * predicts whether near-dup clusters will snowball).
  *
  * Scale & determinism design:
  *   - Edges are `knn_graph_topk`'s — derived once from the persisted
  *     IVF layout (out-degree ≤ 3 by construction), undirected by a
  *     distinct union of both orientations.
  *   - Two-hop candidate generation fans out Σ deg(z)² over
  *     INTERMEDIATE nodes z; out-degree is capped but IN-degree of a
  *     hub is not, so intermediates carry an explicit degree cap
  *     (deg ≤ [[LinkPredOps.MaxHubDegree]], mirrored verbatim in the
  *     oracle — the cooc df-cap discipline): a celebrity node cannot
  *     quadratically explode candidates at corpus scale, and dropping
  *     hubs is the standard Adamic–Adar rationale anyway (a hub's
  *     endorsement carries no information — its AA weight ~1/ln(deg)
  *     is already negligible).
  *   - Adamic–Adar weights are FLOOR(1e9/ln(deg)) — one IEEE ln over
  *     an exact integer degree per node (identical text both engines),
  *     then integer-summed; deg ≥ 2 for every intermediate by
  *     construction (it touches both endpoints), so ln > 0.
  *   - Assortativity moments are DECIMAL(38,0) sums over the directed
  *     edge list (the symmetric Pearson form); one terminal IEEE
  *     ratio. Top-k outputs resolve via TakeOrdered, no global sort.
  */
object LinkPredOps extends OpGroup {

  /** Intermediate-node degree cap for 2-hop candidate generation. */
  val MaxHubDegree = 64

  /** Undirected neighbor pairs (both orientations, deduped) from the
    * kNN top-3 edges, plus per-node degree.
    *
    * MATERIALIZED (r18 optimization): every consumer references `und`
    * several times (twoHop's left/right/anti sides, degree maps), and
    * each reference used to re-compile — and re-execute — the whole
    * kNN pipeline (IVF scan → cell self-join → top-3 window):
    * triangle_participation_rate's physical plan held 136 parquet
    * scans / 282 exchanges. The kNN edge set is ≤ 3·|V| rows by
    * construction, so it is pinned once with localCheckpoint (the
    * katz_index_bounded discipline) and the symmetrized set once more;
    * the intermediate directed snapshot is released eagerly once the
    * undirected set is materialized.
    */
  private def undirected(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val e = SemiStructuredOps.queries("knn_graph_topk")(s, d)
      .select(col("src"), col("dst")).localCheckpoint()
    val und = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    graft.functions.Checkpoints.release(e)
    val deg = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    (und, deg)
  }

  private val rhoSql =
    """CASE WHEN dx = 0 OR dy = 0 THEN NULL
      |ELSE round(CAST(num AS DOUBLE)
      |  / (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))), 6)
      |END""".stripMargin.replace("\n", " ")

  /** Shared-text skewness leaf over exact (n, s1, s2, s3) integer
    * moments — m3/m2^1.5, every operand cast to DOUBLE first.
    */
  private val skewFpSql = {
    val mu = "(CAST(s1 AS DOUBLE) / n)"
    val r2 = "(CAST(s2 AS DOUBLE) / n)"
    val r3 = "(CAST(s3 AS DOUBLE) / n)"
    val m2 = s"($r2 - $mu * $mu)"
    val m3 = s"($r3 - 3.0 * $mu * $r2 + 2.0 * $mu * $mu * $mu)"
    s"CAST(FLOOR(($m3 / pow($m2, 1.5)) * 1000000.0) AS BIGINT)"
  }

  /** Two-hop non-adjacent candidate pairs (a < b) through capped-degree
    * intermediates, one row per (a, b, z) path. Takes the materialized
    * (und, deg) pair so callers that also need the degree map share ONE
    * kNN materialization (jaccard/preferential used to build it twice).
    */
  private def twoHop(und: DataFrame, deg: DataFrame): DataFrame = {
    val ok = deg.filter(col("deg") <= MaxHubDegree)
      .select(col("node"), col("deg").as("deg_z"))
    val left = und.select(col("src").as("a"), col("dst").as("z"))
      .join(ok, col("z") === col("node")).drop("node")
    val right = und.select(col("src").as("z2"), col("dst").as("b"))
    val paths = left.join(right, col("z") === col("z2"))
      .filter(col("a") < col("b"))
      .select("a", "b", "z", "deg_z")
    // drop already-adjacent pairs (we predict NEW links)
    paths.join(und.select(col("src").as("a"), col("dst").as("b")),
      Seq("a", "b"), "left_anti")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Common-neighbors score: top-20 non-adjacent pairs by shared
    // neighborhood size — the "missed near-dup pair" audit.
    "common_neighbors_linkpred" -> ((s, d) => {
      val (und, deg) = undirected(s, d)
      twoHop(und, deg)
        .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
        .orderBy(col("n_common").desc, col("a"), col("b"))
        .limit(20)
    }),

    // Adamic–Adar: the same candidates, rare intermediates weighted up
    // by 1/ln(deg) (1e9 fixed point at the leaf, integer-summed).
    "adamic_adar_linkpred" -> ((s, d) => {
      val (und, deg) = undirected(s, d)
      twoHop(und, deg)
        .withColumn("w_fp",
          expr("CAST(FLOOR(1000000000.0 / ln(deg_z)) AS BIGINT)"))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("n_common"), sum("w_fp").as("aa_fp"))
        .orderBy(col("aa_fp").desc, col("a"), col("b"))
        .limit(20)
    }),

    // Jaccard link prediction (r13): |Γa ∩ Γb| / |Γa ∪ Γb| over the
    // same capped two-hop non-adjacent candidates — the set-overlap
    // companion to common-neighbors (which favors hubs; Jaccard
    // normalizes by the union so small tight neighborhoods win).
    // Union via inclusion–exclusion deg_a + deg_b − n_common (b ∉ Γa
    // by the non-adjacency filter, so no correction term); pure
    // integer 1e6 fixed point — denominator ≥ 1 since deg ≥ n_common.
    "jaccard_linkpred" -> ((s, d) => {
      val (und, deg) = undirected(s, d)
      twoHop(und, deg)
        .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
        .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), "a")
        .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), "b")
        .withColumn("jaccard_fp",
          expr("n_common * 1000000 DIV (deg_a + deg_b - n_common)"))
        .select("a", "b", "n_common", "deg_a", "deg_b", "jaccard_fp")
        .orderBy(col("jaccard_fp").desc, col("a"), col("b"))
        .limit(20)
    }),

    // Preferential attachment (r13): deg(a)·deg(b) over the candidate
    // pairs — the "rich get richer" baseline every link-pred eval
    // (Liben-Nowell & Kleinberg 2007) compares against; here the
    // null-model score a near-dup candidate must beat before its
    // neighborhood overlap means anything. Pure integers.
    "preferential_attachment_linkpred" -> ((s, d) => {
      val (und, deg) = undirected(s, d)
      twoHop(und, deg).select("a", "b").distinct()
        .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), "a")
        .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), "b")
        .withColumn("pa_score", expr("deg_a * deg_b"))
        .select("a", "b", "deg_a", "deg_b", "pa_score")
        .orderBy(col("pa_score").desc, col("a"), col("b"))
        .limit(20)
    }),

    // Resource allocation index (r13, Zhou/Lü/Zhang 2009): Σ 1/deg(z)
    // over shared neighbors — Adamic–Adar's harder hub discount (1/d
    // vs 1/ln d), consistently the strongest local link predictor in
    // the published benchmarks. ENTIRELY integer: 1e9 DIV deg_z needs
    // no IEEE ln, so the whole score is exact on both engines.
    "resource_allocation_linkpred" -> ((s, d) => {
      val (und, deg) = undirected(s, d)
      twoHop(und, deg)
        .withColumn("w_fp", expr("1000000000 DIV deg_z"))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("n_common"), sum("w_fp").as("ra_fp"))
        .orderBy(col("ra_fp").desc, col("a"), col("b"))
        .limit(20)
    }),

    // Local clustering coefficient per node: closed wedges over
    // possible wedges, 2T/(deg·(deg−1)). Wedge generation fans out
    // deg² per CENTER node, so centers carry the same hub cap as the
    // two-hop ops (Σ deg² ≤ cap²·|V|); the triangle check is one
    // equi-semi-join of wedge endpoints against the edge set.
    "local_clustering_coefficient" -> ((s, d) => {
      val (und, deg) = undirected(s, d)
      val capped = deg.filter(col("deg") <= MaxHubDegree &&
        col("deg") >= 2)
      val la = und.select(col("src").as("v"), col("dst").as("a"))
        .join(capped.select(col("node").as("v"), col("deg")), "v")
      val lb = und.select(col("src").as("v2"), col("dst").as("b"))
      val wedges = la.join(lb, col("v") === col("v2"))
        .filter(col("a") < col("b"))
        .select("v", "deg", "a", "b")
      val tri = wedges.join(
          und.select(col("src").as("a"), col("dst").as("b")),
          Seq("a", "b"), "left_semi")
        .groupBy("v", "deg").agg(count(lit(1)).as("n_tri"))
      capped.select(col("node").as("v"), col("deg"))
        .join(tri, Seq("v", "deg"), "left")
        .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
        .withColumn("cc_fp",
          expr("2 * n_tri * 1000000 DIV (deg * (deg - 1))"))
        .select("v", "deg", "n_tri", "cc_fp")
        .orderBy("v")
    }),

    // kNN hubness audit (r13; Radovanović, Nanopoulos & Ivanović
    // 2010): the k-occurrence (in-degree) distribution of the top-3
    // kNN graph — positive skew means hub points appear in "everyone
    // else's" neighbor lists while antihubs (in-degree 0) vanish, the
    // high-dimensional pathology that silently biases every
    // kNN-derived signal (label propagation, near-dup clustering,
    // recall evals) toward hubs. Exact integer moments over the
    // node-keyed in-degree rollup (zero-in-degree nodes kept via the
    // left join); skewness is ONE shared-text IEEE leaf.
    "knn_hubness_skew" -> ((s, d) => {
      val e = SemiStructuredOps.queries("knn_graph_topk")(s, d)
        .groupBy(col("dst").as("vec_id")).agg(count(lit(1)).as("k0"))
      // node base = the persisted IVF layout's corpus, NOT raw
      // embeddings: the oracle's `corpus` CTE and the sibling graph ops
      // (label_propagation_knn, kcore_graph_prune) all read the layout,
      // which excludes NULL/empty-embedding rows — reading the raw
      // table here would diverge n/n_zero_indeg on any such row
      // (ADVICE r13)
      s.read.parquet(SemiStructuredOps.ivfLayout(s, d)).select(col("vec_id"))
        .join(e, Seq("vec_id"), "left")
        .withColumn("k", coalesce(col("k0"), lit(0L)))
        .agg(count(lit(1)).as("n"), sum("k").as("s1"),
          sum(expr("CAST(k AS DECIMAL(38,0)) * k")).as("s2"),
          sum(expr("CAST(k AS DECIMAL(38,0)) * k * k")).as("s3"),
          max("k").as("max_indeg"),
          sum(when(col("k") === 0, 1L).otherwise(0L)).as("n_zero_indeg"))
        .withColumn("vn",
          expr("CAST(n AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1"))
        .select(col("n").as("n_nodes"), col("s1").as("n_edges"),
          col("max_indeg"), col("n_zero_indeg"),
          expr(s"CASE WHEN n >= 2 AND vn > 0 THEN $skewFpSql " +
            "ELSE CAST(NULL AS BIGINT) END").as("skew_fp"))
    }),

    // L53 (r14) — truncated Katz index (Katz 1953) over the top-3 kNN
    // graph: katz(u,v) = Σ_ℓ β^ℓ · walks_ℓ(u,v) cut at ℓ ≤ 3 with
    // β = 1/2 — the path-ensemble link predictor that sees BEYOND the
    // shared-neighbor horizon (common_neighbors/adamic_adar score 0
    // for any pair at distance 3; Katz ranks them). Exactness: walk
    // counts are exact integers (walks, not simple paths — revisits
    // count, the standard definition); the score is the exact 1e6
    // fixed-point integer 500000·w₁ + 250000·w₂ + 125000·w₃; top-20
    // by (katz_fp, src, dst) total order. Scale: out-degree is capped
    // at 3 by the kNN construction, so |walks_2| ≤ 9·n and
    // |walks_3| ≤ 27·n — two bounded-fanout equi-joins, never a
    // matrix power.
    "katz_index_bounded" -> ((s, d) => {
      val e = SemiStructuredOps.queries("knn_graph_topk")(s, d)
        .select(col("src"), col("dst")).localCheckpoint()
      val w2 = e.select(col("src").as("a"), col("dst").as("m"))
        .join(e.select(col("src").as("m"), col("dst").as("b")), "m")
        .groupBy("a", "b").agg(count(lit(1)).as("w2"))
      val w3 = w2.select(col("a"), col("b").as("m"), col("w2").as("c"))
        .join(e.select(col("src").as("m"), col("dst").as("b")), "m")
        .groupBy("a", "b").agg(sum("c").as("w3"))
      e.select(col("src").as("a"), col("dst").as("b"), lit(1L).as("w1"))
        .join(w2, Seq("a", "b"), "full_outer")
        .join(w3, Seq("a", "b"), "full_outer")
        .filter(col("a") =!= col("b"))
        .select(col("a").as("src"), col("b").as("dst"),
          coalesce(col("w1"), lit(0L)).as("w1"),
          coalesce(col("w2"), lit(0L)).as("w2"),
          coalesce(col("w3"), lit(0L)).as("w3"))
        .withColumn("katz_fp",
          expr("500000 * w1 + 250000 * w2 + 125000 * w3"))
        .orderBy(col("katz_fp").desc, col("src"), col("dst"))
        .limit(20)
    }),

    // Degree assortativity: Pearson correlation of endpoint degrees
    // over the directed edge list (the symmetric form) — one number
    // summarizing hub-to-hub vs hub-to-leaf wiring.
    "degree_assortativity" -> ((s, d) => {
      val (und, deg) = undirected(s, d)
      val dec = DecimalType(38, 0)
      val j = und
        .join(deg.select(col("node").as("src"), col("deg").as("dx0")), "src")
        .join(deg.select(col("node").as("dst"), col("deg").as("dy0")), "dst")
      j.agg(count(lit(1)).as("n_edges"),
          sum(col("dx0").cast(dec)).as("sx"),
          sum(col("dy0").cast(dec)).as("sy"),
          sum((col("dx0") * col("dx0")).cast(dec)).as("sxx"),
          sum((col("dy0") * col("dy0")).cast(dec)).as("syy"),
          sum((col("dx0") * col("dy0")).cast(dec)).as("sxy"))
        .withColumn("num",
          col("n_edges").cast(dec) * col("sxy") - col("sx") * col("sy"))
        .withColumn("dx",
          col("n_edges").cast(dec) * col("sxx") - col("sx") * col("sx"))
        .withColumn("dy",
          col("n_edges").cast(dec) * col("syy") - col("sy") * col("sy"))
        .withColumn("assortativity", expr(rhoSql))
        .select("n_edges", "assortativity")
    }),

    // Directed modularity of the TRUE-label partition on the kNN graph
    // (r12, second session): Q = Σ_c (e_cc/m − (d_out_c/m)(d_in_c/m))
    // (Leicht & Newman 2008) — how much more intra-label linking the
    // similarity graph shows than degree chance predicts, THE
    // embedding-quality read label_propagation's accuracy only hints
    // at. Pure integer arithmetic: per-label edge/degree counts are
    // combinable aggregates over the out-degree-≤3 edge list; each
    // Q contribution is two exact DECIMAL(38,0)/HUGEINT divisions;
    // the report is |labels|-bounded.
    "graph_modularity_labels" -> ((s, d) => {
      val lab = graft.Tables.embeddings(s, d)
        .select(col("vec_id"), col("label").cast("long").as("lab"))
      // materialized once: the labeled edge list feeds FOUR aggregates
      // (d_out, d_in, e_in, m) that each used to re-execute the kNN
      // pipeline (r18 optimization — the undirected() discipline)
      val e = SemiStructuredOps.queries("knn_graph_topk")(s, d)
        .select(col("src"), col("dst"))
        .join(lab.select(col("vec_id").as("src"), col("lab").as("la")),
          "src")
        .join(lab.select(col("vec_id").as("dst"), col("lab").as("lb")),
          "dst")
        .localCheckpoint()
      val dOut = e.groupBy(col("la").as("lab")).agg(count(lit(1)).as("d_out"))
      val dIn = e.groupBy(col("lb").as("lab")).agg(count(lit(1)).as("d_in"))
      val eIn = e.filter(col("la") === col("lb"))
        .groupBy(col("la").as("lab")).agg(count(lit(1)).as("e_in"))
      val m = e.agg(count(lit(1)).as("m"))
      lab.select("lab").distinct()
        .join(dOut, Seq("lab"), "left")
        .join(dIn, Seq("lab"), "left")
        .join(eIn, Seq("lab"), "left")
        .crossJoin(broadcast(m))
        .select(col("lab"),
          coalesce(col("e_in"), lit(0L)).as("e_in"),
          coalesce(col("d_out"), lit(0L)).as("d_out"),
          coalesce(col("d_in"), lit(0L)).as("d_in"), col("m"))
        .withColumn("q_fp", expr(
          """CAST(CAST(e_in AS DECIMAL(38,0)) * 1000000000 DIV m
            | - CAST(d_out AS DECIMAL(38,0)) * d_in * 1000000000
            |   DIV (CAST(m AS DECIMAL(38,0)) * m) AS BIGINT)"""
            .stripMargin.replace("\n", " ")))
        .select("lab", "e_in", "d_out", "d_in", "q_fp")
        .orderBy("lab")
    }),

    // L55 (r15) — average-neighbor-degree curve knn(k) (Pastor-Satorras,
    // Vázquez & Vespignani 2001): for each degree class k, the mean
    // degree of the neighbors of degree-k nodes — the FUNCTIONAL form
    // behind degree_assortativity's single ρ (rising knn(k) =
    // assortative core, falling = hub-periphery mixing), read before
    // trusting any "hubs cluster together" conclusion. Edge-based exact
    // form: each directed undirected-pair edge contributes deg(dst)
    // grouped by deg(src); knn_fp = Σdeg(dst)·1e6 DIV n_edges(k) is an
    // exact rational. Law: n_edges(k) = k·n_nodes(k) by construction
    // (pinned in spec). Scale: two degree lookups joined onto the
    // out-degree-≤3-derived edge list; output ≤ max-degree rows.
    "average_neighbor_degree" -> ((s, d) => {
      val (und, deg) = undirected(s, d)
      val classes = deg.groupBy(col("deg").as("k"))
        .agg(count(lit(1)).as("n_nodes"))
      val nbr = und
        .join(deg.select(col("node").as("src"), col("deg").as("k")), "src")
        .join(deg.select(col("node").as("dst"), col("deg").as("deg_dst")),
          "dst")
        .groupBy("k")
        .agg(count(lit(1)).as("n_edges"), sum("deg_dst").as("s_nbr"))
      classes.join(nbr, "k")
        .select(col("k"), col("n_nodes"), col("n_edges"),
          expr("s_nbr * 1000000 DIV n_edges").as("knn_fp"))
        .orderBy("k")
    }),

    // L56 (r15) — triangle participation rate: the share of graph nodes
    // that sit in ≥ 1 triangle — the one-number cohesion read (a near-dup
    // graph whose participation collapses is mostly chains/stars =
    // threshold too loose; one that saturates is clique-dominated =
    // candidates redundant). Triangles enumerate once as a < b < c via
    // one bounded wedge join + one closure semi-join; the MIDDLE vertex
    // carries the standing MaxHubDegree cap (wedge fan-out at b is
    // deg(b)² — the local_clustering/cooc df-cap discipline, mirrored
    // verbatim in the oracle), so a celebrity node cannot explode the
    // wedge set at corpus scale. All counts exact; rate one floor
    // division. Single-row output.
    "triangle_participation_rate" -> ((s, d) => {
      val (und, deg) = undirected(s, d)
      val e = und.filter(col("src") < col("dst"))
        .select(col("src").as("a"), col("dst").as("b"))
      val okMid = deg.filter(col("deg") <= MaxHubDegree)
        .select(col("node").as("b"))
      val tri = e.join(okMid, "b")
        .join(e.select(col("a").as("b"), col("b").as("c")), "b")
        .join(und.select(col("src").as("a"), col("dst").as("c")),
          Seq("a", "c"), "left_semi")
      val corners = tri.select(col("a").as("v"))
        .unionByName(tri.select(col("b").as("v")))
        .unionByName(tri.select(col("c").as("v")))
        .distinct().agg(count(lit(1)).as("n_tri_nodes"))
      val nTri = tri.agg(count(lit(1)).as("n_triangles"))
      deg.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(broadcast(nTri))
        .crossJoin(broadcast(corners))
        .select(col("n_nodes"), col("n_triangles"), col("n_tri_nodes"),
          expr("n_tri_nodes * 1000000 DIV n_nodes").as("rate_fp"))
    }),

    // L57 (r15) — kNN label-consistency audit: for each node, the
    // majority label among its top-3 neighbors (ties → smallest label,
    // pinned) vs its OWN label — the standard label-noise screen run
    // before training on weak labels (a label class whose consistency
    // collapses is mislabeled or genuinely entangled in embedding
    // space; cleanlab-style pruning consumes exactly this per-class
    // rate). Majority is a ≤3-row-per-node window (out-degree bounded
    // by the kNN construction, so the partition-by-src window is
    // skew-free at any scale); per-class rollup exact; global row at
    // label −1. Scale: one edge-label join + one bounded vote window.
    "knn_label_consistency" -> ((s, d) => {
      val lab = graft.Tables.embeddings(s, d)
        .select(col("vec_id"), col("label").cast("long").as("lab"))
      val e = SemiStructuredOps.queries("knn_graph_topk")(s, d)
        .select(col("src"), col("dst"))
        .join(lab.select(col("vec_id").as("src"), col("lab").as("own")),
          "src")
        .join(lab.select(col("vec_id").as("dst"), col("lab").as("nbr")),
          "dst")
      val votes = e.groupBy("src", "own", "nbr")
        .agg(count(lit(1)).as("c"))
      // materialized once: both the per-class rollup and the global row
      // re-read the majority vote (and through it the kNN pipeline) —
      // node-bounded, ≤ 1 row per graph node (r18 optimization)
      val maj = votes.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("src")
            .orderBy(col("c").desc, col("nbr"))))
        .filter(col("rn") === 1)
        .withColumn("ok", when(col("nbr") === col("own"), 1L)
          .otherwise(0L))
        .localCheckpoint()
      val perClass = maj.groupBy(col("own").as("label"))
        .agg(count(lit(1)).as("n_nodes"), sum("ok").as("n_consistent"))
      perClass.unionByName(
          maj.agg(count(lit(1)).as("n_nodes"),
            sum("ok").as("n_consistent"))
            .select(lit(-1L).as("label"), col("n_nodes"),
              col("n_consistent")))
        .select(col("label"), col("n_nodes"), col("n_consistent"),
          expr("n_consistent * 1000000 DIV n_nodes").as("rate_fp"))
        .orderBy("label")
    }),
  )

  /** Shared oracle CTE chain: knn edges → undirected pairs → degrees →
    * capped two-hop non-adjacent candidates (the Spark derivation
    * mirrored clause for clause, including the hub cap).
    */
  private def twoHopDuck: String =
    s"""${SemiStructuredOps.knnEdgeCtes},
       |und AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM edges
       |    UNION ALL SELECT dst, src FROM edges) u),
       |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
       |        FROM und GROUP BY 1),
       |paths AS (
       |  SELECT l.src AS a, r.dst AS b, l.dst AS z, g.deg AS deg_z
       |  FROM und l
       |  JOIN deg g ON g.node = l.dst AND g.deg <= $MaxHubDegree
       |  JOIN und r ON r.src = l.dst
       |  WHERE l.src < r.dst),
       |cand AS (
       |  SELECT p.a, p.b, p.z, p.deg_z FROM paths p
       |  LEFT JOIN und e ON e.src = p.a AND e.dst = p.b
       |  WHERE e.src IS NULL)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "common_neighbors_linkpred" ->
      s"""WITH $twoHopDuck
         |SELECT a, b, CAST(count(*) AS BIGINT) AS n_common
         |FROM cand GROUP BY a, b
         |ORDER BY n_common DESC, a, b LIMIT 20""".stripMargin,

    "adamic_adar_linkpred" ->
      s"""WITH $twoHopDuck
         |SELECT a, b, CAST(count(*) AS BIGINT) AS n_common,
         |       CAST(sum(CAST(FLOOR(1000000000.0 / ln(deg_z)) AS BIGINT))
         |         AS BIGINT) AS aa_fp
         |FROM cand GROUP BY a, b
         |ORDER BY aa_fp DESC, a, b LIMIT 20""".stripMargin,

    "jaccard_linkpred" ->
      s"""WITH $twoHopDuck,
         |cn AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_common
         |       FROM cand GROUP BY a, b)
         |SELECT cn.a, cn.b, cn.n_common,
         |       da.deg AS deg_a, db.deg AS deg_b,
         |       CAST(cn.n_common * 1000000
         |         // (da.deg + db.deg - cn.n_common) AS BIGINT)
         |         AS jaccard_fp
         |FROM cn JOIN deg da ON da.node = cn.a
         |        JOIN deg db ON db.node = cn.b
         |ORDER BY jaccard_fp DESC, a, b LIMIT 20""".stripMargin,

    "preferential_attachment_linkpred" ->
      s"""WITH $twoHopDuck,
         |cd AS (SELECT DISTINCT a, b FROM cand)
         |SELECT cd.a, cd.b, da.deg AS deg_a, db.deg AS deg_b,
         |       CAST(da.deg * db.deg AS BIGINT) AS pa_score
         |FROM cd JOIN deg da ON da.node = cd.a
         |        JOIN deg db ON db.node = cd.b
         |ORDER BY pa_score DESC, a, b LIMIT 20""".stripMargin,

    "resource_allocation_linkpred" ->
      s"""WITH $twoHopDuck
         |SELECT a, b, CAST(count(*) AS BIGINT) AS n_common,
         |       CAST(sum(1000000000 // deg_z) AS BIGINT) AS ra_fp
         |FROM cand GROUP BY a, b
         |ORDER BY ra_fp DESC, a, b LIMIT 20""".stripMargin,

    "local_clustering_coefficient" ->
      s"""WITH ${SemiStructuredOps.knnEdgeCtes},
         |und AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM edges
         |    UNION ALL SELECT dst, src FROM edges) u),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
         |        FROM und GROUP BY 1),
         |capped AS (SELECT node, deg FROM deg
         |           WHERE deg <= $MaxHubDegree AND deg >= 2),
         |wedges AS (
         |  SELECT c.node AS v, c.deg, l.dst AS a, r.dst AS b
         |  FROM capped c
         |  JOIN und l ON l.src = c.node
         |  JOIN und r ON r.src = c.node
         |  WHERE l.dst < r.dst),
         |tri AS (
         |  SELECT w.v, w.deg, CAST(count(*) AS BIGINT) AS n_tri
         |  FROM wedges w
         |  WHERE EXISTS (SELECT 1 FROM und e
         |                WHERE e.src = w.a AND e.dst = w.b)
         |  GROUP BY w.v, w.deg)
         |SELECT c.node AS v, c.deg,
         |       COALESCE(t.n_tri, 0) AS n_tri,
         |       CAST(2 * COALESCE(t.n_tri, 0) * 1000000
         |         // (c.deg * (c.deg - 1)) AS BIGINT) AS cc_fp
         |FROM capped c LEFT JOIN tri t ON t.v = c.node
         |ORDER BY v""".stripMargin,

    "knn_hubness_skew" ->
      s"""WITH ${SemiStructuredOps.knnEdgeCtes},
         |ind AS (
         |  SELECT c.vec_id,
         |         CAST(coalesce(g.cnt, 0) AS BIGINT) AS k
         |  FROM corpus c
         |  LEFT JOIN (SELECT dst, CAST(count(*) AS BIGINT) AS cnt
         |             FROM edges GROUP BY dst) g
         |    ON g.dst = c.vec_id),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(k) AS BIGINT) AS s1,
         |             sum(CAST(k AS HUGEINT) * k) AS s2,
         |             sum(CAST(k AS HUGEINT) * k * k) AS s3,
         |             CAST(max(k) AS BIGINT) AS max_indeg,
         |             CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END)
         |               AS BIGINT) AS n_zero_indeg
         |      FROM ind),
         |g AS (SELECT *, CAST(n AS HUGEINT) * s2
         |               - CAST(s1 AS HUGEINT) * s1 AS vn
         |      FROM m)
         |SELECT n AS n_nodes, s1 AS n_edges, max_indeg, n_zero_indeg,
         |       CASE WHEN n >= 2 AND vn > 0 THEN $skewFpSql
         |       ELSE NULL END AS skew_fp
         |FROM g""".stripMargin,

    "katz_index_bounded" ->
      s"""WITH ${SemiStructuredOps.knnEdgeCtes},
         |e AS (SELECT src, dst FROM edges),
         |w2 AS (
         |  SELECT x.src AS a, y.dst AS b, CAST(count(*) AS BIGINT) AS w2
         |  FROM e x JOIN e y ON y.src = x.dst
         |  GROUP BY 1, 2),
         |w3 AS (
         |  SELECT p.a, y.dst AS b, CAST(sum(p.w2) AS BIGINT) AS w3
         |  FROM w2 p JOIN e y ON y.src = p.b
         |  GROUP BY 1, 2),
         |w1 AS (SELECT src AS a, dst AS b, CAST(1 AS BIGINT) AS w1 FROM e),
         |u AS (
         |  SELECT coalesce(w1.a, w2.a, w3.a) AS a,
         |         coalesce(w1.b, w2.b, w3.b) AS b,
         |         coalesce(w1.w1, 0) AS w1,
         |         coalesce(w2.w2, 0) AS w2,
         |         coalesce(w3.w3, 0) AS w3
         |  FROM w1
         |  FULL OUTER JOIN w2 ON w2.a = w1.a AND w2.b = w1.b
         |  FULL OUTER JOIN w3 ON w3.a = coalesce(w1.a, w2.a)
         |                    AND w3.b = coalesce(w1.b, w2.b))
         |SELECT a AS src, b AS dst, w1, w2, w3,
         |       CAST(500000 * w1 + 250000 * w2 + 125000 * w3 AS BIGINT)
         |         AS katz_fp
         |FROM u WHERE a <> b
         |ORDER BY katz_fp DESC, src, dst LIMIT 20""".stripMargin,

    "degree_assortativity" ->
      s"""WITH ${SemiStructuredOps.knnEdgeCtes},
         |und AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM edges
         |    UNION ALL SELECT dst, src FROM edges) u),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
         |        FROM und GROUP BY 1),
         |j AS (
         |  SELECT gx.deg AS dx0, gy.deg AS dy0
         |  FROM und u JOIN deg gx ON gx.node = u.src
         |             JOIN deg gy ON gy.node = u.dst),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_edges,
         |         sum(CAST(dx0 AS HUGEINT)) AS sx,
         |         sum(CAST(dy0 AS HUGEINT)) AS sy,
         |         sum(CAST(dx0 AS HUGEINT) * dx0) AS sxx,
         |         sum(CAST(dy0 AS HUGEINT) * dy0) AS syy,
         |         sum(CAST(dx0 AS HUGEINT) * dy0) AS sxy
         |  FROM j),
         |f AS (
         |  SELECT n_edges,
         |         n_edges * sxy - sx * sy AS num,
         |         n_edges * sxx - sx * sx AS dx,
         |         n_edges * syy - sy * sy AS dy
         |  FROM m)
         |SELECT n_edges, $rhoSql AS assortativity FROM f""".stripMargin,

    "graph_modularity_labels" ->
      s"""WITH ${SemiStructuredOps.knnEdgeCtes},
         |el AS (
         |  SELECT CAST(la.label AS BIGINT) AS la,
         |         CAST(lb.label AS BIGINT) AS lb
         |  FROM edges e
         |  JOIN embeddings la ON la.vec_id = e.src
         |  JOIN embeddings lb ON lb.vec_id = e.dst),
         |dout AS (SELECT la AS lab, CAST(count(*) AS BIGINT) AS d_out
         |         FROM el GROUP BY 1),
         |din AS (SELECT lb AS lab, CAST(count(*) AS BIGINT) AS d_in
         |        FROM el GROUP BY 1),
         |ein AS (SELECT la AS lab, CAST(count(*) AS BIGINT) AS e_in
         |        FROM el WHERE la = lb GROUP BY 1),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM el),
         |labs AS (SELECT DISTINCT CAST(label AS BIGINT) AS lab
         |         FROM embeddings)
         |SELECT labs.lab,
         |       CAST(coalesce(e_in, 0) AS BIGINT) AS e_in,
         |       CAST(coalesce(d_out, 0) AS BIGINT) AS d_out,
         |       CAST(coalesce(d_in, 0) AS BIGINT) AS d_in,
         |       CAST(CAST(coalesce(e_in, 0) AS HUGEINT) * 1000000000 // m
         |         - CAST(coalesce(d_out, 0) AS HUGEINT)
         |           * coalesce(d_in, 0) * 1000000000
         |           // (CAST(m AS HUGEINT) * m) AS BIGINT) AS q_fp
         |FROM labs
         |LEFT JOIN dout ON dout.lab = labs.lab
         |LEFT JOIN din ON din.lab = labs.lab
         |LEFT JOIN ein ON ein.lab = labs.lab
         |CROSS JOIN mm
         |ORDER BY labs.lab""".stripMargin,

    "average_neighbor_degree" ->
      s"""WITH ${SemiStructuredOps.knnEdgeCtes},
         |und AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM edges
         |    UNION ALL SELECT dst, src FROM edges) u),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
         |        FROM und GROUP BY 1),
         |classes AS (SELECT deg AS k, CAST(count(*) AS BIGINT) AS n_nodes
         |            FROM deg GROUP BY 1),
         |nbr AS (
         |  SELECT ds.deg AS k, CAST(count(*) AS BIGINT) AS n_edges,
         |         CAST(sum(dd.deg) AS BIGINT) AS s_nbr
         |  FROM und u
         |  JOIN deg ds ON ds.node = u.src
         |  JOIN deg dd ON dd.node = u.dst
         |  GROUP BY 1)
         |SELECT c.k, c.n_nodes, n.n_edges,
         |       CAST(n.s_nbr * 1000000 // n.n_edges AS BIGINT) AS knn_fp
         |FROM classes c JOIN nbr n ON n.k = c.k
         |ORDER BY c.k""".stripMargin,

    "triangle_participation_rate" ->
      s"""WITH ${SemiStructuredOps.knnEdgeCtes},
         |und AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM edges
         |    UNION ALL SELECT dst, src FROM edges) u),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
         |        FROM und GROUP BY 1),
         |e AS (SELECT src AS a, dst AS b FROM und WHERE src < dst),
         |tri AS (
         |  SELECT e1.a, e1.b, e2.b AS c
         |  FROM e e1
         |  JOIN deg dm ON dm.node = e1.b AND dm.deg <= $MaxHubDegree
         |  JOIN e e2 ON e2.a = e1.b
         |  WHERE EXISTS (SELECT 1 FROM und x
         |                WHERE x.src = e1.a AND x.dst = e2.b)),
         |corners AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_tri_nodes FROM (
         |    SELECT DISTINCT v FROM (
         |      SELECT a AS v FROM tri
         |      UNION ALL SELECT b FROM tri
         |      UNION ALL SELECT c FROM tri) q) w),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM tri),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
         |SELECT n_nodes, n_triangles, n_tri_nodes,
         |       CAST(n_tri_nodes * 1000000 // n_nodes AS BIGINT) AS rate_fp
         |FROM nn CROSS JOIN nt CROSS JOIN corners""".stripMargin,

    "knn_label_consistency" ->
      s"""WITH ${SemiStructuredOps.knnEdgeCtes},
         |el AS (
         |  SELECT e.src, CAST(la.label AS BIGINT) AS own,
         |         CAST(lb.label AS BIGINT) AS nbr
         |  FROM edges e
         |  JOIN embeddings la ON la.vec_id = e.src
         |  JOIN embeddings lb ON lb.vec_id = e.dst),
         |votes AS (SELECT src, own, nbr, CAST(count(*) AS BIGINT) AS c
         |          FROM el GROUP BY 1, 2, 3),
         |maj AS (
         |  SELECT src, own, nbr,
         |         CASE WHEN nbr = own THEN 1 ELSE 0 END AS ok
         |  FROM (SELECT *, row_number() OVER (PARTITION BY src
         |          ORDER BY c DESC, nbr) AS rn FROM votes)
         |  WHERE rn = 1),
         |per AS (
         |  SELECT own AS label, CAST(count(*) AS BIGINT) AS n_nodes,
         |         CAST(sum(ok) AS BIGINT) AS n_consistent
         |  FROM maj GROUP BY 1
         |  UNION ALL
         |  SELECT -1, CAST(count(*) AS BIGINT), CAST(sum(ok) AS BIGINT)
         |  FROM maj)
         |SELECT label, n_nodes, n_consistent,
         |       CAST(n_consistent * 1000000 // n_nodes AS BIGINT) AS rate_fp
         |FROM per ORDER BY label""".stripMargin,
  )
}
