package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dup layout maintenance under CDC (round 14, VERDICT
  * r13 ask #6) — the missing lifecycle piece of the near-dup family.
  * The reference's refresh model is full-replace: each run re-stages
  * every entity object (`albums/{id}.json` overwritten, app.py:204-208)
  * and `bq load --replace` rebuilds the warehouse tables (README.md:
  * 186-205). That is exactly what does NOT survive 100 TB — a corpus
  * that size is not re-indexed per crawl — so this operator implements
  * the at-scale alternative: a CDC batch (inserts / updates / deletes,
  * the J8 `merge_upsert_cdc` key discipline) is applied to the
  * PERSISTED MinHash signature layout and its connected-component
  * labels without a full rebuild:
  *
  *   - new/updated docs hash into their band buckets (batch-sized
  *     signature recompute — the only text ever re-shingled);
  *   - deleted/updated docs' old signature rows retire (a key
  *     anti-join against the broadcast batch);
  *   - band-bucket SIZES (the LSH cap manifest) maintain additively:
  *     sizes' = sizes + Δ(batch), never a corpus re-count;
  *   - affected components re-resolve LOCALLY: only components that
  *     contain a batch doc or share a band bucket with one are
  *     re-clustered; every other component's labels carry over.
  *
  * Why the locality is sound (the invariant the spec pins): a dup edge
  * (u,v) exists iff u,v share a ≥1 sub-cap band bucket and agree on
  * ≥ MinHashDupSlots signature slots. An edge can change only if (a) an
  * endpoint's signature changed — an endpoint is a batch doc — or (b) a
  * shared bucket's cap status changed — bucket membership changed, so
  * the bucket contains a batch doc pre- or post-CDC and both endpoints
  * sit in an affected bucket. Either way both endpoints are "affected
  * docs" (batch docs ∪ docs in affected buckets). Pulling each affected
  * doc's ENTIRE old component into the re-resolve subgraph closes it
  * under unchanged edges (an unchanged edge stays inside its old
  * component), so the subgraph contains every edge that can change plus
  * every component that can split or merge — min-label CC on the
  * subgraph spliced over the carried labels is bit-equal to a full
  * rebuild (min-doc-id labels are canonical per component).
  *
  * Correctness contract (checked, not trusted — the ccLabels
  * precedent, TrainingDataOps.scala): `incremental_neardup_maintain`
  * compares the maintained signature layout against a REBUILT-FROM-
  * SCRATCH layout on the post-merge corpus key-by-key and sig-by-sig,
  * with the DuckDB oracle recomputing every count from the persisted
  * parquet + the documents table; `incremental_cc_relabel`'s oracle
  * recomputes the FULL transitive closure of the post-merge dup graph
  * as a recursive reachability CTE over the maintained layout — the
  * incremental splice must reproduce the from-scratch fixpoint exactly.
  *
  * 100 TB shape: every batch-derived relation (retired keys, fresh
  * signatures, affected buckets, bucket-size deltas, affected
  * components) is broadcast; the only corpus-sized touches are (1) the
  * retire anti-join (map-side against the broadcast key set), (2) the
  * affected-doc probe of the band index, and (3) the carried-label
  * anti-join — all scans with broadcast filters and ZERO corpus
  * shuffles; stored band-bucketed / component-bucketed, (2) and (3)
  * become partition-pruned reads. The re-cluster itself runs on the
  * affected subgraph only — batch-proportional, never corpus-sized.
  *
  * CDC batch rule (deterministic, derived from the corpus so both
  * engines replay it): doc_id % 10 = 3 → UPDATE (text loses its first
  * 5 words — the head-boilerplate re-crawl), % 10 = 7 → DELETE,
  * % 10 = 1 → INSERT a verbatim copy under doc_id + 1e9 (guaranteed
  * fresh key, guaranteed new dup edges).
  */
object IncrementalMaintainOps extends OpGroup {

  /** Band-bucket fan-out cap — must match signatureBandPairs' default
    * (the oracle's closure recompute runs through
    * signatureBandPairsDuck, which uses the same 1000).
    */
  private val BucketCap = 1000

  private val InsertShift = 1000000000L

  /** The CDC update transform: drop the first 5 words. DuckDB twin in
    * the oracles: array_to_string(string_split(text, ' ')[6:], ' ').
    */
  private def updatedText =
    concat_ws(" ", slice(split(col("text"), " "), 6, 1000000))

  /** (doc_id, sig) — identical construction to LlmOps.minhashLayout so
    * carried and fresh signatures are one hash family.
    */
  private[operators] def withSig(docs: DataFrame): DataFrame =
    docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingles", graft.functions.TextSim.shingles("words", 3))
      .select(col("doc_id"),
        graft.functions.TextSim
          .minhashSignature("shingles", LlmOps.MinHashes).as("sig"))

  /** The fresh (to-be-hashed) side of the batch: updated texts + the
    * inserted verbatim copies. Batch-sized by construction.
    *
    * The minted insert key `doc_id + InsertShift` is fresh ONLY when
    * every base key sits below the shift; a base corpus with doc_ids ≥
    * 1e9 would silently collide insert keys AND misclassify carried
    * docs in the audit's `op_class` — on both engines, so the oracle
    * could not catch it (ADVICE r14). Guard loudly at mint time, in
    * the value path so neither optimizer can prune it: minting runs
    * before any layout is persisted, so a violating fixture aborts the
    * whole maintain/rebuild pipeline instead of corrupting it.
    */
  private[operators] def freshBatchDocs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val m = col("doc_id") % 10
    val mintedKey = expr(
      s"CASE WHEN doc_id >= 0 AND doc_id < ${InsertShift}L " +
        s"THEN doc_id + ${InsertShift}L " +
        "ELSE CAST(raise_error('incremental_maintain: doc_id outside " +
        "[0, InsertShift) — minted insert keys would collide') AS BIGINT) " +
        "END")
    docs.filter(m === 3).select(col("doc_id"), updatedText.as("text"))
      .unionByName(docs.filter(m === 1)
        .select(mintedKey.as("doc_id"), col("text")))
  }

  /** Post-merge corpus — what a from-scratch rebuild indexes. */
  private[graft] def postMergeDocs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val m = col("doc_id") % 10
    docs.filter(m =!= 3 && m =!= 7).unionByName(freshBatchDocs(s, d))
  }

  /** Band rows (doc_id, bk, bv) of a signature table — the LSH index
    * key space every locality argument runs over.
    */
  private def bandRows(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      posexplode(array((0 until LlmOps.MinHashBands).map(k =>
        slice(col("sig"), k * LlmOps.MinHashRowsPerBand + 1,
          LlmOps.MinHashRowsPerBand)): _*)).as(Seq("bk", "bv")))

  /** Dup edges over `sigs` restricted to the externally-supplied
    * sub-cap bucket set (GLOBAL post-CDC sizes — never recomputed from
    * the subgraph, or a locally-small but globally-degenerate bucket
    * would resurrect the quadratic blowup the cap exists to stop).
    * Candidate derivation is ID-only (the signatureBandPairs shape);
    * signatures join back only for the candidate set's slot agreement.
    */
  private def dupEdges(sigs: DataFrame, smallBuckets: DataFrame): DataFrame = {
    val kept = bandRows(sigs).join(smallBuckets, Seq("bk", "bv"))
    val cand = kept.select(col("doc_id").as("doc_a"), col("bk"), col("bv"))
      .join(kept.select(col("doc_id").as("doc_b"), col("bk"), col("bv")),
        Seq("bk", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")),
        "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")),
        "doc_b")
      .filter(expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
        >= LlmOps.MinHashDupSlots)
      .select("doc_a", "doc_b")
  }

  /** Incrementally-maintained signature layout: base rows minus retired
    * keys plus fresh batch signatures — the batch is the only text that
    * is ever re-shingled.
    */
  private[operators] val incCache = new graft.Layout("graft_minhash_inc")

  private[graft] def incLayout(s: SparkSession, d: String): String =
    incCache(s, d, graft.Layout.fingerprint(Tables.documents(s, d))) { p =>
      val base = s.read.parquet(LlmOps.minhashLayout(s, d))
      val m = col("doc_id") % 10
      val retired = Tables.documents(s, d)
        .filter(m.isin(3, 7)).select("doc_id")
      base.join(broadcast(retired), Seq("doc_id"), "left_anti")
        .unionByName(withSig(freshBatchDocs(s, d)))
        .write.mode(SaveMode.Overwrite).parquet(p)
    }

  /** From-scratch rebuild on the post-merge corpus — the ground truth
    * the incremental layout is audited against (never served).
    */
  private val rebuildCache = new graft.Layout("graft_minhash_rebuild")

  /** lastPath accessor for sibling oracles (StreamMaintainOps). */
  private[operators] def rebuildCacheLastPath: String = rebuildCache.lastPath

  private[graft] def rebuildLayout(s: SparkSession, d: String): String =
    rebuildCache(s, d, graft.Layout.fingerprint(Tables.documents(s, d))) { p =>
      withSig(postMergeDocs(s, d))
        .write.mode(SaveMode.Overwrite).parquet(p)
    }

  /** Pre-CDC component labels over the minhash dup graph + the
    * band-bucket size manifest — the offline index state a deployment
    * maintains (built once here, exactly like ccLabels).
    */
  private val mhccCache = new graft.Layout("graft_mhcc_base")

  private[graft] def mhccBase(s: SparkSession, d: String): String =
    mhccCache(s, d, graft.Layout.fingerprint(Tables.documents(s, d))) { p =>
      val base = s.read.parquet(LlmOps.minhashLayout(s, d))
      val sizes = bandRows(base).groupBy("bk", "bv")
        .agg(count(lit(1)).as("bn"))
      sizes.write.mode(SaveMode.Overwrite).parquet(s"$p.bandsizes")
      val small = s.read.parquet(s"$p.bandsizes")
        .filter(col("bn") <= BucketCap).select("bk", "bv")
      val edges = dupEdges(base, small).localCheckpoint()
      graft.functions.GraphOps.connectedComponents(
          base.select("doc_id"), edges, "doc_id", "doc_a", "doc_b")
        .write.mode(SaveMode.Overwrite).parquet(p)
      graft.functions.Checkpoints.release(edges)
    }

  /** The local re-resolve: post-CDC labels + the re-clustered subgraph
    * node set (exposed so IncrementalMaintainSpec can pin the locality
    * law — a 1-doc batch re-clusters only that doc's bucket-reachable
    * components).
    *
    * @param baseSizes  persisted pre-CDC (bk, bv, bn) manifest
    * @param oldBatch   retired signature rows (updates' old + deletes)
    * @param newBatch   fresh signature rows (updates' new + inserts)
    */
  private[graft] def maintainLabels(
      inc: DataFrame, baseLabels: DataFrame, baseSizes: DataFrame,
      oldBatch: DataFrame, newBatch: DataFrame): (DataFrame, DataFrame) = {
    // batch-proportional relations — all broadcast
    val affBuckets = bandRows(oldBatch).select("bk", "bv")
      .unionByName(bandRows(newBatch).select("bk", "bv")).distinct()
    // additive size maintenance: sizes' = sizes − old rows + new rows
    val delta = bandRows(newBatch)
      .select(col("bk"), col("bv"), lit(1L).as("dn"))
      .unionByName(bandRows(oldBatch)
        .select(col("bk"), col("bv"), lit(-1L).as("dn")))
      .groupBy("bk", "bv").agg(sum("dn").as("dn"))
    val incSizes = baseSizes.join(broadcast(delta), Seq("bk", "bv"),
        "full_outer")
      .select(col("bk"), col("bv"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("bn"))
      .filter(col("bn") > 0)
    val small = incSizes.filter(col("bn") <= BucketCap).select("bk", "bv")
    // affected docs: batch docs + anything sharing an affected bucket
    // (at 100 TB the layout is band-bucketed → partition-pruned read;
    // here a broadcast semi-probe, no corpus shuffle)
    val affDocs = bandRows(inc)
      .join(broadcast(affBuckets), Seq("bk", "bv")).select("doc_id")
      .unionByName(oldBatch.select("doc_id"))
      .unionByName(newBatch.select("doc_id")).distinct()
    val affComps = baseLabels.join(broadcast(affDocs), Seq("doc_id"),
        "left_semi")
      .select("component").distinct()
    // subgraph: the affected components' full membership (still
    // present post-CDC) + the inserts
    val subNodes = baseLabels
      .join(broadcast(affComps), Seq("component"), "left_semi")
      .select("doc_id")
      .join(inc.select("doc_id"), Seq("doc_id"), "left_semi")
      .unionByName(newBatch.select("doc_id")).distinct()
      .localCheckpoint()
    val subSigs = inc.join(broadcast(subNodes), Seq("doc_id"), "left_semi")
    val subEdges = dupEdges(subSigs, small).localCheckpoint()
    val subLabels = graft.functions.GraphOps.connectedComponents(
      subNodes, subEdges, "doc_id", "doc_a", "doc_b")
    graft.functions.Checkpoints.release(subEdges)
    // splice: untouched components carry their labels verbatim
    val carried = baseLabels
      .join(broadcast(affComps), Seq("component"), "left_anti")
      .select("doc_id", "component")
    (carried.unionByName(subLabels.select("doc_id", "component")), subNodes)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C19 — the maintenance audit: the incrementally-maintained
    // signature layout vs the from-scratch rebuild, key-by-key and
    // signature-by-signature, per provenance class. Every class must
    // read n_docs = n_in_rebuild = n_sig_equal; retired_delete must
    // read n_in_rebuild = n_sig_equal = 0 (the column doubles as
    // "still present in inc"); key_parity's three counts must agree —
    // the bit-equality law, visible IN the output and recomputed
    // end-to-end by the oracle from the persisted parquet.
    "incremental_neardup_maintain" -> ((s, d) => {
      val inc = s.read.parquet(incLayout(s, d))
      val reb = s.read.parquet(rebuildLayout(s, d))
      val cls = inc.withColumn("op_class",
        when(col("doc_id") >= InsertShift, "fresh_insert")
          .when(col("doc_id") % 10 === 3, "fresh_update")
          .otherwise("carried"))
      val per = cls
        .join(reb.select(col("doc_id"), col("sig").as("sig_r")),
          Seq("doc_id"), "left")
        .groupBy("op_class")
        .agg(count(lit(1)).as("n_docs"),
          count(col("sig_r")).as("n_in_rebuild"),
          sum(when(col("sig") === col("sig_r"), 1L).otherwise(0L))
            .as("n_sig_equal"))
      val ret = Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 7).select("doc_id")
        .join(reb.select(col("doc_id"), lit(1L).as("in_r")),
          Seq("doc_id"), "left")
        .join(inc.select(col("doc_id"), lit(1L).as("in_i")),
          Seq("doc_id"), "left")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("in_r"), lit(0L))).as("n_in_rebuild"),
          sum(coalesce(col("in_i"), lit(0L))).as("n_sig_equal"))
        .select(lit("retired_delete").as("op_class"), col("n_docs"),
          col("n_in_rebuild"), col("n_sig_equal"))
      val par = inc.agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(reb.agg(count(lit(1)).as("n_in_rebuild"))))
        .crossJoin(broadcast(
          inc.select(col("doc_id"), col("sig").as("si"))
            .join(reb.select(col("doc_id"), col("sig").as("sr")), "doc_id")
            .filter(col("si") === col("sr"))
            .agg(count(lit(1)).as("n_sig_equal"))))
        .select(lit("key_parity").as("op_class"), col("n_docs"),
          col("n_in_rebuild"), col("n_sig_equal"))
      per.select("op_class", "n_docs", "n_in_rebuild", "n_sig_equal")
        .unionByName(ret).unionByName(par)
        .orderBy("op_class")
    }),

    // C20 — incremental component relabel: the locally re-resolved
    // post-CDC labels, output in the neardup_connected_components
    // shape. The oracle recomputes the ENTIRE closure from scratch
    // over the maintained layout (recursive reachability + min label),
    // so a single doc spliced into the wrong component reds the row.
    "incremental_cc_relabel" -> ((s, d) => {
      val inc = s.read.parquet(incLayout(s, d))
      val base = s.read.parquet(LlmOps.minhashLayout(s, d))
      val ccP = mhccBase(s, d)
      val baseLabels = s.read.parquet(ccP)
      val baseSizes = s.read.parquet(s"$ccP.bandsizes")
      val m = col("doc_id") % 10
      val oldBatch = base.join(broadcast(Tables.documents(s, d)
          .filter(m.isin(3, 7)).select("doc_id")),
        Seq("doc_id"), "left_semi")
      val newBatch = inc.filter(m === 3 || col("doc_id") >= InsertShift)
      val (labels, _) =
        maintainLabels(inc, baseLabels, baseSizes, oldBatch, newBatch)
      val sizes = labels.groupBy("component")
        .agg(count(lit(1)).as("cluster_size"))
      labels.join(sizes, "component")
        .select(col("doc_id"), col("component"), col("cluster_size"),
          (col("doc_id") === col("component")).as("is_rep"))
        .orderBy("doc_id")
    }),
  )

  /** Oracles address the persisted layouts via lastPath (the Layout
    * contract — Verify runs every query before dumping oracle SQL).
    */
  def oracleSql: Map[String, String] = Map(
    "incremental_neardup_maintain" ->
      s"""WITH inc AS (
         |  SELECT doc_id, sig
         |  FROM read_parquet('${incCache.lastPath}/*.parquet')),
         |reb AS (
         |  SELECT doc_id, sig
         |  FROM read_parquet('${rebuildCache.lastPath}/*.parquet')),
         |cls AS (
         |  SELECT doc_id, sig,
         |         CASE WHEN doc_id >= $InsertShift THEN 'fresh_insert'
         |              WHEN doc_id % 10 = 3 THEN 'fresh_update'
         |              ELSE 'carried' END AS op_class
         |  FROM inc),
         |per AS (
         |  SELECT c.op_class, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(count(r.doc_id) AS BIGINT) AS n_in_rebuild,
         |         CAST(sum(CASE WHEN c.sig = r.sig THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_sig_equal
         |  FROM cls c LEFT JOIN reb r ON c.doc_id = r.doc_id
         |  GROUP BY 1),
         |ret AS (
         |  SELECT 'retired_delete' AS op_class,
         |         CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0
         |           END) AS BIGINT) AS n_in_rebuild,
         |         CAST(sum(CASE WHEN i.doc_id IS NOT NULL THEN 1 ELSE 0
         |           END) AS BIGINT) AS n_sig_equal
         |  FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) dl
         |  LEFT JOIN reb r ON r.doc_id = dl.doc_id
         |  LEFT JOIN inc i ON i.doc_id = dl.doc_id),
         |par AS (
         |  SELECT 'key_parity' AS op_class,
         |         (SELECT CAST(count(*) AS BIGINT) FROM inc) AS n_docs,
         |         (SELECT CAST(count(*) AS BIGINT) FROM reb)
         |           AS n_in_rebuild,
         |         (SELECT CAST(count(*) AS BIGINT) FROM inc i
         |          JOIN reb r ON i.doc_id = r.doc_id AND i.sig = r.sig)
         |           AS n_sig_equal)
         |SELECT * FROM per
         |UNION ALL SELECT * FROM ret
         |UNION ALL SELECT * FROM par
         |ORDER BY op_class""".stripMargin,

    "incremental_cc_relabel" ->
      s"""WITH RECURSIVE ${graft.functions.TextSim.signatureBandPairsDuck(
              incCache.lastPath, numHashes = LlmOps.MinHashes,
              numBands = LlmOps.MinHashBands,
              rowsPerBand = LlmOps.MinHashRowsPerBand)},
         |dup AS (
         |  SELECT doc_a, doc_b FROM m
         |  WHERE n_match >= ${LlmOps.MinHashDupSlots}),
         |nodes AS (
         |  SELECT doc_id
         |  FROM read_parquet('${incCache.lastPath}/*.parquet')),
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM dup
         |  UNION ALL SELECT doc_b, doc_a FROM dup),
         |reach(src, dst) AS (
         |  SELECT doc_id, doc_id FROM nodes
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |comp AS (SELECT src AS doc_id, min(dst) AS component
         |         FROM reach GROUP BY src),
         |csz AS (SELECT component, CAST(count(*) AS BIGINT)
         |          AS cluster_size
         |        FROM comp GROUP BY component)
         |SELECT c.doc_id, c.component, s.cluster_size,
         |       (c.doc_id = c.component) AS is_rep
         |FROM comp c JOIN csz s USING (component)
         |ORDER BY c.doc_id""".stripMargin,
  )
}
