package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-model operators (round-5 widening, SURVEY §2 rows M1-M4): the
  * statistical-model half of a pretraining-data pipeline — score documents
  * against a language model learned from the corpus itself (CCNet-style
  * perplexity filtering), mine tokenizer merges (the BPE pair-count step),
  * resolve near-identical records (blocked fuzzy matching), and measure
  * vocabulary structure (triangle counting on the co-occurrence graph).
  *
  * Reference basis: the reference app's analytics delegate corpus-level
  * statistics wholesale to BigQuery (`/root/reference/app.py:129-152`
  * stages documents for exactly this kind of SQL); these rows are the
  * Spark-native equivalents a training-data curator runs on the staged
  * corpus.
  *
  * Determinism & scale design:
  *   - Every log-domain score is rounded to 1e-6 fixed-point BIGINT at the
  *     leaf and integer-summed (the bm25_topk precedent): integer addition
  *     is associative, so any partial-agg layout at 100 TB matches
  *     DuckDB's single-node sum bit-for-bit. The `ln` inputs are exact
  *     integers, so both engines evaluate the same parse tree over
  *     bit-identical doubles.
  *   - The bigram model (counts c2/c1) is VOCABULARY²-bounded state kept
  *     distributed: scoring is an equi-join of the corpus bigram stream
  *     against the count tables — no driver materialization; only the
  *     2-cell (V, N) stats cross-join as a broadcast scalar.
  *   - Fuzzy matching compares DISTINCT names, not rows: the candidate
  *     self-join runs on the name dictionary (≪ corpus) inside blocking
  *     keys, and pair multiplicity is re-expanded arithmetically
  *     (n1·n2, or C(n,2) on the diagonal). At 100 TB the dictionary is
  *     what fits the join, never the row stream.
  *   - Triangle counting orients every edge u<v (lexical stand-in for the
  *     degree-ordering used at scale), so each triangle is produced by
  *     exactly one join path — the standard bound on fan-out. Per-doc pair
  *     generation is the O(L²) step and is bounded by the per-doc distinct
  *     vocabulary (cap by document-frequency at scale, the JaccardDfCap
  *     pattern from ngram_jaccard_pairs).
  */
object LangModelOps extends OpGroup {

  /** Per-bigram-occurrence negative log likelihood under the add-one
    * corpus bigram model, 1e-6 fixed-point. `P(w2|w1) = (c2+1)/(c1+V)`;
    * inputs are exact integers so the SAME expression text evaluates to
    * bit-identical doubles in Spark and DuckDB (tfidf/bm25 precedent).
    * `c1 >= c2` and `V >= 1` keep the ratio >= 1, so nll >= 0.
    */
  private[operators] val nllSql =
    "CAST(round(ln(CAST(c1 + v AS DOUBLE) / (c2 + 1)) * 1000000.0) AS BIGINT)"

  /** Per-occurrence unigram NLL of the bigram's TARGET token under the
    * add-one corpus unigram model, same leaf-fixed-point discipline as
    * [[nllSql]]: P(w2) = (cu+1)/(nn+V), inputs exact integers, ONE
    * shared IEEE expression text on both engines. `nn >= cu` keeps the
    * ratio >= 1 so the leaf is >= 0.
    */
  private val uniNllSql =
    "CAST(round(ln(CAST(nn + v AS DOUBLE) / (cu + 1)) * 1000000.0) AS BIGINT)"

  /** BPE apply knobs: merge-table size, replace passes per merge (one
    * pass per adjacent-occurrence chain halving — see the operator
    * comment), and the token delimiter (U+001F unit separator — cannot
    * occur in the space-split fixture vocabulary; words containing it
    * are filtered anyway to keep the encoding total).
    */
  private val BpeMerges = 8
  private val BpePasses = 8
  private val BpeSep = "\u001f"

  /** The BPE-encoded word dictionary — (word, freq, n_tokens, tokens) —
    * shared by `bpe_apply_encode` (which orders it) and
    * `tokenizer_vocab_coverage` (which aggregates it). See the
    * `bpe_apply_encode` operator comment for the merge-application
    * semantics; this helper is exactly that pipeline, unordered.
    */
  private def bpeEncoded(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1 && !col("w").contains(BpeSep))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val merges = wc.filter(length(col("w")) >= 2)
      .select(col("freq").as("c"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum("c").as("mc"))
      .orderBy(col("mc").desc, col("pair")).limit(BpeMerges)
      .collect().map(_.getString(0))
    var t: Column =
      concat(lit(BpeSep), concat_ws(BpeSep, split(col("w"), "")), lit(BpeSep))
    for (pair <- merges) {
      val find = lit(s"$BpeSep${pair.substring(0, 1)}$BpeSep${pair.substring(1, 2)}$BpeSep")
      val repl = lit(s"$BpeSep$pair$BpeSep")
      for (_ <- 1 to BpePasses) t = replace(t, find, repl)
    }
    wc.withColumn("enc", trim(t, BpeSep))
      .select(col("w").as("word"), col("freq"),
        (length(col("enc")) - length(replace(col("enc"), lit(BpeSep), lit("")))
          + 1).cast("int").as("n_tokens"),
        replace(col("enc"), lit(BpeSep), lit(" ")).as("tokens"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // RHO-loss data selection proxy (r12, third session): rank
    // documents by REDUCIBLE loss — the gap between a weak
    // current-model loss (add-one unigram) and a stronger
    // holdout-model loss (add-one bigram) on the SAME token events
    // (Mindermann et al. 2022's selection rule, with the n-gram
    // ladder standing in for the two checkpoints). High gap = the
    // doc's tokens are predictable FROM CONTEXT but not yet by the
    // weak model — learnable, non-noise, not-yet-learned: the batch
    // a loss-aware curriculum feeds next. Scale: reuses the M1 model
    // tables (c2/c1/vocab) plus the unigram table; both NLLs are
    // FLOOR'd leaf-fixed-point per occurrence then integer-summed;
    // the per-doc gap divides SIGNED toward zero (a doc of pure
    // boilerplate can be easier for the unigram); top-20 resolves by
    // TakeOrdered on (gap, doc_id).
    "rho_loss_selection" -> ((s, d) => {
      val lm = LmLayoutOps.baseLm(s, d)
      // scan-spread below the bigram explode (r18, see Spread doc)
      val bi = LmLayoutOps.bigrams(graft.functions.Spread(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        col("doc_id")))
      bi.join(s.read.parquet(lm), Seq("w1", "w2"))
        .join(broadcast(s.read.parquet(s"$lm.c1")), Seq("w1"))
        .join(broadcast(s.read.parquet(s"$lm.uni")
          .select(col("w").as("w2"), col("cu"))), Seq("w2"))
        .crossJoin(broadcast(s.read.parquet(s"$lm.stats").select("v")))
        .crossJoin(broadcast(s.read.parquet(s"$lm.stats").select("nn")))
        .withColumn("bi_nll", expr(nllSql))
        .withColumn("uni_nll", expr(uniNllSql))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum("uni_nll").as("uni_nll_sum"),
          sum("bi_nll").as("bi_nll_sum"))
        .withColumn("reducible_fp", expr(
          """CASE WHEN uni_nll_sum - bi_nll_sum >= 0
            | THEN (uni_nll_sum - bi_nll_sum) DIV n_bigrams
            |ELSE -((bi_nll_sum - uni_nll_sum) DIV n_bigrams) END"""
            .stripMargin.replace("\n", " ")))
        .select("doc_id", "n_bigrams", "uni_nll_sum", "bi_nll_sum",
          "reducible_fp")
        .orderBy(col("reducible_fp").desc, col("doc_id")).limit(20)
    }),

    // T5-style span corruption (fixed-window variant): deterministic
    // ~15% of 3-token windows are replaced by numbered sentinels; the
    // masked windows, with their sentinels, become the target sequence.
    // The mask decision is a CONTENT-DERIVED md5 predicate on
    // (doc_id, window) — the mixture_weighted_resample idiom — so the
    // same spans mask on any layout, retry, or engine (rand() would be
    // unverifiable AND non-reproducible across runs). Map-side explode
    // + one doc_id window/aggregate pair: one shuffle of (doc, window)
    // pieces, no joins.
    "span_corruption_mask" -> ((s, d) => {
      val W = 3
      val sentW = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("win_idx")
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, CAST(ceil(size(t) / $W.0) AS INT) - 1), " +
            s"i -> array_join(slice(t, i * $W + 1, $W), ' '))")))
        .toDF("doc_id", "win_idx", "win")
        .withColumn("masked", expr(
          "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '_', " +
            "CAST(win_idx AS STRING))), 1, 8), 16, 10) AS BIGINT) % 20 < 3"))
        .withColumn("sent_id",
          sum(when(col("masked"), 1).otherwise(0)).over(sentW))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_windows"),
          count(when(col("masked"), 1)).as("n_masked"),
          concat_ws(" ", expr(
            """transform(array_sort(collect_list(named_struct(
              |  'win_idx', win_idx,
              |  'piece', CASE WHEN masked
              |    THEN concat('<extra_id_', CAST(sent_id AS STRING), '>')
              |    ELSE win END))), x -> x.piece)""".stripMargin))
            .as("corrupted"),
          concat_ws(" ", expr(
            """transform(array_sort(collect_list(CASE WHEN masked
              |  THEN named_struct('win_idx', win_idx,
              |    'piece', concat('<extra_id_', CAST(sent_id AS STRING), '> ', win))
              |  END)), x -> x.piece)""".stripMargin))
            .as("targets"))
        .orderBy("doc_id")
    }),
    // M1 — bigram-LM perplexity scoring: score each document by mean
    // per-bigram NLL under the corpus add-one bigram model, surface the
    // 20 highest-perplexity (lowest-fluency) docs — the CCNet
    // quality-filter shape. The model tables come from the PERSISTED
    // bigram_lm layout (r18, VERDICT r17 ask #6: at 100 TB the LM is
    // index state written by the ingest job and maintained by
    // incremental_lm_maintain, never a per-query subplan); scoring is
    // one corpus bigram scan equi-joined against the model parquet,
    // c1 (vocab-sized) broadcast to the probe side.
    "bigram_lm_perplexity" -> ((s, d) => {
      val lm = LmLayoutOps.baseLm(s, d)
      val bi = LmLayoutOps.bigrams(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      val scored = bi.join(s.read.parquet(lm), Seq("w1", "w2"))
        .join(broadcast(s.read.parquet(s"$lm.c1")), Seq("w1"))
        .crossJoin(broadcast(s.read.parquet(s"$lm.stats").select("v")))
        .withColumn("nll", expr(nllSql))
      scored.groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("nll").as("nll_sum"))
        .withColumn("avg_nll_fp", expr("nll_sum DIV n_bigrams"))
        .select("doc_id", "n_bigrams", "avg_nll_fp")
        .orderBy(col("avg_nll_fp").desc, col("doc_id")).limit(20)
    }),

    // M1b — cross-entropy of each SOURCE under the corpus bigram model:
    // the source-level face of M1 (CCNet runs exactly this rollup — a
    // source whose mean NLL sits far above the corpus is the one the
    // perplexity filter will decimate; read it BEFORE filtering). Same
    // model tables, same leaf-fixed-point NLL, one per-source integer
    // aggregate instead of per-doc top-k — scale story identical to M1.
    "cross_entropy_by_source" -> ((s, d) => {
      val lm = LmLayoutOps.baseLm(s, d)
      val toks = Tables.documents(s, d)
        .select(col("source"), split(col("text"), " ").as("a"))
      val bi = toks.filter(size(col("a")) >= 2)
        .select(col("source"), explode(expr(
          """transform(sequence(1, size(a) - 1),
            |  i -> named_struct('w1', element_at(a, i), 'w2', element_at(a, i + 1)))"""
            .stripMargin)).as("b"))
        .select(col("source"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      bi.join(s.read.parquet(lm), Seq("w1", "w2"))
        .join(broadcast(s.read.parquet(s"$lm.c1")), Seq("w1"))
        .crossJoin(broadcast(s.read.parquet(s"$lm.stats").select("v")))
        .withColumn("nll", expr(nllSql))
        .groupBy("source")
        .agg(count(lit(1)).as("n_bigrams"), sum("nll").as("nll_sum"))
        .withColumn("avg_nll_fp", expr("nll_sum DIV n_bigrams"))
        .select("source", "n_bigrams", "avg_nll_fp")
        .orderBy("source")
    }),

    // M1c — DoReMi-style excess-loss mixture reweighting: upweight the
    // sources the reference model finds HARD (excess per-bigram NLL over
    // the corpus mean), w_i ∝ exp(η·excess_i) with η=1.5 — the
    // multiplicative-weights fixed point for static losses (T rounds of
    // constant-loss updates compose to one exponential, so the closed
    // form IS the converged loop). Loss comes from the same corpus
    // bigram model as M1/M1b (vocab²-bounded); the reweight itself is
    // source-cardinality state: exp() FLOOR-fixed-pointed at the leaf
    // over exact-int inputs (Q3's discipline), INTEGER normalization.
    "doremi_excess_loss_reweight" -> ((s, d) => {
      val lm = LmLayoutOps.baseLm(s, d)
      val toks = Tables.documents(s, d)
        .select(col("source"), split(col("text"), " ").as("a"))
      val bi = toks.filter(size(col("a")) >= 2)
        .select(col("source"), explode(expr(
          """transform(sequence(1, size(a) - 1),
            |  i -> named_struct('w1', element_at(a, i), 'w2', element_at(a, i + 1)))"""
            .stripMargin)).as("b"))
        .select(col("source"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val perSrc = bi.join(s.read.parquet(lm), Seq("w1", "w2"))
        .join(broadcast(s.read.parquet(s"$lm.c1")), Seq("w1"))
        .crossJoin(broadcast(s.read.parquet(s"$lm.stats").select("v")))
        .withColumn("nll", expr(nllSql))
        .groupBy("source")
        .agg(count(lit(1)).as("n_bigrams"), sum("nll").as("nll_sum"))
        .withColumn("avg_nll_fp", expr("nll_sum DIV n_bigrams"))
      val ref = perSrc.agg(
        expr("sum(nll_sum) DIV sum(n_bigrams)").as("ref_nll_fp"))
      val wts = perSrc.crossJoin(broadcast(ref))
        // excess capped at 4.0 nats: keeps exp() in int64 fixed-point
        // range on ANY data (exp(6)·1e6 ≈ 4e8) — a runaway-loss source
        // saturates the upweight instead of overflowing it
        .withColumn("excess_fp",
          expr("least(greatest(0L, avg_nll_fp - ref_nll_fp), 4000000L)"))
        .withColumn("raw_fp", expr(
          """CAST(FLOOR(exp(CAST(excess_fp AS DOUBLE) * 1.5 / 1000000.0)
            | * 1000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")))
      val tot = wts.agg(sum("raw_fp").as("tot_raw"))
      wts.crossJoin(broadcast(tot))
        .select(col("source"), col("n_bigrams"), col("avg_nll_fp"),
          col("excess_fp"),
          expr("raw_fp * 1000000 DIV tot_raw").as("weight_fp"))
        .orderBy("source")
    }),

    // M39 — CCNet perplexity-bucket filter (Wenzek et al. 2020, the
    // head/middle/tail split the CCNet pipeline runs per language): each
    // document scored by mean per-bigram NLL under the corpus bigram
    // model (M1's model tables verbatim), per-SOURCE tercile cutoffs
    // picked by exact rank (value-at-rank is tie-invariant), every doc
    // bucketed map-side against the broadcast cutoffs. The bucket census
    // is what the filter keeps/drops: head = most fluent third. Scale
    // shape: one token-pair shuffle builds the model, one doc aggregate
    // scores, the cutoff table is |sources|×2 scalars broadcast back —
    // the corpus is never windowed or funneled (CCNet itself computes
    // cutoffs from a sample for exactly this reason).
    "ccnet_ppl_bucket_filter" -> ((s, d) => {
      val lm = LmLayoutOps.baseLm(s, d)
      // scan-spread below the bigram explode (r18, see Spread doc)
      val toks = graft.functions.Spread(
          Tables.documents(s, d)
            .select(col("doc_id"), col("source"), col("text")),
          col("doc_id"))
        .select(col("doc_id"), col("source"),
          split(col("text"), " ").as("a"))
      val bi = toks.filter(size(col("a")) >= 2)
        .select(col("doc_id"), col("source"), explode(expr(
          """transform(sequence(1, size(a) - 1),
            |  i -> named_struct('w1', element_at(a, i), 'w2', element_at(a, i + 1)))"""
            .stripMargin)).as("b"))
        .select(col("doc_id"), col("source"),
          col("b.w1").as("w1"), col("b.w2").as("w2"))
      // materialized once (r18 optimization): the rank pass, the
      // per-source counts and the final bucket census all consume the
      // per-doc score table (|docs| rows), and each used to re-run the
      // corpus-bigram × model join
      val perDoc = bi.join(s.read.parquet(lm), Seq("w1", "w2"))
        .join(broadcast(s.read.parquet(s"$lm.c1")), Seq("w1"))
        .crossJoin(broadcast(s.read.parquet(s"$lm.stats").select("v")))
        .withColumn("nll", expr(nllSql))
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_bigrams"), sum("nll").as("nll_sum"))
        .withColumn("avg_nll_fp", expr("nll_sum DIV n_bigrams"))
        .localCheckpoint()
      // exact tercile cutoffs per source: two-phase global rank within
      // source, value picked at ceil(n/3) and ceil(2n/3) — value-at-rank
      // is the same whichever tied row lands on the rank
      val ranked = graft.functions.GlobalRank.rowNumber(
        perDoc, "rn", Seq("source"), Seq("avg_nll_fp", "doc_id"))
      val cnts = perDoc.groupBy("source").agg(count(lit(1)).as("cnt"))
      val cuts = ranked.join(broadcast(cnts), "source")
        .groupBy("source")
        .agg(
          min(when(col("rn") === ceil(col("cnt") / 3.0), col("avg_nll_fp")))
            .as("e1"),
          min(when(col("rn") === ceil(col("cnt") * 2.0 / 3.0),
            col("avg_nll_fp"))).as("e2"))
      perDoc.join(broadcast(cuts), "source")
        .withColumn("bucket",
          when(col("avg_nll_fp") <= col("e1"), "head")
            .when(col("avg_nll_fp") <= col("e2"), "middle")
            .otherwise("tail"))
        .groupBy("source", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_bigrams").as("n_bigrams"),
          expr("sum(nll_sum) DIV sum(n_bigrams)").as("mean_nll_fp"))
        .orderBy("source", "bucket")
    }),

    // M12 — vocabulary coverage curve: the share of token occurrences
    // covered by the top-{10, 100, 1000} words — the curve a tokenizer /
    // stopword budget is sized from (Zipf's integral form). Rank over
    // the vocab via the two-phase GlobalRank (vocab = one global rank
    // domain), cumulative mass via the matching two-phase prefix sum
    // over the SAME (neg_f, w) order; coverage is an exact 1e-6
    // division at three picked ranks.
    "vocab_coverage_curve" -> ((s, d) => {
      val wc = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .withColumn("neg_f", -col("freq"))
      val tot = wc.agg(sum("freq").as("total_tokens"))
      val ranked = graft.functions.GlobalRank
        .rowNumber(wc, "rn", Nil, Seq("neg_f", "w"))
      graft.functions.GlobalRank
        .prefixSum(ranked, "cum_tokens", col("freq"), Nil, Seq("neg_f", "w"))
        .filter(col("rn").isin(10L, 100L, 1000L))
        .crossJoin(broadcast(tot))
        .select(col("rn").as("cutoff"), col("cum_tokens"),
          col("total_tokens"),
          expr("cum_tokens * 1000000 DIV total_tokens").as("coverage_fp"))
        .orderBy("cutoff")
    }),

    // M2 — BPE pair mining: the inner step of byte-pair-encoding tokenizer
    // training. Adjacent-character pairs are counted once per DISTINCT
    // word (dictionary-sized explode) weighted by word frequency — the
    // corpus-scale work is the word count, one shuffle.
    "bpe_top_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val wc = docs.select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val pairs = wc.filter(length(col("w")) >= 2)
        .select(col("c"), explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      pairs.groupBy("pair").agg(sum("c").as("merge_count"))
        .orderBy(col("merge_count").desc, col("pair")).limit(20)
    }),

    // M2b — BPE merge APPLICATION: tokenize the word dictionary with the
    // mined merge table — the step that completes the tokenizer pipeline
    // (M2 mines pairs; this encodes with them). The merge table is one
    // mining pass's top-[[BpeMerges]] pairs in (count DESC, pair) priority
    // order, collected driver-side as tiny model state (the PQ-codebook
    // pattern; real BPE re-mines between merges — that is a loop of this
    // operator, identical plumbing). Encoding runs on the DISTINCT word
    // dictionary (≪ corpus — the M3 scale argument), never per token
    // occurrence. Each word becomes a |-delimited char-token string
    // ("|c|c|…|"), and each merge (a,b) applies as the string replace
    // "|a|b|" → "|ab|" — token boundaries make false intra-token matches
    // impossible, and BOTH engines' one-pass replace is left-to-right
    // non-overlapping (Java UTF8String and DuckDB agree, verified), so
    // iterating the replace [[BpePasses]] times reaches the same merge
    // fixpoint bit-identically: a pass halves any remaining adjacent
    // occurrence chain, so 8 passes close words up to ~2^8 chars.
    "bpe_apply_encode" -> ((s, d) => bpeEncoded(s, d).orderBy("word")),

    // M2c — tokenizer VOCAB COVERAGE stats: the acceptance report a
    // tokenizer build runs after mining+applying merges (M2/M2b). Each
    // token of the encoded dictionary is weighted by its word's corpus
    // frequency, giving per-token occurrence counts and each token's
    // share of all token occurrences (1e-6 fixed-point — exact integer
    // division, identical in both engines); single-char tokens are the
    // un-merged fallback tail, so their aggregate share is the coverage
    // headline ("how much of the corpus still encodes char-by-char").
    // Scale: everything runs on the DISTINCT-word dictionary (the M2b
    // argument — never per occurrence); the per-token aggregate is
    // vocab-bounded; the total is a single-row broadcast. occurrences ×
    // 1e6 stays < 2^63 while the corpus holds < ~9.2e12 token
    // occurrences — beyond that the share numerator takes DECIMAL.
    // tokenizer FERTILITY by language: BPE tokens emitted per word —
    // the per-language cost gauge a multilingual tokenizer build signs
    // off on (a lang with fertility ≫ others is under-served by the
    // merge table and overpays context budget). Reuses the mined+applied
    // merge table via [[bpeEncoded]]: the corpus collapses map-side to
    // the (lang, word) count table, joins the word-DICTIONARY encoding
    // (dictionary-not-corpus — the join carries vocab rows), and folds
    // to one exact integer ratio per language.
    "tokenizer_fertility_by_lang" -> ((s, d) => {
      val enc = bpeEncoded(s, d).select(col("word").as("w"), col("n_tokens"))
      val lw = Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("c"))
      lw.join(enc, Seq("w"))
        .groupBy("lang")
        .agg(sum("c").as("n_words"),
          sum(expr("c * n_tokens")).as("n_bpe_tokens"))
        .withColumn("fertility_fp",
          expr("n_bpe_tokens * 1000000 DIV n_words"))
        .orderBy("lang")
    }),

    "tokenizer_vocab_coverage" -> ((s, d) => {
      val toks = bpeEncoded(s, d)
        .select(col("word"), col("freq"),
          explode(split(col("tokens"), " ")).as("token"))
      val perTok = toks.groupBy("token").agg(
        sum("freq").as("occurrences"),
        countDistinct("word").as("n_words"))
      val tot = perTok.agg(sum("occurrences").as("total_occ"))
      perTok.crossJoin(broadcast(tot))
        .select(col("token"), length(col("token")).as("token_len"),
          col("n_words"), col("occurrences"),
          expr("occurrences * 1000000 DIV total_occ").as("occ_share_fp"))
        .orderBy(col("occurrences").desc, col("token")).limit(30)
    }),

    // M3 — blocked fuzzy matching (record-linkage dedup candidates): block
    // part names on their head noun, compare DISTINCT names within a block
    // by Levenshtein <= 3, re-expand to row-pair multiplicity
    // arithmetically. The self-join runs on the name dictionary only.
    "fuzzy_pairs_blocked" -> ((s, d) => {
      val names = Tables.part(s, d).groupBy("p_name")
        .agg(count(lit(1)).as("n"))
        .withColumn("blk", expr("element_at(split(p_name, ' '), -1)"))
      val l = names.select(col("blk"), col("p_name").as("name1"), col("n").as("n1"))
      val r = names.select(col("blk"), col("p_name").as("name2"), col("n").as("n2"))
      l.join(r, Seq("blk"))
        .filter(col("name1") <= col("name2"))
        .withColumn("lev", levenshtein(col("name1"), col("name2")))
        .filter(col("lev") <= 3)
        // diagonal pairs only exist when a name repeats (C(n,2) > 0)
        .filter(col("name1") < col("name2") || col("n1") > 1)
        .select(col("blk"), col("name1"), col("name2"), col("lev"),
          when(col("name1") === col("name2"),
            expr("(n1 * (n1 - 1)) DIV 2")).otherwise(expr("n1 * n2")).as("n_pairs"))
        .orderBy("blk", "name1", "name2")
    }),

    // M4 — oriented triangle count on the term co-occurrence graph: edges
    // are term pairs co-occurring in >= 40% of documents (threshold scales
    // with the corpus); orientation u < v < w counts each triangle once.
    // DF-CAP (the SURVEY M4 scale bound): an edge (u,v) requires
    // ndoc(u,v)·5 >= nd·2, and ndoc(u,v) <= min(df(u), df(v)), so only
    // terms whose OWN document frequency clears the edge threshold can
    // ever appear in an edge — the per-doc pair build therefore runs on
    // the df-qualified vocabulary only. LOSSLESS by the inequality
    // above, and it converts the O(L²)-per-document explode into
    // O(H²) where H <= Σdf/(0.4·nd) <= 2.5 × mean distinct-terms/doc —
    // a corpus-level constant, so one pathological 100k-term document
    // can no longer emit 5×10⁹ pairs in a single task. The qualified
    // vocabulary is threshold-bounded, hence broadcast. LangModelSpec
    // pins both the equivalence and the candidate-volume reduction.
    "cooc_triangle_count" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dw = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      // the doc count is a metadata scalar read from parquet FOOTER
      // stats (S6d manifest path, r10) — threading it as a literal
      // keeps the single-row cross-join out of every one of e's four
      // plan expansions, and the footer read replaces the full extra
      // table scan the old driver-measured count() paid per invocation
      val nd = Tables.rowCount(s, d, "documents")
      val hot = dw.groupBy("w").agg(count(lit(1)).as("df"))
        .filter(col("df") * 5 >= lit(nd) * 2)
        .select("w")
      val dwh = dw.join(broadcast(hot), Seq("w")).select("doc_id", "w")
      val a = dwh.select(col("doc_id"), col("w").as("u"))
      val b = dwh.select(col("doc_id"), col("w").as("v"))
      val e = a.join(b, Seq("doc_id")).filter(col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("ndoc"))
        .filter(col("ndoc") * 5 >= lit(nd) * 2)
        .select("u", "v")
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.v") === col("e2.u"))
        .join(e.as("e3"),
          col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
        .agg(count(lit(1)).as("n_triangles"))
      e.agg(count(lit(1)).as("n_edges")).crossJoin(tri)
    }),

    // M6 — pairwise PMI over the SAME df-qualified co-occurrence edges
    // M4 counts: pmi(u,v) = ln(nd·ndoc_uv / (df_u·df_v)), the collocation
    // score a phrase-mining pass ranks candidate merges by. Determinism:
    // every ln() input is a ratio of exact int64 products (ndoc·nd and
    // df_u·df_v both < 2^63 while nd < ~3e9 — past that the products
    // take DECIMAL), so both engines evaluate the identical parse tree
    // over bit-identical doubles (the dsir/bigram precedent), then
    // truncate to 1e-6 fixed-point. Scale: the edge list is
    // df-threshold-bounded (M4's cap argument), the df table is
    // vocabulary-sized — both joins broadcast; top-30 is TakeOrdered.
    "pmi_cooc_topk" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dw = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      val nd = Tables.rowCount(s, d, "documents") // footer-stats literal (M4 precedent)
      val dfs = dw.groupBy("w").agg(count(lit(1)).as("df"))
        .filter(col("df") * 5 >= lit(nd) * 2)
      val dwh = dw.join(broadcast(dfs.select("w")), Seq("w"))
      val a = dwh.select(col("doc_id"), col("w").as("u"))
      val b = dwh.select(col("doc_id"), col("w").as("v"))
      val e = a.join(b, Seq("doc_id")).filter(col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("ndoc"))
        .filter(col("ndoc") * 5 >= lit(nd) * 2)
      e.join(broadcast(dfs.select(col("w").as("u"), col("df").as("df_u"))), "u")
        .join(broadcast(dfs.select(col("w").as("v"), col("df").as("df_v"))), "v")
        .select(col("u"), col("v"), col("ndoc"), col("df_u"), col("df_v"),
          expr(s"""CAST(FLOOR(ln(CAST(ndoc * ${nd}L AS DOUBLE)
                   / CAST(df_u * df_v AS DOUBLE)) * 1000000) AS BIGINT)""")
            .as("pmi_fp"))
        .orderBy(col("pmi_fp").desc, col("u"), col("v")).limit(30)
    }),

    // M7 — OOV-rate audit under a frequency-cutoff vocabulary: the
    // acceptance check run before freezing a tokenizer's word list. The
    // vocabulary keeps words with corpus freq ≥ total/32 (a relative
    // cutoff, scale-invariant); each source is scored by the token share
    // falling outside it. All arithmetic is exact int64 (counts and one
    // 1e-6 fixed-point integer division). Scale: tokens collapse to the
    // (source, word) count table FIRST (map-side combinable — the corpus
    // row stream never reaches a join), the vocabulary is
    // threshold-bounded hence broadcast, and the final aggregate is
    // per-source.
    "oov_rate_by_source" -> ((s, d) => {
      val sw = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      val wf = sw.groupBy("w").agg(sum("c").as("freq"))
      val tot = wf.agg(sum("freq").as("tot"))
      val vocab = wf.crossJoin(broadcast(tot))
        .filter(col("freq") * 32 >= col("tot"))
        .select(col("w"), lit(1L).as("in_v"))
      sw.join(broadcast(vocab), Seq("w"), "left")
        .groupBy("source").agg(
          sum("c").as("n_tokens"),
          sum(when(col("in_v").isNull, col("c")).otherwise(lit(0L)))
            .as("n_oov"))
        .select(col("source"), col("n_tokens"), col("n_oov"),
          expr("n_oov * 1000000 DIV n_tokens").as("oov_rate_fp"))
        .orderBy("source")
    }),

    // M8 — lexical-diversity scoreboard per source: type-token ratio and
    // hapax-legomenon share (Heaps-law corner of corpus QC — a source
    // whose TTR collapses is templated/machine-generated; one whose
    // hapax share explodes is OCR noise). Pure counting: the corpus
    // collapses to the (source, word) count table map-side (M7's
    // argument), then ONE per-source aggregate; ratios are exact 1e-6
    // integer divisions.
    "lexical_diversity_by_source" -> ((s, d) => {
      val sw = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      sw.groupBy("source").agg(
          sum("c").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          col("n_hapax"),
          expr("n_types * 1000000 DIV n_tokens").as("ttr_fp"),
          expr("n_hapax * 1000000 DIV n_types").as("hapax_share_fp"))
        .orderBy("source")
    }),

    // MATTR moving-average type-token ratio per source (r12, fourth
    // session; Covington & McFall 2010): plain TTR falls with document
    // length (exactly the bias lexical_diversity_by_source carries),
    // so MATTR averages distinct/W over every sliding W-token window —
    // the length-invariant lexical-diversity read. W = 25, scaled to
    // the 10–99-token fixture docs (the paper's 50/100 presume running
    // prose); docs shorter than W fall back to plain TTR and are
    // counted in n_short_docs. Per-doc work is ONE higher-order
    // expression (sequence → slice → array_distinct → integer
    // aggregate) — token-linear × W, no explode, no shuffle before the
    // per-source rollup; the per-doc ratio truncates BEFORE the source
    // mean (two stacked exact integer divisions, order-free).
    "mattr_lexical_diversity" -> ((s, d) => {
      val W = 25
      Tables.documents(s, d)
        .select(col("source"), split(col("text"), " ").as("a"))
        .withColumn("len", expr("CAST(size(a) AS BIGINT)"))
        .withColumn("short_doc",
          expr(s"CAST(CASE WHEN len < $W THEN 1 ELSE 0 END AS BIGINT)"))
        .withColumn("mattr_fp", expr(
          s"""CASE WHEN len < $W
             | THEN CAST(size(array_distinct(a)) AS BIGINT) * 1000000 DIV len
             | ELSE aggregate(transform(sequence(1, CAST(len AS INT) - ${W - 1}),
             |     i -> size(array_distinct(slice(a, i, $W)))),
             |   CAST(0 AS BIGINT), (acc, x) -> acc + x) * 1000000
             |   DIV ($W * (len - ${W - 1})) END"""
            .stripMargin.replace("\n", " ")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("short_doc").as("n_short_docs"),
          sum("mattr_fp").as("sum_mattr_fp"))
        .withColumn("mean_mattr_fp", expr("sum_mattr_fp DIV n_docs"))
        .orderBy("source")
    }),

    // M9 — Zipf rank–frequency fit over the token unigram table: OLS
    // slope of ln(freq) on ln(rank) for the top-1000 tokens — the
    // one-number "is this corpus natural language?" check (Zipfian text
    // slopes near −1; templated or synthetic text flattens or cliffs).
    // Rank is GlobalRank-defined over (freq DESC, w) — the vocabulary is
    // one global rank domain (single-partition window trap). Each
    // regressor is FLOOR-truncated 1e-6 fixed-point of ln() over exact
    // int64 (dsir precedent); the four moment sums stay int64
    // (x_fp·y_fp ≤ ~2e14 per row × 1000 rows); the final normal-equation
    // combination lifts to DECIMAL(38,0)/HUGEINT (n·Σxy ≈ 1e20 passes
    // int64). Zipf slope is negative, so the output is NEGATED — both
    // engines truncate the positive quotient identically (toward-zero
    // DIV = floor //).
    "zipf_rank_frequency" -> ((s, d) => {
      val wc = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      val ranked = graft.functions.GlobalRank.rowNumber(
        wc.withColumn("neg_f", -col("freq")), "rn", Nil, Seq("neg_f", "w"))
      val pts = ranked.filter(col("rn") <= 1000)
        .select(col("freq"),
          expr("CAST(FLOOR(ln(CAST(rn AS DOUBLE)) * 1000000) AS BIGINT)")
            .as("x"),
          expr("CAST(FLOOR(ln(CAST(freq AS DOUBLE)) * 1000000) AS BIGINT)")
            .as("y"))
      pts.agg(count(lit(1)).as("n_points"), sum("freq").as("top_freq"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
        .select(col("n_points"), col("top_freq"),
          expr("""CAST((CAST(sx AS DECIMAL(38,0)) * sy
                   - CAST(n_points AS DECIMAL(38,0)) * sxy) * 1000000
                 DIV (CAST(n_points AS DECIMAL(38,0)) * sxx
                   - CAST(sx AS DECIMAL(38,0)) * sx)
                 AS BIGINT)""").as("zipf_slope_neg_fp"))
    }),

    // Token-level conditional entropy rate per source (r12, fifth
    // session): H(w₂|w₁) = Σ (c₁₂/N)·ln(c₁/c₁₂) over each source's
    // OWN bigram table — the text-domain sibling of the event-stream
    // markov_entropy_rate and the sharpest single-number repetition
    // read: templated/boilerplate sources have near-deterministic
    // next-token distributions (H→0) while natural prose sits high;
    // the Gopher-style quality gate reads exactly this (Rae et al.
    // 2021 use the repetition family; conditional entropy is its
    // information-theoretic summary). Scale: token-linear bigram
    // explode map-side; counts keyed (source,w₁,w₂) then (source,w₁)
    // — both combinable; the context join is bigram-type-bounded;
    // each term is ONE FLOOR'd IEEE leaf over exact counts (≥0 since
    // c₁ ≥ c₁₂), integer-summed, ONE division per source.
    "token_bigram_cond_entropy" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"), split(col("text"), " ").as("a"))
      val bi = toks.filter(size(col("a")) >= 2)
        .select(col("source"), explode(expr(
          """transform(sequence(1, size(a) - 1),
            |  i -> named_struct('w1', element_at(a, i),
            |                    'w2', element_at(a, i + 1)))"""
            .stripMargin)).as("b"))
        .select(col("source"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c12 = bi.groupBy("source", "w1", "w2")
        .agg(count(lit(1)).as("c12"))
      val c1 = c12.groupBy("source", "w1").agg(sum("c12").as("c1"))
      c12.join(c1, Seq("source", "w1"))
        .withColumn("term_fp", expr(
          """CAST(FLOOR(CAST(c12 AS DOUBLE)
            | * ln(CAST(c1 AS DOUBLE) / c12) * 1000000.0) AS BIGINT)"""
            .stripMargin.replace("\n", " ")))
        .groupBy("source")
        .agg(sum("c12").as("n_bigrams"),
          count(lit(1)).as("n_bigram_types"),
          sum(when(col("c1") === col("c12"), col("c12")).otherwise(0L))
            .as("n_deterministic"),
          sum("term_fp").as("sum_fp"))
        .select(col("source"), col("n_bigrams"), col("n_bigram_types"),
          col("n_deterministic"),
          expr("sum_fp DIV n_bigrams").as("h_cond_fp"))
        .orderBy("source")
    }),
  )

  /** Shared DuckDB CTE prefix for the BPE pipeline oracles: re-mine the
    * merge table in SQL, apply it as a recursive CTE over merge rank
    * (state = the chr(31)-delimited token string, one step per merge,
    * [[BpePasses]] nested one-pass replaces per step — the identical op
    * sequence the Spark column expression evaluates), ending in
    * `fin(w, freq, t)` with `t` the trimmed chr(31)-delimited encoding.
    * Consumers append either the final SELECT (bpe_apply_encode) or
    * further CTEs (tokenizer_vocab_coverage).
    */
  private def bpeEncodeCtesDuck: String = {
    val find = "chr(31) || substr(m.pair, 1, 1) || chr(31) || " +
      "substr(m.pair, 2, 1) || chr(31)"
    val repl = "chr(31) || m.pair || chr(31)"
    val nested = (1 to BpePasses).foldLeft("e.t")((acc, _) =>
      s"replace($acc, $find, $repl)")
    s"""WITH RECURSIVE words AS (
       |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |wc AS (
       |  SELECT w, count(*) AS freq FROM words
       |  WHERE len(w) >= 1 AND instr(w, chr(31)) = 0 GROUP BY w),
       |prs AS (
       |  SELECT substr(w, CAST(i AS INT), 2) AS pair, freq AS c
       |  FROM wc, UNNEST(range(1, len(w))) AS t(i)
       |  WHERE len(w) >= 2),
       |merges AS (
       |  SELECT pair, row_number() OVER (ORDER BY sum(c) DESC, pair) AS rk
       |  FROM prs GROUP BY pair
       |  ORDER BY sum(c) DESC, pair LIMIT $BpeMerges),
       |enc(w, freq, t, k) AS (
       |  SELECT w, freq,
       |         chr(31) || array_to_string(string_split(w, ''), chr(31))
       |           || chr(31),
       |         0
       |  FROM wc
       |  UNION ALL
       |  SELECT e.w, e.freq, $nested, e.k + 1
       |  FROM enc e JOIN merges m ON m.rk = e.k + 1),
       |fin AS (
       |  -- the recursion stops at |merges| steps, which is LIMIT-capped
       |  -- at $BpeMerges but SMALLER on a degenerate corpus yielding
       |  -- fewer distinct pairs — select the final state by the actual
       |  -- merge count, not the constant (ADVICE r7)
       |  SELECT w, freq, trim(t, chr(31)) AS t FROM enc
       |  WHERE k = (SELECT count(*) FROM merges))""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "rho_loss_selection" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a
         |             FROM documents),
         |words AS (SELECT doc_id, unnest(a) AS w FROM toks),
         |vv AS (SELECT count(DISTINCT w) AS v FROM words),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM words),
         |cwt AS (SELECT w AS w2, CAST(count(*) AS BIGINT) AS cu
         |        FROM words GROUP BY 1),
         |bi AS (SELECT doc_id, a[CAST(i AS INT)] AS w1,
         |              a[CAST(i AS INT) + 1] AS w2
         |       FROM toks, UNNEST(range(1, len(a))) AS t(i)),
         |c2t AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
         |c1t AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
         |sc AS (SELECT doc_id, $nllSql AS bi_nll, $uniNllSql AS uni_nll
         |       FROM bi JOIN c2t USING (w1, w2) JOIN c1t USING (w1)
         |            JOIN cwt USING (w2) CROSS JOIN vv CROSS JOIN nt),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |               CAST(sum(uni_nll) AS BIGINT) AS uni_nll_sum,
         |               CAST(sum(bi_nll) AS BIGINT) AS bi_nll_sum
         |        FROM sc GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, uni_nll_sum, bi_nll_sum,
         |       CASE WHEN uni_nll_sum - bi_nll_sum >= 0
         |         THEN CAST((uni_nll_sum - bi_nll_sum) // n_bigrams AS BIGINT)
         |       ELSE -CAST((bi_nll_sum - uni_nll_sum) // n_bigrams AS BIGINT)
         |       END AS reducible_fp
         |FROM agg ORDER BY reducible_fp DESC, doc_id LIMIT 20""".stripMargin,

    "span_corruption_mask" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |wins AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS win_idx,
        |         array_to_string(t[(i*3+1):(i*3+3)], ' ') AS win
        |  FROM toks CROSS JOIN range(0, 4096) r(i) WHERE i < ceil(len(t) / 3.0)),
        |flagged AS (
        |  SELECT doc_id, win_idx, win,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '_' ||
        |           CAST(win_idx AS VARCHAR)), 1, 8)) AS BIGINT) % 20 < 3 AS masked
        |  FROM wins),
        |sent AS (
        |  SELECT doc_id, win_idx, win, masked,
        |         sum(CASE WHEN masked THEN 1 ELSE 0 END) OVER (
        |           PARTITION BY doc_id ORDER BY win_idx) AS sent_id
        |  FROM flagged)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_windows,
        |       CAST(count(*) FILTER (WHERE masked) AS BIGINT) AS n_masked,
        |       string_agg(CASE WHEN masked
        |           THEN '<extra_id_' || CAST(sent_id AS VARCHAR) || '>'
        |           ELSE win END, ' ' ORDER BY win_idx) AS corrupted,
        |       coalesce(string_agg(CASE WHEN masked
        |           THEN '<extra_id_' || CAST(sent_id AS VARCHAR) || '> ' || win END,
        |           ' ' ORDER BY win_idx) FILTER (WHERE masked), '') AS targets
        |FROM sent GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "bigram_lm_perplexity" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |words AS (SELECT doc_id, unnest(a) AS w FROM toks),
         |vv AS (SELECT count(DISTINCT w) AS v FROM words),
         |bi AS (SELECT doc_id, a[CAST(i AS INT)] AS w1, a[CAST(i AS INT) + 1] AS w2
         |       FROM toks, UNNEST(range(1, len(a))) AS t(i)),
         |c2t AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
         |c1t AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
         |sc AS (SELECT doc_id, $nllSql AS nll
         |       FROM bi JOIN c2t USING (w1, w2) JOIN c1t USING (w1) CROSS JOIN vv),
         |agg AS (SELECT doc_id, count(*) AS n_bigrams,
         |               CAST(sum(nll) AS BIGINT) AS nll_sum
         |        FROM sc GROUP BY doc_id)
         |SELECT doc_id, n_bigrams,
         |       CAST(nll_sum // n_bigrams AS BIGINT) AS avg_nll_fp
         |FROM agg ORDER BY avg_nll_fp DESC, doc_id LIMIT 20""".stripMargin,

    // identical model tables + NLL leaf as bigram_lm_perplexity, rolled
    // up per source
    "cross_entropy_by_source" ->
      s"""WITH toks AS (SELECT source, string_split(text, ' ') AS a FROM documents),
         |words AS (SELECT unnest(a) AS w FROM toks),
         |vv AS (SELECT count(DISTINCT w) AS v FROM words),
         |bi AS (SELECT source, a[CAST(i AS INT)] AS w1, a[CAST(i AS INT) + 1] AS w2
         |       FROM toks, UNNEST(range(1, len(a))) AS t(i)),
         |c2t AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
         |c1t AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
         |sc AS (SELECT source, $nllSql AS nll
         |       FROM bi JOIN c2t USING (w1, w2) JOIN c1t USING (w1) CROSS JOIN vv),
         |agg AS (SELECT source, count(*) AS n_bigrams,
         |               CAST(sum(nll) AS BIGINT) AS nll_sum
         |        FROM sc GROUP BY source)
         |SELECT source, CAST(n_bigrams AS BIGINT) AS n_bigrams,
         |       CAST(nll_sum // n_bigrams AS BIGINT) AS avg_nll_fp
         |FROM agg ORDER BY source""".stripMargin,

    // same model CTEs as cross_entropy_by_source + the closed-form
    // multiplicative-weights reweight
    "doremi_excess_loss_reweight" ->
      s"""WITH toks AS (SELECT source, string_split(text, ' ') AS a FROM documents),
         |words AS (SELECT unnest(a) AS w FROM toks),
         |vv AS (SELECT count(DISTINCT w) AS v FROM words),
         |bi AS (SELECT source, a[CAST(i AS INT)] AS w1, a[CAST(i AS INT) + 1] AS w2
         |       FROM toks, UNNEST(range(1, len(a))) AS t(i)),
         |c2t AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
         |c1t AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
         |sc AS (SELECT source, $nllSql AS nll
         |       FROM bi JOIN c2t USING (w1, w2) JOIN c1t USING (w1) CROSS JOIN vv),
         |agg AS (SELECT source, count(*) AS n_bigrams,
         |               CAST(sum(nll) AS BIGINT) AS nll_sum
         |        FROM sc GROUP BY source),
         |src AS (SELECT source, n_bigrams, nll_sum,
         |               CAST(nll_sum // n_bigrams AS BIGINT) AS avg_nll_fp
         |        FROM agg),
         |ref AS (SELECT CAST(sum(nll_sum) // sum(n_bigrams) AS BIGINT)
         |               AS ref_nll_fp FROM src),
         |wts AS (SELECT source, n_bigrams, avg_nll_fp,
         |               least(greatest(0, avg_nll_fp - ref_nll_fp), 4000000)
         |                 AS excess_fp
         |        FROM src CROSS JOIN ref),
         |raw AS (SELECT *,
         |          CAST(FLOOR(exp(CAST(excess_fp AS DOUBLE) * 1.5 / 1000000.0)
         |            * 1000000.0) AS BIGINT) AS raw_fp
         |        FROM wts),
         |tot AS (SELECT CAST(sum(raw_fp) AS BIGINT) AS tot_raw FROM raw)
         |SELECT source, CAST(n_bigrams AS BIGINT) AS n_bigrams, avg_nll_fp,
         |       CAST(excess_fp AS BIGINT) AS excess_fp,
         |       CAST(raw_fp * 1000000 // tot_raw AS BIGINT) AS weight_fp
         |FROM raw CROSS JOIN tot ORDER BY source""".stripMargin,

    // same model CTEs; per-doc mean NLL, tercile cutoffs by exact rank,
    // bucket census — integer fixed-point end to end
    "ccnet_ppl_bucket_filter" ->
      s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS a
         |              FROM documents),
         |words AS (SELECT unnest(a) AS w FROM toks),
         |vv AS (SELECT count(DISTINCT w) AS v FROM words),
         |bi AS (SELECT doc_id, source, a[CAST(i AS INT)] AS w1,
         |              a[CAST(i AS INT) + 1] AS w2
         |       FROM toks, UNNEST(range(1, len(a))) AS t(i)),
         |c2t AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
         |c1t AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
         |sc AS (SELECT doc_id, source, $nllSql AS nll
         |       FROM bi JOIN c2t USING (w1, w2) JOIN c1t USING (w1) CROSS JOIN vv),
         |per_doc AS (SELECT doc_id, source, count(*) AS n_bigrams,
         |                   CAST(sum(nll) AS BIGINT) AS nll_sum,
         |                   CAST(CAST(sum(nll) AS BIGINT) // count(*) AS BIGINT)
         |                     AS avg_nll_fp
         |            FROM sc GROUP BY doc_id, source),
         |rk AS (SELECT *,
         |              row_number() OVER (PARTITION BY source
         |                ORDER BY avg_nll_fp, doc_id) AS rn,
         |              count(*) OVER (PARTITION BY source) AS cnt
         |       FROM per_doc),
         |cuts AS (SELECT source,
         |                min(CASE WHEN rn = ceil(cnt / 3.0)
         |                    THEN avg_nll_fp END) AS e1,
         |                min(CASE WHEN rn = ceil(cnt * 2.0 / 3.0)
         |                    THEN avg_nll_fp END) AS e2
         |         FROM rk GROUP BY source),
         |bucketed AS (SELECT p.*, CASE WHEN p.avg_nll_fp <= c.e1 THEN 'head'
         |                             WHEN p.avg_nll_fp <= c.e2 THEN 'middle'
         |                             ELSE 'tail' END AS bucket
         |             FROM per_doc p JOIN cuts c USING (source))
         |SELECT source, bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
         |       CAST(CAST(sum(nll_sum) AS BIGINT) //
         |         CAST(sum(n_bigrams) AS BIGINT) AS BIGINT) AS mean_nll_fp
         |FROM bucketed GROUP BY source, bucket
         |ORDER BY source, bucket""".stripMargin,

    // same (freq DESC, w) total order for rank and running mass
    "vocab_coverage_curve" ->
      """WITH wc AS (
        |  SELECT w, count(*) AS freq FROM
        |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |rk AS (
        |  SELECT w, freq,
        |         row_number() OVER (ORDER BY freq DESC, w) AS rn,
        |         sum(freq) OVER (ORDER BY freq DESC, w
        |           ROWS UNBOUNDED PRECEDING) AS cum_tokens
        |  FROM wc),
        |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total_tokens FROM wc)
        |SELECT CAST(rn AS BIGINT) AS cutoff,
        |       CAST(cum_tokens AS BIGINT) AS cum_tokens, total_tokens,
        |       CAST(CAST(cum_tokens AS BIGINT) * 1000000 // total_tokens
        |         AS BIGINT) AS coverage_fp
        |FROM rk CROSS JOIN tot WHERE rn IN (10, 100, 1000)
        |ORDER BY cutoff""".stripMargin,

    "bpe_top_pairs" ->
      """WITH words AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS c FROM words GROUP BY w),
        |pairs AS (
        |  SELECT substr(w, CAST(i AS INT), 2) AS pair, c
        |  FROM wc, UNNEST(range(1, len(w))) AS t(i)
        |  WHERE len(w) >= 2)
        |SELECT pair, CAST(sum(c) AS BIGINT) AS merge_count
        |FROM pairs GROUP BY pair
        |ORDER BY merge_count DESC, pair LIMIT 20""".stripMargin,

    // merge table re-mined in SQL, applied as a recursive CTE over merge
    // rank — see [[bpeEncodeCtesDuck]]
    "bpe_apply_encode" -> (bpeEncodeCtesDuck +
      """
        |SELECT w AS word, freq,
        |       CAST(length(t) - length(replace(t, chr(31), '')) + 1 AS INT)
        |         AS n_tokens,
        |       replace(t, chr(31), ' ') AS tokens
        |FROM fin ORDER BY word""".stripMargin),

    // per-token aggregation of the SAME encoded dictionary the
    // bpe_apply_encode oracle derives; exact integer share division
    "tokenizer_vocab_coverage" -> (bpeEncodeCtesDuck +
      """,
        |toks AS (
        |  SELECT w, freq, unnest(string_split(t, chr(31))) AS token FROM fin),
        |pertok AS (
        |  SELECT token, CAST(sum(freq) AS BIGINT) AS occurrences,
        |         count(DISTINCT w) AS n_words
        |  FROM toks GROUP BY token),
        |tot AS (SELECT CAST(sum(occurrences) AS BIGINT) AS total_occ FROM pertok)
        |SELECT token, CAST(length(token) AS INTEGER) AS token_len,
        |       n_words, occurrences,
        |       CAST(occurrences * 1000000 // total_occ AS BIGINT) AS occ_share_fp
        |FROM pertok CROSS JOIN tot
        |ORDER BY occurrences DESC, token LIMIT 30""".stripMargin),

    // same recursive merge application; per-lang word counts join the
    // encoded dictionary, exact integer fertility ratio
    "tokenizer_fertility_by_lang" -> (bpeEncodeCtesDuck +
      """,
        |lwc AS (
        |  SELECT lang, w, count(*) AS c FROM
        |    (SELECT lang, unnest(string_split(text, ' ')) AS w
        |     FROM documents)
        |  GROUP BY lang, w),
        |enc2 AS (
        |  SELECT w, CAST(len(string_split(t, chr(31))) AS BIGINT)
        |           AS n_tokens
        |  FROM fin)
        |SELECT lang, CAST(sum(c) AS BIGINT) AS n_words,
        |       CAST(sum(c * n_tokens) AS BIGINT) AS n_bpe_tokens,
        |       CAST(CAST(sum(c * n_tokens) AS BIGINT) * 1000000
        |         // CAST(sum(c) AS BIGINT) AS BIGINT) AS fertility_fp
        |FROM lwc JOIN enc2 USING (w)
        |GROUP BY lang ORDER BY lang""".stripMargin),

    "fuzzy_pairs_blocked" ->
      """WITH names AS (
        |  SELECT p_name, count(*) AS n,
        |         string_split(p_name, ' ')[-1] AS blk
        |  FROM part GROUP BY p_name)
        |SELECT l.blk, l.p_name AS name1, r.p_name AS name2,
        |       CAST(levenshtein(l.p_name, r.p_name) AS INT) AS lev,
        |       CAST(CASE WHEN l.p_name = r.p_name THEN (l.n * (l.n - 1)) // 2
        |                 ELSE l.n * r.n END AS BIGINT) AS n_pairs
        |FROM names l JOIN names r
        |  ON l.blk = r.blk AND l.p_name <= r.p_name
        |WHERE levenshtein(l.p_name, r.p_name) <= 3
        |  AND (l.p_name < r.p_name OR l.n > 1)
        |ORDER BY l.blk, name1, name2""".stripMargin,

    "cooc_triangle_count" ->
      """WITH dw0 AS (SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)),
        |nd AS (SELECT count(*) AS nd FROM documents),
        |hot AS (
        |  SELECT w FROM dw0 CROSS JOIN nd
        |  GROUP BY w, nd HAVING count(*) * 5 >= nd * 2),
        |dw AS (SELECT doc_id, w FROM dw0 JOIN hot USING (w)),
        |e AS (
        |  SELECT a.w AS u, b.w AS v
        |  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
        |  CROSS JOIN nd
        |  GROUP BY a.w, b.w, nd.nd
        |  HAVING count(*) * 5 >= nd * 2),
        |tri AS (
        |  SELECT count(*) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e1.v = e2.u
        |            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT (SELECT count(*) FROM e) AS n_edges, n_triangles FROM tri""".stripMargin,

    // identical df-qualified edge chain as cooc_triangle_count; identical
    // exact-int64 ln() input and toward-neg-inf FLOOR 1e-6 truncation
    "pmi_cooc_topk" ->
      """WITH dw0 AS (SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)),
        |nd AS (SELECT count(*) AS nd FROM documents),
        |dfs AS (
        |  SELECT w, count(*) AS df FROM dw0 CROSS JOIN nd
        |  GROUP BY w, nd HAVING count(*) * 5 >= nd * 2),
        |dw AS (SELECT doc_id, w FROM dw0 JOIN dfs USING (w)),
        |e AS (
        |  SELECT a.w AS u, b.w AS v, count(*) AS ndoc
        |  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
        |  CROSS JOIN nd
        |  GROUP BY a.w, b.w, nd.nd
        |  HAVING count(*) * 5 >= nd * 2)
        |SELECT e.u, e.v, e.ndoc,
        |       du.df AS df_u, dv.df AS df_v,
        |       CAST(FLOOR(ln(CAST(e.ndoc * nd.nd AS DOUBLE)
        |         / CAST(du.df * dv.df AS DOUBLE)) * 1000000) AS BIGINT) AS pmi_fp
        |FROM e JOIN dfs du ON e.u = du.w
        |       JOIN dfs dv ON e.v = dv.w
        |       CROSS JOIN nd
        |ORDER BY pmi_fp DESC, u, v LIMIT 30""".stripMargin,

    "oov_rate_by_source" ->
      """WITH sw AS (
        |  SELECT source, w, count(*) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY source, w),
        |wf AS (SELECT w, sum(c) AS freq FROM sw GROUP BY w),
        |tot AS (SELECT sum(freq) AS tot FROM wf),
        |vocab AS (SELECT w FROM wf CROSS JOIN tot WHERE freq * 32 >= tot)
        |SELECT sw.source,
        |       CAST(sum(sw.c) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN v.w IS NULL THEN sw.c ELSE 0 END) AS BIGINT)
        |         AS n_oov,
        |       CAST(sum(CASE WHEN v.w IS NULL THEN sw.c ELSE 0 END) * 1000000
        |         // sum(sw.c) AS BIGINT) AS oov_rate_fp
        |FROM sw LEFT JOIN vocab v ON sw.w = v.w
        |GROUP BY sw.source ORDER BY source""".stripMargin,

    "lexical_diversity_by_source" ->
      """WITH sw AS (
        |  SELECT source, w, count(*) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY source, w)
        |SELECT source,
        |       CAST(sum(c) AS BIGINT) AS n_tokens,
        |       CAST(count(*) AS BIGINT) AS n_types,
        |       CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
        |       CAST(count(*) * 1000000 // sum(c) AS BIGINT) AS ttr_fp,
        |       CAST(count(*) FILTER (WHERE c = 1) * 1000000 // count(*)
        |         AS BIGINT) AS hapax_share_fp
        |FROM sw GROUP BY source ORDER BY source""".stripMargin,

    // same W=25 sliding windows via list_transform/list_slice; the
    // per-doc ratio truncates before the per-source mean on both sides
    "mattr_lexical_diversity" ->
      """WITH t AS MATERIALIZED (
        |  SELECT source, string_split(text, ' ') AS a,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS l
        |  FROM documents),
        |m AS MATERIALIZED (
        |  SELECT source,
        |    CASE WHEN l < 25 THEN 1 ELSE 0 END AS short_doc,
        |    CASE WHEN l < 25
        |      THEN CAST(len(list_distinct(a)) AS BIGINT) * 1000000 // l
        |      ELSE CAST(list_sum(list_transform(range(1, CAST(l AS INT) - 23),
        |             i -> len(list_distinct(list_slice(a, i, i + 24)))))
        |           AS BIGINT) * 1000000 // (25 * (l - 24))
        |    END AS mattr_fp
        |  FROM t)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(short_doc) AS BIGINT) AS n_short_docs,
        |       CAST(sum(mattr_fp) AS BIGINT) AS sum_mattr_fp,
        |       CAST(sum(mattr_fp) // count(*) AS BIGINT) AS mean_mattr_fp
        |FROM m GROUP BY source ORDER BY source""".stripMargin,

    // identical (freq DESC, w) rank, identical FLOOR(ln·1e6) regressors,
    // HUGEINT normal equations, negated positive quotient
    "zipf_rank_frequency" ->
      """WITH wc AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |r AS (
        |  SELECT freq, row_number() OVER (ORDER BY freq DESC, w) AS rn
        |  FROM wc),
        |pts AS (
        |  SELECT freq,
        |         CAST(FLOOR(ln(CAST(rn AS DOUBLE)) * 1000000) AS BIGINT) AS x,
        |         CAST(FLOOR(ln(CAST(freq AS DOUBLE)) * 1000000) AS BIGINT) AS y
        |  FROM r WHERE rn <= 1000)
        |SELECT CAST(count(*) AS BIGINT) AS n_points,
        |       CAST(sum(freq) AS BIGINT) AS top_freq,
        |       CAST((sum(x) * sum(y) - count(*) * sum(CAST(x AS HUGEINT) * y))
        |              * 1000000
        |         // (count(*) * sum(CAST(x AS HUGEINT) * x)
        |              - sum(x) * sum(x)) AS BIGINT) AS zipf_slope_neg_fp
        |FROM pts""".stripMargin,

    // same per-source bigram tables; identical FLOOR'd entropy leaf
    "token_bigram_cond_entropy" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT source, string_split(text, ' ') AS a FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bi AS MATERIALIZED (
        |  SELECT source, a[CAST(i AS INT)] AS w1,
        |         a[CAST(i AS INT) + 1] AS w2
        |  FROM toks, UNNEST(range(1, len(a))) AS t(i)),
        |c12t AS MATERIALIZED (
        |  SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS c12
        |  FROM bi GROUP BY 1, 2, 3),
        |c1t AS MATERIALIZED (
        |  SELECT source, w1, CAST(sum(c12) AS BIGINT) AS c1
        |  FROM c12t GROUP BY 1, 2),
        |terms AS (
        |  SELECT c12t.source, c12, c1,
        |         CAST(FLOOR(CAST(c12 AS DOUBLE)
        |           * ln(CAST(c1 AS DOUBLE) / c12) * 1000000.0) AS BIGINT)
        |           AS term_fp
        |  FROM c12t JOIN c1t USING (source, w1))
        |SELECT source, CAST(sum(c12) AS BIGINT) AS n_bigrams,
        |       CAST(count(*) AS BIGINT) AS n_bigram_types,
        |       CAST(sum(CASE WHEN c1 = c12 THEN c12 ELSE 0 END) AS BIGINT)
        |         AS n_deterministic,
        |       CAST(CAST(sum(term_fp) AS BIGINT) // sum(c12) AS BIGINT)
        |         AS h_cond_fp
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,
  )
}
