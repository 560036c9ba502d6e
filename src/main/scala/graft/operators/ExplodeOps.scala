package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flatten / explode / generator operators (SURVEY.md §2.E).
  *
  * The reference's nested model: one album document holds a REPEATED
  * `tracks.items` record array (albums_schema.json:123-209), exploded to a
  * flat track-id list in the ETL (app.py:183-190), and re-chunked into
  * fixed-size batches for enrichment calls (app.py:170,193). The fixture
  * tables are flat, so each query first *builds* the nested form with
  * `collect_list(struct(...))` (order pinned by `sort_array` or explicit
  * window — SURVEY.md §5 determinism rule) and then flattens it back,
  * proving the explode is the exact inverse.
  *
  * Scale: collect_list groups are per-order (≤7 rows each in fixtures,
  * bounded by page size 50 in the reference) — the pattern is safe as long
  * as group cardinality is bounded, which the reference's pagination
  * guarantees; unbounded groups would need a streaming re-chunk instead.
  */
object ExplodeOps extends OpGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E1 — parent → N child rows (app.py:183-190): nest lineitems under
    // their order, explode back, count children per parent.
    // single exchange: range partitioning on the key up front satisfies
    // both groupBys' clustering AND the final sort's distribution
    "explode_child_rows" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .repartitionByRange(s.sparkContext.defaultParallelism, col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(collect_list(struct(col("l_linenumber"), col("l_partkey"))).as("items"))
        .select(col("l_orderkey"), explode(col("items")).as("item"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_children"))
        .orderBy("l_orderkey")),

    // E2 — REPEATED scalar explode (genres, artists_schema.json:5): word
    // arrays from p_name, exploded to a word-frequency table.
    "explode_array_field" -> ((s, d) =>
      Tables.part(s, d)
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("word"))),

    // E3 — REPEATED record explode (images[]/artists[],
    // albums_schema.json:81-108): struct array built per order, exploded,
    // fields projected back out — identity on the original rows.
    "explode_struct_array" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .repartitionByRange(s.sparkContext.defaultParallelism, col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(collect_list(struct(col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"))).as("items"))
        .select(col("l_orderkey"), explode(col("items")).as("it"))
        .select(col("l_orderkey"), col("it.l_linenumber").as("l_linenumber"),
          col("it.l_partkey").as("l_partkey"), col("it.l_suppkey").as("l_suppkey"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    // E4 — posexplode: position within parent vs stored ordinal
    // (track_number, albums_schema.json:140-141). sort_array pins struct
    // order (lexicographic on fields) before positions are assigned.
    // ONE exchange total: the up-front range partitioning on l_orderkey
    // satisfies both the groupBy's clustering (same-key rows co-located)
    // and the output sort's ordered distribution (key ranges don't
    // straddle partitions), so neither plans a second shuffle.
    "posexplode_tracknum" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .repartitionByRange(s.sparkContext.defaultParallelism, col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(struct(col("l_linenumber"),
          col("l_partkey"), col("l_suppkey")))).as("items"))
        .select(col("l_orderkey"), posexplode(col("items")).as(Seq("pos", "it")))
        .select(col("l_orderkey"), col("pos"),
          col("it.l_linenumber").as("l_linenumber"),
          col("it.l_partkey").as("l_partkey"))
        .orderBy("l_orderkey", "pos")),

    // E5 — inverse of explode: fixed-size batch chunking of an id list
    // (app.py:170,193 — chunks of 20). floor((rn-1)/20) is the batch key;
    // deterministic because the id ordering is total. The rank comes from
    // GlobalRank's two-phase scheme (range-partition → local row_number →
    // broadcast offset ladder), not a partition-less window.
    "batch_chunks" -> ((s, d) => {
      // localCheckpoint: GlobalRank makes three passes over its input (span,
      // slice counts, final rank) — materialize the distinct once so each
      // pass reads the compact id list (longs only), not scan+distinct of
      // the fact table. Executor-storage-backed, so it holds at cluster
      // scale for a key column (≈8 B/row); a lost executor recomputes.
      val ids = Tables.lineitem(s, d).select("l_orderkey").distinct()
        .localCheckpoint()
      graft.functions.GlobalRank.rowNumber(ids, "rn", Nil, Seq("l_orderkey"))
        .withColumn("batch_id", ((col("rn") - 1) / 20).cast("long"))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n_ids"),
          min(col("l_orderkey")).as("first_id"),
          max(col("l_orderkey")).as("last_id"))
        .orderBy("batch_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "explode_child_rows" ->
      """SELECT l_orderkey, count(*) AS n_children
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "explode_array_field" ->
      """SELECT word, count(*) AS n FROM
        |  (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
        |GROUP BY word ORDER BY n DESC, word""".stripMargin,
    "explode_struct_array" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "posexplode_tracknum" ->
      """SELECT l_orderkey,
        |       CAST(row_number() OVER (PARTITION BY l_orderkey
        |         ORDER BY l_linenumber, l_partkey, l_suppkey) - 1 AS INTEGER) AS pos,
        |       l_linenumber, l_partkey
        |FROM lineitem ORDER BY l_orderkey, pos""".stripMargin,
    "batch_chunks" ->
      """WITH ids AS (
        |  SELECT l_orderkey, row_number() OVER (ORDER BY l_orderkey) AS rn
        |  FROM (SELECT DISTINCT l_orderkey FROM lineitem)
        |)
        |SELECT CAST((rn - 1) // 20 AS BIGINT) AS batch_id, count(*) AS n_ids,
        |       min(l_orderkey) AS first_id, max(l_orderkey) AS last_id
        |FROM ids GROUP BY batch_id ORDER BY batch_id""".stripMargin,
  )
}
