package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE / CDC-apply — the incremental alternative to the reference's
  * WRITE_TRUNCATE reload (app.py:207 loads every run's full snapshot;
  * BigQuery users express the incremental form as MERGE INTO). A CDC
  * batch of I/U/D ops is applied to a target snapshot:
  *
  *   - matched + op='U'  → target row survives with updated columns
  *     (target-owned columns kept, payload columns taken from the batch)
  *   - matched + op='D'  → target row dropped
  *   - unmatched + op='I' → batch payload inserted
  *   - everything else    → target row kept verbatim
  *
  * Plan shape is the 100 TB one: a CDC batch is orders of magnitude
  * smaller than the target, so BOTH merge arms are broadcast hash joins
  * against the batch — the target streams through map-side, never
  * shuffles, never sorts. (A same-size merge would instead bucket both
  * sides on the key — `bucketed_colocated_join` shows that layout.)
  * The union of the three arms is exactly MERGE's row-level contract,
  * and the whole apply is one scan of the target per arm with the
  * batch broadcast once.
  */
object MergeOps extends OpGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic CDC batch derived from the target itself:
    // c_custkey%10==3 → U (segment overwritten, balance +100),
    // %10==7 → D, %10==1 → I under a shifted (guaranteed-new) key.
    "merge_upsert_cdc" -> ((s, d) => {
      val tgt = Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      val m = col("c_custkey") % 10
      val src = Tables.customer(s, d)
        .filter(m.isin(1, 3, 7))
        .select(
          when(m === 1, col("c_custkey") + 100000000L)
            .otherwise(col("c_custkey")).as("k"),
          when(m === 7, lit("D")).when(m === 3, lit("U"))
            .otherwise(lit("I")).as("op"),
          concat(lit("cdc_"), col("c_name")).as("new_name"),
          when(m === 3, lit("UPDATED"))
            .otherwise(col("c_mktsegment")).as("new_seg"),
          (col("c_acctbal") + 100).as("new_bal")) // +100 is fp-exact
      val kept = tgt.join(broadcast(src.select("k")),
        col("c_custkey") === col("k"), "left_anti")
      val updated = tgt.join(
          broadcast(src.filter(col("op") === "U").select("k", "new_seg", "new_bal")),
          col("c_custkey") === col("k"))
        .select(col("c_custkey"), col("c_name"), // target-owned column kept
          col("new_seg").as("c_mktsegment"), col("new_bal").as("c_acctbal"))
      val inserted = src.filter(col("op") === "I")
        .select(col("k").as("c_custkey"), col("new_name").as("c_name"),
          col("new_seg").as("c_mktsegment"), col("new_bal").as("c_acctbal"))
      kept.unionByName(updated).unionByName(inserted)
        .orderBy("c_custkey")
    }),

    // Snapshot diff audit (r12): classify every key of two table
    // versions as added / removed / changed / unchanged and account
    // the value movement — the reconciliation report run after every
    // incremental load (the READ side of merge_upsert_cdc: that op
    // applies a delta, this one verifies what a delta DID). Versions
    // are derived deterministically from the target itself:
    // %3==0 keys absent from the NEW snapshot (deleted), %5==0 keys
    // absent from the OLD (added), %7==0 surviving keys get +500
    // cents (changed). One full outer join on the key — the canonical
    // diff shape: key-partitioned, no windows, map-side classifiable;
    // the report is 4 domain-bounded rows.
    "snapshot_diff_audit" -> ((s, d) => {
      val base = Tables.orders(s, d).select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val old = base.filter(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey"), col("cents").as("old_cents"))
      val nw = base.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, col("cents") + 500)
            .otherwise(col("cents")).as("new_cents"))
      old.join(nw, Seq("o_orderkey"), "full_outer")
        .withColumn("diff_class",
          when(col("old_cents").isNull, "added")
            .when(col("new_cents").isNull, "removed")
            .when(col("old_cents") =!= col("new_cents"), "changed")
            .otherwise("unchanged"))
        .groupBy("diff_class")
        .agg(count(lit(1)).as("n_rows"),
          sum(coalesce(col("old_cents"), lit(0L))).as("cents_old"),
          sum(coalesce(col("new_cents"), lit(0L))).as("cents_new"))
        .withColumn("cents_delta", expr("cents_new - cents_old"))
        .orderBy("diff_class")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "merge_upsert_cdc" ->
      """WITH src AS (
        |  SELECT CASE WHEN c_custkey % 10 = 1 THEN c_custkey + 100000000
        |              ELSE c_custkey END AS k,
        |         CASE c_custkey % 10 WHEN 7 THEN 'D' WHEN 3 THEN 'U'
        |              ELSE 'I' END AS op,
        |         'cdc_' || c_name AS new_name,
        |         CASE WHEN c_custkey % 10 = 3 THEN 'UPDATED'
        |              ELSE c_mktsegment END AS new_seg,
        |         c_acctbal + 100 AS new_bal
        |  FROM customer WHERE c_custkey % 10 IN (1, 3, 7)),
        |kept AS (
        |  SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
        |  WHERE c_custkey NOT IN (SELECT k FROM src)),
        |updated AS (
        |  SELECT c.c_custkey, c.c_name, s.new_seg AS c_mktsegment,
        |         s.new_bal AS c_acctbal
        |  FROM customer c JOIN src s ON c.c_custkey = s.k WHERE s.op = 'U'),
        |inserted AS (
        |  SELECT k AS c_custkey, new_name AS c_name, new_seg AS c_mktsegment,
        |         new_bal AS c_acctbal
        |  FROM src WHERE op = 'I')
        |SELECT * FROM kept
        |UNION ALL SELECT * FROM updated
        |UNION ALL SELECT * FROM inserted
        |ORDER BY c_custkey""".stripMargin,

    "snapshot_diff_audit" ->
      """WITH base AS (
        |  SELECT o_orderkey,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |old AS (SELECT o_orderkey, cents AS old_cents FROM base
        |        WHERE o_orderkey % 5 <> 0),
        |nw AS (SELECT o_orderkey,
        |              CASE WHEN o_orderkey % 7 = 0 THEN cents + 500
        |                   ELSE cents END AS new_cents
        |       FROM base WHERE o_orderkey % 3 <> 0),
        |diff AS (
        |  SELECT coalesce(old.o_orderkey, nw.o_orderkey) AS k,
        |         old_cents, new_cents,
        |         CASE WHEN old_cents IS NULL THEN 'added'
        |              WHEN new_cents IS NULL THEN 'removed'
        |              WHEN old_cents <> new_cents THEN 'changed'
        |              ELSE 'unchanged' END AS diff_class
        |  FROM old FULL OUTER JOIN nw ON old.o_orderkey = nw.o_orderkey)
        |SELECT diff_class, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(coalesce(old_cents, 0)) AS BIGINT) AS cents_old,
        |       CAST(sum(coalesce(new_cents, 0)) AS BIGINT) AS cents_new,
        |       CAST(sum(coalesce(new_cents, 0)) - sum(coalesce(old_cents, 0))
        |         AS BIGINT) AS cents_delta
        |FROM diff GROUP BY diff_class ORDER BY diff_class""".stripMargin,
  )
}
