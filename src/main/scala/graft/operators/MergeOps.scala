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
  )
}
