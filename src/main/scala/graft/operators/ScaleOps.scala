package graft.operators

import graft.{Det, OpGroup, Tables}
import graft.functions.{MinHashSignature, Salt}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-pattern operators: the explicit plan shapes a 1000-executor
  * cluster needs when automatic mechanisms aren't enough.
  */
object ScaleOps extends OpGroup {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Salted skew join: lineitem ⋈ supplier on l_suppkey with an 8-way
    // salt. The oracle runs the PLAIN join — asserting salting is a pure
    // physical rewrite with identical results.
    "skew_salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_suppkey").as("suppkey"), col("l_quantity"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      Salt.saltedJoin(li, sup, "suppkey", 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("s_nationkey")
    }),

    // Typed Aggregator (UDAF) surface: per-document MinHash signatures
    // through `udaf(Aggregator)` — partial buffers merge element-wise
    // (commutative monoid), so the shuffle carries 8 longs per doc.
    // FNV hashes are engine-specific ⇒ rows-only + MinHashAggSpec.
    "minhash_udaf_signature" -> ((s, d) => {
      val minhash8 = udaf(new MinHashSignature(8))
      Tables.documents(s, d)
        .withColumn("words", split(col("text"), " "))
        .withColumn("sh", expr(
          """transform(sequence(0, greatest(size(words) - 3, 0)),
            |  i -> concat_ws(' ', slice(words, i + 1, 3)))""".stripMargin))
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
        .groupBy("doc_id")
        .agg(minhash8(col("shingle")).as("sig"))
        .select(col("doc_id"),
          element_at(col("sig"), 1).as("m0"), element_at(col("sig"), 2).as("m1"),
          element_at(col("sig"), 3).as("m2"), element_at(col("sig"), 4).as("m3"))
        .orderBy("doc_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "skew_salted_join" ->
      s"""SELECT s_nationkey, count(*) AS n_items, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
  )
}
