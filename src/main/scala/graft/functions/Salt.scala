package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join (SURVEY.md §4 / the 100 TB
  * discipline). A hot join key sends all its rows to one reducer; salting
  * splits the hot key across `n` sub-keys — the big side gets a
  * deterministic content-derived salt in [0, n), the small side is
  * replicated across all n salts, and the join runs on (key, salt).
  * Result is row-identical to the plain join for any salt assignment,
  * which is what the oracle asserts; AQE's skew-join split is the
  * runtime-automatic alternative, this is the explicit plan-shape form.
  */
object Salt {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(n.toLong)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
