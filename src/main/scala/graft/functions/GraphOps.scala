package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the
  * equi-join form of large-star/small-star: each round every node takes
  * the least component id among itself and its neighbors, so one round
  * is one `edges ⋈ labels` join + per-node min, whatever the graph
  * size. Converges in O(diameter) rounds (component diameters in dedup
  * graphs are tiny — near-dup clusters are dense); the fixpoint is the
  * component MINIMUM, deterministic regardless of iteration count,
  * join order, or partitioning. Lineage is truncated per round
  * (`localCheckpoint`) so the iterated plan stays flat.
  */
object GraphOps {

  /** Component id (the least member id) per node. `nodes` is one LONG
    * `idCol` per vertex; `edges` holds undirected adjacency as
    * (`srcCol`, `dstCol`) pairs (one direction is enough — both are
    * added here). Output: (idCol, component).
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      maxIters: Int = 20): DataFrame = {
    val pairs = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val und = pairs.unionByName(
      pairs.select(col("__dst").as("__src"), col("__src").as("__dst")))
      .localCheckpoint()
    var snap = nodes.select(col(idCol), col(idCol).as("component"))
      .localCheckpoint()
    var labels = snap
    var changed = 1L
    var iters = 0
    while (changed > 0 && iters < maxIters) {
      val nbrMin = und
        .join(labels.select(col(idCol).as("__dst"),
          col("component").as("__nc")), "__dst")
        .groupBy(col("__src").as(idCol))
        .agg(min("__nc").as("__nbr_min"))
      // carry the PREVIOUS label through the round's checkpoint so the
      // convergence check is a filter-count over the materialized
      // blocks — the old shape re-joined next against labels (one
      // extra shuffle join + job per round; r18 optimization)
      val next = labels
        .join(nbrMin, Seq(idCol), "left")
        .select(col(idCol), col("component").as("__prev"),
          least(col("component"),
            coalesce(col("__nbr_min"), col("component"))).as("component"))
        .localCheckpoint()
      changed = next.filter(col("__prev") =!= col("component")).count()
      // the superseded round is dead once `next` is materialized and the
      // change count has run
      Checkpoints.release(snap)
      snap = next
      labels = next.select(col(idCol), col("component"))
      iters += 1
    }
    Checkpoints.release(und)
    labels
  }
}
