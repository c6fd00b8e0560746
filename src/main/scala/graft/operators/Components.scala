package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair list — the resolution stage of the
  * dedup pipeline. The pair emitters (Dedup.minhashPairs/simhashPairs,
  * Similarity.nearDupPairs) find duplicate EDGES; an actual dedup run
  * needs the transitive clusters those edges imply, one canonical
  * representative per cluster, and the keep/drop verdict per document.
  * The reference has no counterpart (its pandas engine dedups nothing);
  * this is the operator a 100 TB training-data pipeline cannot skip.
  */
object Components {

  /** Hash-min label propagation: every node starts labeled with its own
    * id; each round a node adopts the minimum label among itself and its
    * neighbors; at fixpoint every node carries the minimum id reachable
    * in its component. Converges in O(component diameter) rounds —
    * duplicate clusters are near-cliques (or stars, under
    * Dedup.cappedPairs), so 3–5 rounds in practice.
    *
    * The driver loop is orchestration only (the Pregel pattern): each
    * round's work is one distributed join + aggregate on (id, label)
    * pairs — never the document payload. localCheckpoint truncates
    * lineage so the plan stays constant-size across rounds; the
    * symmetrized edge list is persisted once and reused every round
    * instead of re-deriving the (possibly expensive) pair plan.
    *
    * Throws after `maxIter` rounds without convergence — a truncated
    * propagation would silently mislabel components, and for dup
    * clusters hitting 50 rounds means the input is not a dup graph.
    */
  def connectedComponents(edges: DataFrame, src: String = "a",
                          dst: String = "b", maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
      .union(edges.select(col(dst).cast("long").as("a"), col(src).cast("long").as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Seed labels with min(id, min neighbor) — the node-id distinct is a
    // shuffle aggregate anyway, so folding propagation round 1 into it
    // is free and shaves a full join+materialize round off the loop.
    var labels = sym.groupBy(col("a").as("id"))
      .agg(least(col("a"), min(col("b"))).as("label"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "b"), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("label")).as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (coalesce(col("nmin"), col("label")) < col("label")).as("changed"))
        .localCheckpoint()
      converged = next.filter(col("changed")).isEmpty
      labels = next.select(col("id"), col("label"))
      i += 1
    }
    sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Duplicate-cluster table from a pair list: (id, cluster_id,
    * cluster_size, is_canonical). cluster_id = min id in the component
    * (deterministic); the canonical member is the cluster id itself —
    * the keep-one-drop-rest verdict a dedup pass applies. Only clustered
    * ids appear; everything else in the corpus is implicitly kept.
    */
  def dedupClusters(pairs: DataFrame, src: String, dst: String): DataFrame =
    connectedComponents(pairs, src, dst)
      .select(col("id"), col("label").as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .withColumn("is_canonical",
        (col("id") === col("cluster_id")).cast("int"))
}
