package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.LogicalRDD
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

  /** Hash-min label propagation with pointer jumping: every node starts
    * labeled with its own id; each round a node adopts the minimum of
    * its label, its neighbors' labels, AND its new label's own label
    * from the previous round (the pointer-jump — labels are node ids,
    * so the previous round's mapping resolves them one hop further).
    * At fixpoint every node carries the minimum id reachable in its
    * component. Plain hash-min is O(component diameter) rounds — fine
    * for near-clique dup clusters (3–5), pathological for the sparse
    * chains a low-recall pair emitter produces (a 19-round graph was
    * measured from the banded-LSH emitter); the jump compounds reach
    * roughly geometrically, pulling that to O(log diameter).
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
  /** The checkpointed RDD behind a localCheckpoint'd frame (the
    * LogicalRDD at the root of its plan), for explicit block release —
    * `DataFrame.unpersist` only touches cache-manager entries, not the
    * blocks a localCheckpoint persisted.
    */
  private def checkpointRdd(df: DataFrame): Option[RDD[InternalRow]] =
    df.queryExecution.logical.collectFirst { case lr: LogicalRDD => lr.rdd }

  def connectedComponents(edges: DataFrame, src: String = "a",
                          dst: String = "b", maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
      .union(edges.select(col(dst).cast("long").as("a"), col(src).cast("long").as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
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
        val stepped = labels.join(neighborMin, Seq("id"), "left")
          .select(col("id"), col("label").as("prev"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        // Pointer jump against the PREVIOUS round's (checkpointed)
        // mapping: my label is a node id — that node's own label is at
        // least as small and in the same component, so folding it in is
        // monotone-safe and costs one join on already-materialized
        // blocks, not a second derivation of this round's frame.
        val jumped = stepped.join(
          labels.select(col("id").as("label"), col("label").as("label2")),
          Seq("label"), "left")
        // Lazy checkpoint + changed-count aggregate = ONE job per round:
        // the count action materializes the checkpoint blocks and returns
        // the convergence signal in the same pass (vs eager checkpoint +
        // a separate isEmpty subtree = two jobs).
        val next = jumped
          .select(col("id"),
            least(col("label"), coalesce(col("label2"), col("label"))).as("label"),
            (least(col("label"), coalesce(col("label2"), col("label"))) < col("prev"))
              .as("changed"))
          .localCheckpoint(false)
        converged = next.agg(count(when(col("changed"), 1)).as("c"))
          .first().getLong(0) == 0L
        // `next` is materialized; the previous round's checkpoint blocks
        // are unreachable from here on — release them instead of letting
        // them pile up for the GC (a storage-memory leak over many rounds).
        checkpointRdd(labels).foreach(_.unpersist(blocking = false))
        labels = next.select(col("id"), col("label"))
        i += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds")
      labels
    } finally sym.unpersist()
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
