package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: collapse near-dup edges (minhash bucket
  * stars, jaccard pairs, ...) into connected components, so each dup group
  * gets one canonical id.
  *
  * Algorithm: alternating min-label propagation WITH edge contraction
  * (hash-to-min style). Each round:
  *   1. every node adopts the min label in its neighborhood (incl. itself);
  *   2. edges are rewritten to connect LABELS instead of nodes and
  *      self-loops are dropped — so resolved structure disappears and the
  *      effective diameter roughly halves each round: O(log d) rounds,
  *      each a pair of equi-joins with map-side combine.
  * `localCheckpoint` truncates the growing lineage so round N's plan does
  * not replay rounds 1..N-1.
  */
object DupClusters {

  /** pairs(doc_a, doc_b) -> (doc, cluster) with cluster = min doc id of the
    * component. Includes only docs appearing in at least one pair.
    *
    * `durable = true` switches the per-round lineage truncation from
    * `localCheckpoint` (executor-local blocks — fast, but a lost executor
    * kills the job since the truncated lineage can't recompute) to reliable
    * `checkpoint()` into `spark.sparkContext.setCheckpointDir(...)` —
    * the production setting on a multi-node cluster. Local default stays
    * executor-local. */
  def clusters(pairs: DataFrame, maxIters: Int = 25,
               durable: Boolean = false): DataFrame = {
    def ck(df: DataFrame): DataFrame =
      if (durable) df.checkpoint() else df.localCheckpoint()
    // contracted edge set between current labels — the ONLY relation the
    // loop materializes; membership relabeling is deferred to one pass at
    // the end (each round's label moves are tiny checkpointed deltas)
    var edges = ck(pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct())
    var moves = List.empty[DataFrame] // per-round (cluster -> new_cluster)
    var iter = 0
    var done = edges.isEmpty
    while (!done && iter < maxIters) {
      // 1. each label adopts the min adjacent label (both directions)
      val adj = edges.unionByName(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      val newForLabel = ck(adj.groupBy(col("src").as("cluster"))
        .agg(least(min(col("dst")), col("cluster")).as("new_cluster"))
        .where(col("cluster") =!= col("new_cluster")))
      if (newForLabel.isEmpty) {
        done = true
      } else {
        moves ::= newForLabel
        // 2. contract edges to the new labels
        val relabel = (c: String) => coalesce(col(s"nc_$c"), col(c))
        edges = ck(edges
          .join(newForLabel.select(col("cluster").as("src"),
            col("new_cluster").as("nc_src")), Seq("src"), "left")
          .join(newForLabel.select(col("cluster").as("dst"),
            col("new_cluster").as("nc_dst")), Seq("dst"), "left")
          .select(relabel("src").as("src"), relabel("dst").as("dst"))
          .where(col("src") =!= col("dst"))
          .distinct())
        done = edges.isEmpty
      }
      iter += 1
    }
    // membership: every node starts as its own label, then the recorded
    // rounds of label moves apply in order — one lazy join chain over the
    // (checkpointed, small) deltas instead of a materialized relabel per
    // round
    val nodes = pairs.select(col("doc_a").as("doc"))
      .unionByName(pairs.select(col("doc_b").as("doc")))
      .distinct()
      .withColumn("cluster", col("doc"))
    moves.reverse.foldLeft(nodes) { (lab, m) =>
      lab.join(m, Seq("cluster"), "left")
        .select(col("doc"),
          coalesce(col("new_cluster"), col("cluster")).as("cluster"))
    }
  }
}
