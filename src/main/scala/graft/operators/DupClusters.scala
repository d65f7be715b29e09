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
    * component. Includes only docs appearing in at least one pair. */
  def clusters(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    // membership: node -> current label (starts as itself)
    var labels = pairs.select(col("doc_a").as("doc"))
      .unionByName(pairs.select(col("doc_b").as("doc")))
      .distinct()
      .withColumn("cluster", col("doc"))
      .localCheckpoint()
    // contracted edge set between current labels
    var edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var iter = 0
    var done = edges.isEmpty
    while (!done && iter < maxIters) {
      // 1. each label adopts the min adjacent label (both directions)
      val adj = edges.unionByName(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      val newForLabel = adj.groupBy(col("src").as("cluster"))
        .agg(least(min(col("dst")), col("cluster")).as("new_cluster"))
        .where(col("cluster") =!= col("new_cluster"))
        .localCheckpoint()
      if (newForLabel.isEmpty) {
        done = true
      } else {
        // 2. relabel membership and contract edges to the new labels
        labels = labels
          .join(newForLabel, Seq("cluster"), "left")
          .select(col("doc"),
            coalesce(col("new_cluster"), col("cluster")).as("cluster"))
          .localCheckpoint()
        val relabel = (c: String) => coalesce(col(s"nc_$c"), col(c))
        edges = edges
          .join(newForLabel.select(col("cluster").as("src"),
            col("new_cluster").as("nc_src")), Seq("src"), "left")
          .join(newForLabel.select(col("cluster").as("dst"),
            col("new_cluster").as("nc_dst")), Seq("dst"), "left")
          .select(relabel("src").as("src"), relabel("dst").as("dst"))
          .where(col("src") =!= col("dst"))
          .distinct()
          .localCheckpoint()
        done = edges.isEmpty
      }
      iter += 1
    }
    labels
  }
}
