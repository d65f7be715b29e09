package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over similarity graphs — the "duplicate hub" /
  * template-page detector: a node that near-duplicates many others pulls
  * rank, which is how boilerplate families and SEO farms surface in a
  * corpus graph (the companion signal to [[DupClusters]]' components:
  * components say WHICH docs belong together, rank says which node is
  * the hub).
  *
  * PageRank here is INTEGER-EXACT in ppm (damping 0.15):
  * `pr0 = 1e6; pr_{t+1}(v) = 150000 + (850000 * Σ_{u→v} pr_t(u) DIV
  * deg(u)) DIV 1e6` — every step BIGINT-exact DIV arithmetic, so a
  * fixed-iteration run carries a cell-exact unrolled-CTE oracle (the
  * same discipline as the IVF Lloyd rounds; no float mass vectors whose
  * last-bit rounding differs per engine). Undirected: each pair
  * contributes both directions, so every node has degree ≥ 1 and
  * receives ≥ 1 contribution — no dangling-mass term needed.
  *
  * Scale shape per iteration: one equi-join of the edge list with the
  * rank table on the source id, one groupBy(dst) shuffle (map-side
  * combinable), `localCheckpoint` truncating the iteration lineage —
  * the label-propagation loop's cost model (SURVEY §6).
  */
object Centrality {

  /** `iters` exact-integer PageRank rounds over undirected pairs
    * (doc_a, doc_b). Returns (node, pr_ppm, degree).
    *
    * Size-adaptive (r21, the [[DupClusters.clustersAdaptive]] plan
    * choice): a pair graph that fits the driver runs the identical
    * integer rounds locally — one collect instead of per-round
    * join+groupBy+localCheckpoint job chains (measured 21 AQE jobs for
    * iters=2 at sf0.1, ~0.1 s scheduling constant each, on microseconds
    * of arithmetic). Every step is BIGINT DIV arithmetic over
    * non-negative values, and the per-dst contribution sum is integer
    * addition — order-free — so the driver and distributed paths are
    * bit-identical (CentralitySpec pins them equal). Above
    * `driverEdgeLimit` pairs (or for non-long ids) the distributed
    * rounds run unchanged at any scale. */
  def pagerankPpm(pairs: DataFrame, iters: Int,
                  driverEdgeLimit: Long = 4000000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val longIds = Seq("doc_a", "doc_b").forall(c =>
      pairs.schema(c).dataType == org.apache.spark.sql.types.LongType)
    if (longIds) {
      // probe-first collect (the capByFreq discipline): materialize at
      // most limit+1 pair rows before deciding; a graph past the limit
      // pays one bounded extra scan, never a driver OOM
      val probe = (math.min(driverEdgeLimit, Int.MaxValue.toLong - 1) + 1).toInt
      val local = pairs.select(col("doc_a"), col("doc_b"))
        .limit(probe).as[(Long, Long)].collect()
      if (local.length <= driverEdgeLimit) {
        // undirected distinct edge set, exactly like the plan below
        val edges = local.iterator
          .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
          .toSet
        val deg = edges.groupBy(_._1).map { case (s, es) =>
          s -> es.size.toLong }
        var pr: Map[Long, Long] = deg.map { case (n, _) => n -> 1000000L }
        for (_ <- 0 until iters) {
          val s = scala.collection.mutable.Map.empty[Long, Long]
          edges.foreach { case (src, dst) =>
            s(dst) = s.getOrElse(dst, 0L) + pr(src) / deg(src)
          }
          pr = s.iterator.map { case (n, sum) =>
            // split multiply — same overflow-safe identity as the plan
            n -> (150000L + (sum / 1000000L) * 850000L +
              ((sum % 1000000L) * 850000L) / 1000000L)
          }.toMap
        }
        return pr.iterator.map { case (n, p) => (n, p, deg(n)) }
          .toSeq.toDF("node", "pr_ppm", "degree")
      }
      // fall through: graph too big for the driver — distributed rounds
    }
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint() // edges are re-joined every round
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    var pr = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
    for (_ <- 0 until iters) {
      val contrib = edges
        .join(deg, "src")
        .join(pr, col("src") === col("node"))
        .select(col("dst"), expr("pr DIV deg").as("__c"))
        .groupBy("dst").agg(sum(col("__c")).as("__s"))
      pr = contrib
        .select(col("dst").as("node"),
          // split multiply: identical values to (850000 * __s) DIV 1e6
          // (exactly, by the div/mod identity) but never overflows — a
          // ~2e7-in-neighbor hub's summed ppm mass would push the direct
          // product past Long.MaxValue and ANSI mode aborts the job
          (lit(150000L) + expr(
            "(__s DIV 1000000) * 850000 + ((__s % 1000000) * 850000) DIV 1000000"))
            .as("pr"))
        .localCheckpoint()
    }
    pr.join(deg.select(col("src").as("node"), col("deg").as("degree")), "node")
      .select(col("node"), col("pr").as("pr_ppm"), col("degree"))
  }
}
