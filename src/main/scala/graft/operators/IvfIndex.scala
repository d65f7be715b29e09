package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: partition vectors by nearest centroid,
  * probe only the closest cells at query time — the other scale path for
  * similarity search next to random-hyperplane LSH (Similarity.annLsh).
  *
  * Spark-first shape: centroids are a tiny broadcast table; assignment is
  * one crossJoin(broadcast) + `min_by` aggregation (map-side combinable,
  * one shuffle on vec id — NOT a window); Lloyd updates are decimal-exact
  * per-(cluster, dim) means, so training is deterministic. At 100 TB the
  * assignment column becomes the table's partition key so a query touches
  * nProbes/k of the data.
  *
  * Training is deterministic k-means (init = first k vectors by id, L
  * Lloyd rounds) — no RNG, reproducible across runs and engines.
  */
object IvfIndex {

  private def vecD(c: Column): Column = transform(c, x => x.cast("double"))

  /** ||a-b||² = aa - 2ab + bb via the native dot product. */
  private def dist2(a: Column, aa: Column, b: Column, bb: Column): Column =
    aa - lit(2.0) * Similarity.dot(a, b) + bb

  /** Train k centroids with `iters` Lloyd rounds.
    * Returns (centroid_id, centroid: array<double>).
    *
    * `durable = true` uses reliable `checkpoint()` (needs
    * `setCheckpointDir`) instead of executor-local `localCheckpoint` for
    * the per-round lineage truncation — survives executor loss on a real
    * cluster; see DupClusters.clusters. */
  def train(df: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int, durable: Boolean = false): DataFrame = {
    def ck(d: DataFrame): DataFrame =
      if (durable) d.checkpoint() else d.localCheckpoint()
    val vecs = df.select(col(idCol).as("vid"), vecD(col(vecCol)).as("v"))
      .withColumn("vv", Similarity.dot(col("v"), col("v")))
      .persist()
    // checkpoint each round: truncates the nested Lloyd plan so later
    // consumers (collect, assignment, rerank) don't replay training
    // centroid ids are DENSE 0..k-1 by vid order, not vid.cast(int):
    // 64-bit (e.g. hash-derived) vids would wrap modulo 2^32 and two
    // colliding initial vectors would silently merge clusters. The k
    // init rows are numbered DRIVER-side (take(k) of a TakeOrdered is
    // bounded by contract) — an unpartitioned row_number window here
    // would be equivalent but spams `WindowExec: No Partition Defined`
    // into every ANN bench run.
    val spark = df.sparkSession
    import spark.implicits._
    val init = vecs.orderBy("vid").limit(k).select(col("v")).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) }.toSeq
    var centroids = ck(init.toDF("centroid_id", "c"))
    for (_ <- 0 until iters) {
      val assigned = assignTo(vecs, centroids)
      // string-route the double->decimal cast (shortest-string repr is
      // engine-identical; direct double->decimal rounding is not), sum
      // exactly in decimal, then ONE double division — every step
      // reproducible in ANSI SQL, which is what lets the full 2-round
      // Lloyd training carry a DuckDB oracle
      centroids = ck(assigned
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("centroid_id", "dim")
        .agg((sum(col("x").cast("string").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("centroid_id"),
          transform(col("dm"), s => s.getField("m")).as("c")))
    }
    vecs.unpersist()
    centroids
  }

  /** Nearest-centroid assignment: broadcast centroids, min_by aggregation. */
  private def assignTo(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = broadcast(centroids
      .withColumn("cc", Similarity.dot(col("c"), col("c"))))
    vecs.crossJoin(cents)
      .groupBy(col("vid"))
      .agg(
        min_by(col("centroid_id"),
          struct(dist2(col("v"), col("vv"), col("c"), col("cc")),
            col("centroid_id"))).as("centroid_id"),
        first(col("v")).as("v"))
  }

  /** Assign every row of `df` to its trained cell (the persisted layout's
    * partition key at scale). */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame): DataFrame =
    assignTo(
      df.select(col(idCol).as("vid"), vecD(col(vecCol)).as("v"))
        .withColumn("vv", Similarity.dot(col("v"), col("v"))),
      centroids)

  /** The `nProbes` cell ids nearest the query — a driver-side argmin over
    * the k-row centroid table (same legitimacy as the centroid collect in
    * training). Sequential left-fold dot products (== DuckDB
    * list_inner_product), so the probe ranking is oracle-reproducible:
    * d2 = cc - 2*cq + qq. */
  private def probeCells(centroids: DataFrame, q: Array[Double],
                         nProbes: Int): Seq[Int] = {
    val qq = Similarity.dotSeq(q, q)
    centroids.select(col("centroid_id"), col("c")).collect().map { r =>
      val c = r.getSeq[Double](1)
      val d2 = Similarity.dotSeq(c, c) - 2.0 * Similarity.dotSeq(c, q) + qq
      (r.getInt(0), d2)
    }.sortBy { case (id, d) => (d, id) }.take(nProbes).map(_._1).toSeq
  }

  /** Exact cosine rerank of the probed cells (columns vid, v) -> top-k.
    * One row per vid even when the index holds duplicates: a streamed
    * index can legitimately carry the same vid twice (an annIngestBatch
    * replay after a store compaction, or a crash between a compaction's
    * publish and its deletes), and a duplicated vid must not crowd
    * distinct neighbors out of the top-k — take each vid's best cosine
    * (the per-vid max; for byte-identical replay rows it is THE value).
    * The agg shuffles only the probed cells' rows, never the index. */
  private def rerank(cells: DataFrame, idCol: String, q: Array[Double],
                     topK: Int, excludeId: Option[Long]): DataFrame = {
    val qCol = array(q.map(lit): _*)
    val base = excludeId.map(e => cells.where(col("vid") =!= e)).getOrElse(cells)
    base.select(col("vid").as(idCol),
        // NULL (not NaN) on zero norms: NaN tops every descending sort
        // in both engines — see Similarity.cosine
        (Similarity.dot(col("v"), qCol) /
          nullif(Similarity.norm(col("v")) * Similarity.norm(qCol),
            lit(0.0))).as("cos_sim"))
      .groupBy(col(idCol)).agg(max(col("cos_sim")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(topK)
  }

  /** ANN search over the RAW vector table: probe the `nProbes` cells
    * nearest the query, exact cosine rerank inside them. Re-derives the
    * cell assignment of every row (one linear pass) — correct anywhere,
    * but at scale use [[buildIndex]] + [[searchIndexed]], which skip the
    * unprobed cells' data entirely via partition pruning. */
  def search(df: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame, queryVec: Array[Float],
             topK: Int, nProbes: Int, excludeId: Option[Long]): DataFrame = {
    val q = queryVec.map(_.toDouble)
    val probes = probeCells(centroids, q, nProbes)
    val cells = assign(df, idCol, vecCol, centroids)
      .where(col("centroid_id").isin(probes.map(p => p: Any): _*))
    rerank(cells, idCol, q, topK, excludeId)
  }

  /** Materialize the index: assign every vector to its cell and persist
    * the assignment PARTITIONED BY the cell id. This is the 100 TB
    * layout — each cell is its own parquet directory, so a probe-N query
    * lists and reads exactly N directories (partition pruning), touching
    * ~nProbes/k of the data instead of rescanning and re-assigning the
    * full table per query. */
  def buildIndex(df: DataFrame, idCol: String, vecCol: String,
                 centroids: DataFrame, path: String): Unit =
    graft.sinks.ParquetSink.writePartitioned(
      assign(df, idCol, vecCol, centroids)
        .select(col("vid"), col("v"), col("centroid_id")),
      path, Seq("centroid_id"))

  /** ANN search over a [[buildIndex]]-materialized layout (read with
    * `spark.read.parquet(path)`): the `centroid_id.isin(probes)` filter
    * is a PARTITION filter — Spark never opens the unprobed cells'
    * files. Same results as [[search]] with the same centroids. */
  def searchIndexed(indexed: DataFrame, idCol: String,
                    centroids: DataFrame, queryVec: Array[Float],
                    topK: Int, nProbes: Int, excludeId: Option[Long]): DataFrame = {
    val q = queryVec.map(_.toDouble)
    val probes = probeCells(centroids, q, nProbes)
    rerank(indexed.where(col("centroid_id").isin(probes.map(p => p: Any): _*)),
      idCol, q, topK, excludeId)
  }
}
