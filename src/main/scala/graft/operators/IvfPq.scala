package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-PQ — the composite ANN index (coarse inverted-file cells +
  * product-quantized RESIDUALS, the FAISS `IVFx,PQy` layout): each vector
  * is assigned to its nearest coarse cell, the residual `v − c_cell` is
  * PQ-encoded, and a query scans only its probed cells using a PER-CELL
  * ADC table built from the QUERY's residual in that cell. At 100 TB the
  * encoded table is (cell id + m code bytes) per vector, partitioned by
  * cell — a query touches nProbes/nCells of the data and never the raw
  * vectors.
  *
  * Deterministic end to end: coarse cells = the first `nCells` vectors
  * by id (the same init [[IvfIndex.train]] starts from; trained cells
  * splice in identically), PQ books = the first `k` residuals by id,
  * every distance the `vv − 2·dot + cc` left-fold identity — the whole
  * composite carries a cell-exact DuckDB oracle.
  */
object IvfPq {

  private def dotSeq(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** ADC top-k over the probed cells. Returns (idCol, cell, adc_d2). */
  def searchAdc(df: DataFrame, idCol: String, vecCol: String,
                nCells: Int, m: Int, k: Int, queryVec: Array[Float],
                topK: Int, nProbes: Int, excludeId: Option[Long]): DataFrame = {
    val q = queryVec.map(_.toDouble)
    val dim = q.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m

    // coarse cells: iters=0 k-means init == first nCells vectors by id
    val cents = IvfIndex.train(df, idCol, vecCol, nCells, iters = 0)
    val centArr: Map[Int, Array[Double]] = cents.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap

    // residual relation: v - c(assigned cell), cell id carried along
    val assigned = IvfIndex.assign(df, idCol, vecCol, cents)
    val res = assigned.join(broadcast(cents), "centroid_id")
      .select(col("vid"), col("centroid_id"),
        zip_with(col("v"), col("c"), (a, b) => a - b).as("r"))

    // PQ books from the first k residuals by id (bounded driver collect)
    val bookRows = res.orderBy("vid").limit(k).collect()
    require(bookRows.length == k, s"need $k residuals, got ${bookRows.length}")
    val books = Array.tabulate(m, k) { (s, cid) =>
      bookRows(cid).getSeq[Double](2).slice(s * sub, (s + 1) * sub).toArray
    }
    val enc = PqIndex.encode(res, "vid", "r", books,
      keepCols = Seq("centroid_id"))

    // probes: nearest cells to the query (same fold order as IvfIndex)
    val qq = dotSeq(q.toSeq, q.toSeq)
    val probes = centArr.toSeq.map { case (cid, c) =>
      (cid, dotSeq(c.toSeq, c.toSeq) - 2.0 * dotSeq(c.toSeq, q.toSeq) + qq)
    }.sortBy { case (cid, d) => (d, cid) }.take(nProbes).map(_._1)

    // per-cell ADC tables from the QUERY's residual in that cell
    val adc: Map[Int, Array[Array[Double]]] = probes.map { cell =>
      val rq = q.zip(centArr(cell)).map { case (a, b) => a - b }
      cell -> Array.tabulate(m) { s =>
        val qs = rq.slice(s * sub, (s + 1) * sub).toSeq
        val sqq = dotSeq(qs, qs)
        books(s).map(c => sqq - 2.0 * dotSeq(qs, c.toSeq) + dotSeq(c.toSeq, c.toSeq))
      }
    }.toMap

    def cellApprox(cell: Int): Column =
      (0 until m).map(s =>
          element_at(array(adc(cell)(s).map(lit): _*), col(s"code_$s") + 1))
        .reduceLeft(_ + _)
    val approx = probes.tail.foldLeft(
        when(col("centroid_id") === probes.head, cellApprox(probes.head))) {
      case (acc, cell) => acc.when(col("centroid_id") === cell, cellApprox(cell))
    }
    val base = enc.where(col("centroid_id").isin(probes.map(p => p: Any): _*))
    excludeId.map(e => base.where(col("vid") =!= e)).getOrElse(base)
      .select(col("vid").as(idCol), col("centroid_id").as("cell"),
        approx.as("adc_d2"))
      .orderBy(col("adc_d2"), col(idCol))
      .limit(topK)
  }
}
