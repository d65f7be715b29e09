package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  test("searchAdc scans only probed cells, sorted, deterministic") {
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = df.where(col("vec_id") === 0).select("embedding").head()
      .getSeq[Float](0).toArray
    def run() = IvfPq.searchAdc(df, "vec_id", "embedding",
      nCells = 8, m = 4, k = 16, q, topK = 10, nProbes = 3,
      excludeId = Some(0L)).collect()
    val out = run()
    assert(out.length === 10)
    assert(!out.exists(_.getLong(0) == 0L))
    // candidates come only from the probed cells
    assert(out.map(_.getInt(1)).distinct.length <= 3)
    // ranked ascending by the approximate distance
    val d = out.map(_.getDouble(2)).toSeq
    assert(d === d.sorted)
    // exact doubles reproduce on re-run (no RNG anywhere)
    assert(out.map(r => (r.getLong(0), r.getDouble(2))).toSeq ===
      run().map(r => (r.getLong(0), r.getDouble(2))).toSeq)
  }

  test("a query sitting ON a coarse centroid ranks its own cell's residual-zero point first") {
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // query = vector 3 (one of the 8 coarse centroids): its residual in
    // its own cell is the zero vector, so its ADC distance to ITSELF
    // would be the per-cell table's self-distance — excluded; the top hit
    // must still come from a probed cell at a finite sorted distance
    val q = df.where(col("vec_id") === 3).select("embedding").head()
      .getSeq[Float](0).toArray
    val out = IvfPq.searchAdc(df, "vec_id", "embedding",
      nCells = 8, m = 4, k = 16, q, topK = 5, nProbes = 2,
      excludeId = Some(3L)).collect()
    assert(out.length === 5 && !out.exists(_.getLong(0) == 3L))
  }

  test("buildIndex + searchEncoded equals the direct searchAdc, cell-partitioned codes on disk") {
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = df.where(col("vec_id") === 0).select("embedding").head()
      .getSeq[Float](0).toArray
    val model = IvfPq.buildModel(df, "vec_id", "embedding",
      nCells = 8, m = 4, k = 16, dim = q.length)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-index-spec").toString
    IvfPq.buildIndex(df, "vec_id", "embedding", model, s"$dir/codes")
    // the persisted layout is cell directories of (vid + m int codes) —
    // no vectors anywhere on disk
    val cellDirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("centroid_id=")).map(_.getName).sorted
    assert(cellDirs.length === 8, s"expected 8 cell dirs, got ${cellDirs.toSeq}")
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.schema.fieldNames.sorted.toSeq ===
      Seq("centroid_id", "code_0", "code_1", "code_2", "code_3", "vid"))
    assert(codes.schema.forall(f => !f.dataType.typeName.contains("array")))
    val indexed = IvfPq.searchEncoded(codes, "vec_id", model, q,
      topK = 10, nProbes = 4, excludeId = Some(0L))
      .as[(Long, Int, Double)].collect().toSeq
    val direct = IvfPq.searchAdc(df, "vec_id", "embedding",
      nCells = 8, m = 4, k = 16, q, topK = 10, nProbes = 4,
      excludeId = Some(0L)).as[(Long, Int, Double)].collect().toSeq
    assert(indexed === direct)
  }
}
