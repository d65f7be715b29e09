package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val all: Map[Long, Array[Float]] =
    emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.toArray }.toMap

  private def cosScala(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb)
  }

  test("cosineTopK matches driver-side brute force ranking") {
    val q = all(0L)
    val expected = all.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosScala(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    val got = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10, Some(0L))
      .select("vec_id").as[Long].collect().toSeq
    assert(got === expected)
  }

  test("annLsh returns bucket-restricted subset that overlaps exact top-k") {
    val q = all(0L)
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10, Some(0L))
      .select("vec_id").as[Long].collect().toSet
    val ann = Similarity.annLsh(emb, "vec_id", "embedding", q, 10, 4, Some(0L))
      .select("vec_id").as[Long].collect().toSet
    assert(ann.nonEmpty && ann.size <= 10)
    // 4 planes ~ 1/16 of space kept; single-probe recall on one fixed
    // query is seed-luck (the splitmix planes recover 1 here where the
    // old degenerate-LCG planes happened to give 2) — the pinned
    // properties are non-empty overlap and the multi-probe >= single
    // relation below, not a recall constant
    assert((ann intersect exact).nonEmpty)
  }

  test("multi-probe LSH recall >= single-probe recall") {
    val q = all(0L)
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10, Some(0L))
      .select("vec_id").as[Long].collect().toSet
    val single = Similarity.annLsh(emb, "vec_id", "embedding", q, 10, 4, Some(0L))
      .select("vec_id").as[Long].collect().toSet
    val multi = Similarity.annLshMultiProbe(emb, "vec_id", "embedding", q, 10, 4, Some(0L))
      .select("vec_id").as[Long].collect().toSet
    assert((multi intersect exact).size >= (single intersect exact).size)
    assert(multi.size === 10)
  }

  test("crossCosinePairs: subset of brute force; identical vectors always found") {
    import org.apache.spark.sql.functions._
    val corpus = emb.where(col("vec_id") % 10 =!= 0)
    val bench = emb.where(col("vec_id") % 10 === 0)
    val tau = 0.3
    val found = Similarity.crossCosinePairs(corpus, bench, "vec_id", "embedding",
        nPlanes = 4, dim = 64, tau = tau)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // brute force over the same split
    val all = emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().map { case (i, v) => i -> v.toArray }.toMap
    // iterate over Seq, NOT the Map — a for over a Map yields a Map and
    // silently collapses pairs sharing the first key
    val brute = (for {
      (a, va) <- all.toSeq if a % 10 != 0
      (b, vb) <- all.toSeq if b % 10 == 0
      if cosScala(va, vb) >= tau
    } yield (a, b)).toSet
    assert(found.subsetOf(brute))
    // a vector present in both slices buckets identically -> always found
    val planted = Seq((9001L, all(all.keys.filter(_ % 10 == 0).min)))
      .toDF("vec_id", "embedding")
    val foundPlanted = Similarity.crossCosinePairs(
        corpus.select("vec_id", "embedding").unionByName(planted),
        bench, "vec_id", "embedding", 4, 64, 0.999)
      .where(col("doc_a") === 9001L)
    assert(foundPlanted.count() >= 1)
    // multi-probe finds at least the single-probe pairs
    val single = Similarity.crossCosinePairs(corpus, bench, "vec_id", "embedding",
        4, 64, tau, multiProbe = false)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(found))
  }

  test("cellCosinePairs: k=1 equals brute force; k>1 is the cell-blocked subset") {
    val tau = 0.25
    val brute = (for {
      (a, va) <- all.toSeq; (b, vb) <- all.toSeq if a < b
      c = cosScala(va, vb) if c >= tau
    } yield (a, b)).toSet
    // one cell -> no blocking loss: the equi-join IS all-pairs
    val c1 = IvfIndex.train(emb, "vec_id", "embedding", k = 1, iters = 1)
    val got1 = Similarity.cellCosinePairs(emb, "vec_id", "embedding", c1, tau)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(got1 === brute, "single-cell pairs must equal brute force")
    // real blocking: every reported pair is a true pair (no false
    // positives — cosine is exact within cells), recall <= 1 by design
    val c8 = IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val got8 = Similarity.cellCosinePairs(emb, "vec_id", "embedding", c8, tau)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(got8.subsetOf(brute), "cell blocking must not invent pairs")
    assert(got8.nonEmpty, "the trained cells must keep some near pairs together")
  }

  test("labelCentroids matches manual mean per (label, dim)") {
    val out = Similarity.labelCentroids(emb, "label", "embedding")
      .where(col("label") === 0 && col("dim") === 0)
      .select("centroid_v").as[Double].head()
    val vs = emb.where(col("label") === 0)
      .select("embedding").as[Seq[Float]].collect().map(_.head)
    val manual = vs.map(v => BigDecimal(v.toString).setScale(9, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble / vs.length
    assert(math.abs(out - manual) < 1e-9)
  }
}
