package graft.operators

import graft.SparkSpec

class DupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("connected components via min-label propagation") {
    // components: {1,2,3,4} (chain), {10,11}, singleton edges only
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val out = DupClusters.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long chain converges within diameter rounds") {
    val chain = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("doc_a", "doc_b")
    val out = DupClusters.clusters(chain).as[(Long, Long)].collect().toMap
    assert(out.values.toSet === Set(0L))
    assert(out.size === 12)
  }

  /** Reference union-find for the equivalence check. */
  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("matches brute-force union-find on an adversarial mixed graph") {
    // chains, a clique, cross-links, self-loop, reversed edges
    val edges = ((0L until 30L by 3).sliding(2).map(s => (s(1), s(0))) ++  // reversed chain
      Seq((100L, 101L), (101L, 102L), (102L, 100L),                        // triangle
        (27L, 100L),                                                       // bridges chain->triangle
        (200L, 200L),                                                      // self-loop
        (301L, 300L), (303L, 302L), (302L, 301L))).toSeq                   // zigzag chain
    val out = DupClusters.clusters(edges.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    // self-loops union nothing but still register the node (as clusters does)
    val brute = bruteComponents(edges)
    assert(out === brute)
  }

  test("durable=true reliable checkpointing gives identical clusters") {
    val dir = java.nio.file.Files.createTempDirectory("ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val durable = DupClusters.clusters(pairs, durable = true)
      .as[(Long, Long)].collect().toMap
    assert(durable === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // reliable checkpoint files actually landed in the checkpoint dir
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir)).count() > 0)
  }
}
