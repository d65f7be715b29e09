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
}
