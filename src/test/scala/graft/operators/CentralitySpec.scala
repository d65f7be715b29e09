package graft.operators

import graft.SparkSpec

class CentralitySpec extends SparkSpec {
  import spark.implicits._

  test("pagerankPpm: hand-computed integer rounds on a path graph") {
    // path 1-2-3: deg(1)=deg(3)=1, deg(2)=2
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Centrality.pagerankPpm(pairs, iters = 2)
      .as[(Long, Long, Long)].collect()
      .map { case (n, p, d) => n -> ((p, d)) }.toMap
    // round 1: pr(1)=pr(3)=150000+850000*500000/1e6=575000;
    //          pr(2)=150000+850000*2000000/1e6=1850000
    // round 2: ends (925000 in) -> 936250; center (1150000 in) -> 1127500
    assert(out === Map(
      1L -> ((936250L, 1L)),
      2L -> ((1127500L, 2L)),
      3L -> ((936250L, 1L))))
  }

  test("driver-local path == distributed rounds, bit-exact (random graph)") {
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 200).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .toDF("doc_a", "doc_b")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val local = rows(Centrality.pagerankPpm(pairs, iters = 3))
    val dist = rows(Centrality.pagerankPpm(pairs, iters = 3,
      driverEdgeLimit = 0L)) // force the distributed rounds
    assert(local === dist)
  }

  test("the hub of a star graph outranks its leaves") {
    val pairs = (2L to 9L).map(i => (1L, i)).toDF("doc_a", "doc_b")
    val out = Centrality.pagerankPpm(pairs, iters = 3)
      .as[(Long, Long, Long)].collect()
      .map { case (n, p, _) => n -> p }.toMap
    assert((2L to 9L).forall(l => out(1L) > out(l)))
    assert((2L to 9L).map(out).toSet.size === 1) // leaves symmetric
  }
}
