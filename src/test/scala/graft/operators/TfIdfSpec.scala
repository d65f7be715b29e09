package graft.operators

import graft.SparkSpec
import graft.functions.Text

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("topTerms ranks rare terms above common ones, hand-checked") {
    // "the" appears in all 4 docs (df=4), "spark" in 1 (df=1),
    // "data" in 2 (df=2)
    val docs = Seq(
      (1L, "the spark engine the"),
      (2L, "the data pipeline"),
      (3L, "the data lake"),
      (4L, "the boring doc")).toDF("doc_id", "text")
    val out = TfIdf.topTerms(docs, "doc_id", "text", Text.tokens, 2)
      .orderBy("doc_id", "rank_in_group")
      .select("doc_id", "term", "tf", "df", "score", "rank_in_group")
      .as[(Long, String, Long, Long, Long, Int)].collect().toSeq
    // doc 1: spark tf=1 df=1 -> score 4_000_000; engine same; "the" tf=2
    // df=4 -> 2_000_000; top-2 = engine, spark (score tie -> term asc)
    assert(out.filter(_._1 == 1L).map(r => (r._2, r._5)) ===
      Seq(("engine", 4000000L), ("spark", 4000000L)))
    // doc 2: data df=2 -> 2_000_000, pipeline df=1 -> 4_000_000
    assert(out.filter(_._1 == 2L).map(r => (r._2, r._5)) ===
      Seq(("pipeline", 4000000L), ("data", 2000000L)))
    // every doc got exactly k=2 rows, ranks 1..2
    assert(out.groupBy(_._1).forall(_._2.map(_._6).sorted == Seq(1, 2)))
  }

  test("incremental store equals full recompute; batch replay is a no-op") {
    import org.apache.spark.sql.functions._
    val store = java.nio.file.Files.createTempDirectory("tfidf-store").toString
    val b1 = Seq((1L, "the spark engine the"), (2L, "the data pipeline"))
      .toDF("doc_id", "text")
    val b2 = Seq((3L, "the data lake"), (4L, "the boring doc"))
      .toDF("doc_id", "text")
    val all = b1.unionByName(b2)
    val ingest = TfIdf.ingestBatch(store, "doc_id", "text", Text.tokens) _
    ingest(b1, 1L)
    ingest(b2, 2L)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "rank_in_group")
        .as[(Long, String, Long, Long, Long, Int)].collect().toSeq
    val fromStore = canon(TfIdf.topTermsFromStore(spark, store, 2))
    val full = canon(TfIdf.topTerms(all, "doc_id", "text", Text.tokens, 2))
    assert(fromStore === full)
    // at-least-once replay of a committed batch changes nothing
    ingest(b2, 2L)
    assert(canon(TfIdf.topTermsFromStore(spark, store, 2)) === full)
    // crash simulation: the committed marker is missing (crash mid-ingest
    // after data writes) -> the replay re-overwrites batch 2's partitions
    // and must NOT double-count
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rmTree(java.nio.file.Paths.get(store, "meta", "batch_id=2"))
    ingest(b2, 2L)
    assert(canon(TfIdf.topTermsFromStore(spark, store, 2)) === full)
    // an ORPHAN batch (tf/df_delta landed, crash before the meta
    // marker) is invisible to the read side: without the committed
    // semi-join its df rows would deflate every idf while n_docs
    // excludes its documents
    ingest(Seq((9L, "the the orphan")).toDF("doc_id", "text"), 9L)
    rmTree(java.nio.file.Paths.get(store, "meta", "batch_id=9"))
    assert(canon(TfIdf.topTermsFromStore(spark, store, 2)) === full)
    rmTree(java.nio.file.Paths.get(store, "tf", "batch_id=9"))
    rmTree(java.nio.file.Paths.get(store, "df_delta", "batch_id=9"))
    // a genuinely new batch shifts df and n_docs for everyone
    ingest(Seq((5L, "data data data")).toDF("doc_id", "text"), 3L)
    val grown = canon(TfIdf.topTermsFromStore(spark, store, 2))
    assert(grown.size === 9) // doc 5 has one distinct term -> one row
    val fullGrown = canon(TfIdf.topTerms(
      all.unionByName(Seq((5L, "data data data")).toDF("doc_id", "text")),
      "doc_id", "text", Text.tokens, 2))
    assert(grown === fullGrown)
  }

  test("ingestBatch wires into a real foreachBatch stream") {
    val src = java.nio.file.Files.createTempDirectory("tfidf-src").toString
    val store = java.nio.file.Files.createTempDirectory("tfidf-store2").toString
    val docs = Seq((1L, "alpha beta beta"), (2L, "alpha gamma")).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(src)
    val q = spark.readStream.schema(docs.schema).parquet(src)
      .writeStream
      .foreachBatch(TfIdf.ingestBatch(store, "doc_id", "text", Text.tokens) _)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = TfIdf.topTermsFromStore(spark, store, 1)
      .orderBy("doc_id").select("doc_id", "term")
      .as[(Long, String)].collect().toSeq
    // beta (df=1) outranks alpha (df=2) for doc 1; gamma for doc 2
    assert(out === Seq((1L, "beta"), (2L, "gamma")))
  }

  test("tf counts repeats within a doc and k caps output") {
    val docs = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val out = TfIdf.topTerms(docs, "doc_id", "text", Text.tokens, 1)
      .as[(Long, String, Long, Long, Long, Int)].collect().toSeq
    // a: tf=3 df=1 score=3M*1; b: tf=1 df=1 score=1M -> only 'a' survives k=1
    assert(out === Seq((1L, "a", 3L, 1L, 3000000L, 1)))
  }

  test("bm25TopK: hand-computed integer scores, rare beats common, tf saturates") {
    // 4 docs, avgdl_x10 = (3+3+3+3)*10/4 = 30 -> norm term 2 + 80*dl/30
    val docs = Seq(
      (1L, "rare x y"),     // 'rare' df=1
      (2L, "common x y"),   // 'common' df=3
      (3L, "common x common"),
      (4L, "common x y")).toDF("doc_id", "text")
    val got = TfIdf.bm25TopK(docs, "doc_id", "text",
        Seq("rare", "common"), 10)
      .as[(Long, Long)].collect().toSeq
    // idf_ppm(rare) = (4-1+1)*1e6 DIV 2 = 2_000_000
    // idf_ppm(common) = (4-3+1)*1e6 DIV 4 = 500_000
    // dl=3 everywhere: denomNorm = (12 * (2 + 240 DIV 30)) DIV 10 = 12
    // tf=1: ts = idf * 22 DIV 22 = idf;  tf=2: ts = idf * 44 DIV 32
    val rare = 2000000L
    val common = 500000L
    val common2 = common * 44 / 32
    assert(got == Seq((1L, rare), (3L, common2), (2L, common), (4L, common)))
    // saturation: doubling tf multiplied the score by 44/32, not 2
    assert(common2 < 2 * common && common2 > common)
  }

  test("bm25TopK: duplicate doc_id rows fold into ONE document, like the oracle") {
    // doc 7 split across two rows must score as the 5-token document
    // "a b a c d", not as two independent fragments
    val split = Seq((7L, "a b"), (7L, "a c d"), (8L, "a")).toDF("doc_id", "text")
    val whole = Seq((7L, "a b a c d"), (8L, "a")).toDF("doc_id", "text")
    val gotSplit = TfIdf.bm25TopK(split, "doc_id", "text", Seq("a"), 10)
      .as[(Long, Long)].collect().toSeq
    val gotWhole = TfIdf.bm25TopK(whole, "doc_id", "text", Seq("a"), 10)
      .as[(Long, Long)].collect().toSeq
    assert(gotSplit == gotWhole, s"split=$gotSplit whole=$gotWhole")
  }

  test("bm25TopK: top-k plans as TakeOrderedAndProject with a broadcast df table") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val p = TfIdf.bm25TopK(docs, "doc_id", "text", Seq("b"), 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), "global sort crept into top-k")
    assert(p.contains("BroadcastHashJoin"), "per-term df table must broadcast")
  }
}
