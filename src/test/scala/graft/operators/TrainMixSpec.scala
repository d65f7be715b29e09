package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Training-batch assembly (TrainMix): temperature mixture rates, packing
  * arithmetic against an in-memory reference, shard layout vs the window
  * form it replaces, and determinism across re-runs. */
class TrainMixSpec extends SparkSpec {
  import spark.implicits._

  // ---- temperatureSample ----------------------------------------------

  test("temperatureSample: rates follow sqrt shares; smallest source keeps all") {
    // masses 100, 400, 10000 -> rates 1e6, 5e5, 1e5 ppm exactly
    val docs = Seq.tabulate(100)(i => (i.toLong, "small", 1L)) ++
      Seq.tabulate(100)(i => (1000L + i, "mid", 4L)) ++
      Seq.tabulate(100)(i => (2000L + i, "big", 100L))
    val df = docs.toDF("doc_id", "source", "n_tokens")
    val out = TrainMix.temperatureSample(df, "source", "n_tokens", col("doc_id"))
    val rates = out.select("source", "rate_ppm").distinct().as[(String, Long)]
      .collect().toMap
    assert(rates("small") == 1000000L)
    assert(rates("mid") == 500000L)   // sqrt(100/400)  = 1/2
    assert(rates("big") == 100000L)   // sqrt(100/10000) = 1/10
    // rate 1e6 keeps every row of the smallest source
    assert(out.where($"source" === "small").count() == 100)
    // kept set is the md5-threshold subset, deterministic on re-run
    val again = TrainMix.temperatureSample(df, "source", "n_tokens", col("doc_id"))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("temperatureSample: null sources are dropped and never set the min") {
    val df = Seq((1L, "a", 4L), (2L, "a", 5L), (3L, null, 1L))
      .toDF("doc_id", "source", "n_tokens")
    val out = TrainMix.temperatureSample(df, "source", "n_tokens", col("doc_id"))
    // null-source row gone; 'a' is the only (hence smallest) source: rate 1e6
    assert(out.select("source").distinct().as[String].collect().toSeq == Seq("a"))
    assert(out.count() == 2)
  }

  // ---- packSequences ---------------------------------------------------

  test("packSequences: seq_id/seq_off/n_splits match the serial layout") {
    // budget 10; docs in id order with token counts 4, 7, 10, 1, 25
    val df = Seq((1L, 4L), (2L, 7L), (3L, 10L), (4L, 1L), (5L, 25L), (6L, 0L))
      .toDF("doc_id", "n_tokens")
    val out = TrainMix.packSequences(df, Seq(col("doc_id")), "n_tokens", 10L)
      .select("doc_id", "seq_id", "seq_off", "n_splits")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    // serial reference: starts 0,4,11,21,22 -> seq floor(start/10),
    // offset start%10, splits = floor((end-1)/10) - floor(start/10)
    assert(out == List(
      (1L, 0L, 0L, 0L),  // [0,4)   fits seq 0
      (2L, 0L, 4L, 1L),  // [4,11)  straddles 0->1
      (3L, 1L, 1L, 1L),  // [11,21) straddles 1->2
      (4L, 2L, 1L, 0L),  // [21,22) fits seq 2
      (5L, 2L, 2L, 2L))) // [22,47) spans 2..4: two cuts
    // zero-token doc 6 is dropped
  }

  test("packSequences: layout is independent of partitioning") {
    val docs = (1L to 500L).map(i => (i, (i * 7 % 13) + 1))
    val a = TrainMix.packSequences(docs.toDF("doc_id", "n_tokens").repartition(7),
      Seq(col("doc_id")), "n_tokens", 64L)
    val b = TrainMix.packSequences(docs.toDF("doc_id", "n_tokens").coalesce(1),
      Seq(col("doc_id")), "n_tokens", 64L)
    assert(a.orderBy("doc_id").collect().toSeq ==
      b.orderBy("doc_id").collect().toSeq)
  }

  // ---- packSegments ----------------------------------------------------

  test("packSegments: boundary-cut docs emit one exact segment per sequence") {
    // budget 10; starts 0,4,11,21,22 (same layout as the packSequences test)
    val df = Seq((1L, 4L), (2L, 7L), (3L, 10L), (4L, 1L), (5L, 25L), (6L, 0L))
      .toDF("doc_id", "n_tokens")
    val out = TrainMix.packSegments(df, Seq(col("doc_id")), "n_tokens", 10L)
      .select("doc_id", "seq_id", "doc_off", "seq_off", "seg_len")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toList
    assert(out == List(
      (1L, 0L, 0L, 0L, 4L),             // [0,4)   whole doc in seq 0
      (2L, 0L, 0L, 4L, 6L),             // [4,10)  first 6 tokens
      (2L, 1L, 6L, 0L, 1L),             // [10,11) last token opens seq 1
      (3L, 1L, 0L, 1L, 9L), (3L, 2L, 9L, 0L, 1L),
      (4L, 2L, 0L, 1L, 1L),
      (5L, 2L, 0L, 2L, 8L), (5L, 3L, 8L, 0L, 10L), (5L, 4L, 18L, 0L, 7L)))
    // invariants: per-doc lengths sum to token count; per-seq segments
    // tile [0, budget) exactly (last sequence short)
    val byDoc = out.groupBy(_._1).map { case (d, g) => d -> g.map(_._5).sum }
    assert(byDoc == Map(1L -> 4L, 2L -> 7L, 3L -> 10L, 4L -> 1L, 5L -> 25L))
    for ((_, g) <- out.groupBy(_._2)) {
      val segs = g.sortBy(_._4).map(s => (s._4, s._4 + s._5))
      assert(segs.head._1 == 0L)
      assert(segs.sliding(2).forall {
        case List((_, e), (s2, _)) => e == s2; case _ => true
      }, "segments must tile the sequence with no gap/overlap")
    }
  }

  // ---- epochPlan -------------------------------------------------------

  test("epochPlan: closing fill spends the budget exactly (caps bind sequentially)") {
    // T = 3375; w = 10/20/25; ideals 613/1227/1534 -> a caps at 400;
    // redistribution round 1 hands b +95 / c +118 (floor residue 1),
    // round 2 floors to zero — the closing greedy fill gives the final
    // token to c (largest w with cap room), landing sum(alloc) == T
    val df = Seq(("a", 100L), ("b", 400L), ("c", 625L))
      .toDF("source", "n_tokens")
    val out = TrainMix.epochPlan(df, "source", "n_tokens",
        budgetPpm = 3000000L, maxEpochs = 4)
      .select("source", "alloc_tokens").as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 400L, "b" -> 1322L, "c" -> 1653L))
    assert(out.values.sum == 3375L)
  }

  test("epochPlan invariant: sum(alloc) == min(T, sum(cap)) on randomized masses") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val massesGen = Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1L, 5000L)))
    val prop = Prop.forAll(massesGen, Gen.oneOf(500000L, 2000000L, 9000000L),
        Gen.chooseNum(1, 4)) { (masses, ppm, eps) =>
      val df = masses.zipWithIndex
        .map { case (m, i) => (s"s$i", m) }.toDF("source", "n_tokens")
      val alloc = TrainMix.epochPlan(df, "source", "n_tokens", ppm, eps)
        .select("alloc_tokens", "n_tokens").as[(Long, Long)].collect()
      val t = masses.sum * ppm / 1000000L
      val sumCap = masses.map(_ * eps).sum
      alloc.forall { case (a, n) => a <= n * eps } &&
        alloc.map(_._1).sum == math.min(t, sumCap)
    }
    assert(check(Parameters.default.withMinSuccessfulTests(10), prop).passed)
  }

  test("epochPlan: caps, one redistribution round, hand-computed allocation") {
    // masses 100/400/10000 -> w 10/20/100, tw 130, tn 10500; budget 2x ->
    // T 21000; ideals 1615/3230/16153: a and b cap at 4 epochs (400/1600),
    // c absorbs the 2847 surplus -> 19000 tokens = 1.9 epochs
    val df = Seq(("a", 100L), ("b", 400L), ("c", 10000L))
      .toDF("source", "n_tokens")
    val out = TrainMix.epochPlan(df, "source", "n_tokens",
        budgetPpm = 2000000L, maxEpochs = 4)
      .select("source", "alloc_tokens", "epochs_ppm", "capped")
      .as[(String, Long, Long, Boolean)].collect().sortBy(_._1).toList
    assert(out == List(
      ("a", 400L, 4000000L, true),
      ("b", 1600L, 4000000L, true),
      ("c", 19000L, 1900000L, false)))
  }

  test("epochPlan: every source capped leaves the surplus unallocated") {
    val df = Seq(("a", 100L), ("b", 100L)).toDF("source", "n_tokens")
    val out = TrainMix.epochPlan(df, "source", "n_tokens",
        budgetPpm = 9000000L, maxEpochs = 4)
      .select("source", "alloc_tokens", "epochs_ppm", "capped")
      .as[(String, Long, Long, Boolean)].collect().sortBy(_._1).toList
    // T = 1800 but both sources stop at 4 epochs = 400 tokens each
    assert(out == List(("a", 400L, 4000000L, true), ("b", 400L, 4000000L, true)))
  }

  // ---- writeShards -----------------------------------------------------

  test("writeShards: shard directories, in-file shard_pos order, rerun-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val df = (1L to 200L).toDF("doc_id")
    TrainMix.writeShards(df, col("doc_id"), 4, dir, partsPerShard = 2)
    // one directory per shard
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.toSeq == Seq("shard=0", "shard=1", "shard=2", "shard=3"))
    // within every file, rows are an ascending shard_pos run
    for (sd <- shardDirs) {
      val files = new java.io.File(s"$dir/$sd").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty)
      for (f <- files) {
        val pos = spark.read.parquet(f.getAbsolutePath)
          .select("shard_pos").as[Long].collect()
        assert(pos.sameElements(pos.sorted), s"$sd/${f.getName} out of order")
      }
    }
    // the materialized layout equals the in-memory one (and a rerun's)
    val back = spark.read.parquet(dir)
      .select("doc_id", "shard", "shard_pos")
      .as[(Long, Long, Long)].collect().toSet
    val mem = TrainMix.shardLayout(df, col("doc_id"), 4)
      .select("doc_id", "shard", "shard_pos")
      .as[(Long, Long, Long)].collect().toSet
    assert(back == mem)
  }

  // ---- interleaveBySource ----------------------------------------------

  test("interleaveBySource: round-robin across sources, window-equivalent") {
    val df = ((1L to 40L).map(i => (i, "a")) ++ (100L to 109L).map(i => (i, "b")))
      .toDF("doc_id", "source")
    val out = TrainMix.interleaveBySource(df, "source", col("doc_id"))
    // the first 2*min(n_a, n_b) global positions alternate sources:
    // round r of every source precedes round r+1 of any source
    val seq = out.orderBy("global_pos")
      .select("source", "round").as[(String, Long)].collect()
    assert(seq.take(20).count(_._1 == "b") == 10,
      "source b's 10 rounds must all land in the first 10 interleave cycles")
    // global_pos is a dense 1..n permutation
    assert(out.select("global_pos").as[Long].collect().sorted.toSeq ==
      (1L to 50L))
    // cell-identical to the two-window formulation it replaces
    val ord = graft.plans.Md5Long.md5Long(
      concat(lit("i|"), col("doc_id").cast("string")))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(ord, col("doc_id"))
    val wg = org.apache.spark.sql.expressions.Window
      .orderBy(col("round"), col("source"), col("doc_id"))
    val ref = df.withColumn("round", row_number().over(wr).cast("long"))
      .withColumn("global_pos", row_number().over(wg).cast("long"))
    assert(out.select("doc_id", "source", "round", "global_pos")
      .orderBy("doc_id").collect().toSeq ==
      ref.select("doc_id", "source", "round", "global_pos")
        .orderBy("doc_id").collect().toSeq)
  }

  // ---- shardLayout -----------------------------------------------------

  test("shardLayout: equals the per-shard ROW_NUMBER window; positions dense") {
    val df = (1L to 300L).toDF("doc_id")
    val out = TrainMix.shardLayout(df, col("doc_id"), 4)
    // every row lands in [0, 4)
    assert(out.where($"shard" < 0 || $"shard" >= 4).count() == 0)
    // dense 1..n_s positions per shard
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("shard_pos").as("mn"),
        max("shard_pos").as("mx"), countDistinct("shard_pos").as("nd"))
      .as[(Long, Long, Long, Long, Long)].collect()
    perShard.foreach { case (_, n, mn, mx, nd) =>
      assert(mn == 1L && mx == n && nd == n)
    }
    // cell-identical to the window formulation it replaces at scale
    // ('s|' salts the shard hash away from hashSample's threshold hash)
    val md5 = graft.plans.Md5Long.md5Long(
      concat(lit("s|"), col("doc_id").cast("string")))
    val ord = graft.plans.Md5Long.md5Long(
      concat(lit("o|"), col("doc_id").cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(md5, lit(4L))).orderBy(ord, col("doc_id"))
    val ref = df.select(col("doc_id"), pmod(md5, lit(4L)).as("shard"),
      row_number().over(w).cast("long").as("shard_pos"))
    assert(out.select("doc_id", "shard", "shard_pos").orderBy("doc_id")
      .collect().toSeq ==
      ref.orderBy("doc_id").collect().toSeq)
  }
}
