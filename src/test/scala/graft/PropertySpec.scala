package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** Property-based cross-checks: each distributed operator against an
  * INDEPENDENT in-memory reference implementation on randomized inputs —
  * the adversarial complement of the hand-computed specs and the DuckDB
  * oracles (which share the operator's own formulation more closely).
  * Generators stay small so each trial is one fast local Spark job. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(12)

  // small vocab forces cross-document gram collisions
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 14).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(2, 8).flatMap(nd => Gen.listOfN(nd, docGen))

  /** Reference: duplicated window positions per doc (gram in >= 2
    * distinct docs), n fixed. */
  private def refDupWindows(docs: List[String], n: Int): Map[Long, List[Int]] = {
    val toks = docs.zipWithIndex.map { case (t, i) =>
      (i.toLong, t.split(" ").filter(_.nonEmpty).toList)
    }
    val grams = toks.flatMap { case (id, ts) =>
      ts.sliding(n).filter(_.size == n).zipWithIndex
        .map { case (g, p) => (id, p, g.mkString(" ")) }
    }
    val docsPerGram = grams.groupBy(_._3).view
      .mapValues(_.map(_._1).distinct.size).toMap
    grams.filter(g => docsPerGram(g._3) >= 2)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
  }

  /** Reference islands merge: positions -> (start, end, nWindows). */
  private def refSpans(pos: List[Int], n: Int): List[(Long, Long, Long)] = {
    if (pos.isEmpty) return Nil
    val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
    var start = pos.head; var prev = pos.head; var cnt = 1L
    pos.tail.foreach { p =>
      if (p - prev > n) {
        out += ((start.toLong, (prev + n - 1).toLong, cnt))
        start = p; cnt = 0L
      }
      prev = p; cnt += 1
    }
    out += ((start.toLong, (prev + n - 1).toLong, cnt))
    out.toList
  }

  test("property: dupSpans == independent reference on random corpora") {
    val n = 3
    val prop = Prop.forAll(corpusGen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup.dupSpans(df, "doc_id", "text", n)
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).view
        .mapValues(_.map(r => (r._2, r._3, r._4)).sortBy(_._1).toList).toMap
      val want = refDupWindows(docs, n).view
        .mapValues(refSpans(_, n)).toMap.filter(_._2.nonEmpty)
      got == want
    }
    val res = check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("property: cutSpans == reference token cut on random corpora") {
    val n = 3
    val prop = Prop.forAll(corpusGen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup.cutSpans(df, "doc_id", "text", n)
        .select("doc_id", "n_kept").as[(Long, Long)].collect().toMap
      val dup = refDupWindows(docs, n)
      val want = docs.zipWithIndex.flatMap { case (t, i) =>
        val ts = t.split(" ").filter(_.nonEmpty)
        val covered = dup.getOrElse(i.toLong, Nil)
          .flatMap(p => p until (p + n)).toSet
        val kept = ts.indices.filterNot(covered)
        if (kept.isEmpty) None else Some(i.toLong -> kept.size.toLong)
      }.toMap
      got == want
    }
    val res = check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("property: KMV sketch == k smallest distinct, any values, any k") {
    val gen = for {
      vs <- Gen.listOf(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
      k <- Gen.chooseNum(1, 12)
    } yield (vs.take(60), k)
    val prop = Prop.forAll(gen) { case (vs, k) =>
      val got =
        if (vs.isEmpty) Seq.empty[Long]
        else vs.toDF("hv").repartition(3)
          .agg(graft.plans.KmvSketch.kmv(col("hv"), k))
          .head().getSeq[Long](0)
      got == vs.distinct.sorted.take(k)
    }
    val res = check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("property: stateIntervals == reference run fold on random event logs") {
    val evGen = for {
      nu <- Gen.chooseNum(1, 3)
      len <- Gen.chooseNum(0, 12)
      evs <- Gen.listOfN(len, for {
        u <- Gen.chooseNum(1, nu)
        st <- Gen.oneOf("up", "down")
        sec <- Gen.chooseNum(0, 40)
      } yield (u.toLong, st, sec.toLong))
    } yield evs.zipWithIndex.map { case ((u, st, sec), i) =>
      (u, st, sec, i.toLong) // unique event id = total order tie-break
    }
    val prop = Prop.forAll(evGen) { evs =>
      val df = evs.toDF("user_id", "state", "sec", "eid")
      val got = graft.operators.Sessionize.stateIntervals(
          df, "user_id", "state", Seq(col("sec"), col("eid")), col("sec"))
        .select(col("user_id"), col("state"), col("from_sec"),
          col("to_sec"), col("n_events"))
        .as[(Long, String, Long, Long, Long)].collect().toSet
      val want = evs.groupBy(_._1).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._3, e._4))
        val runs = scala.collection.mutable.ListBuffer
          .empty[(Long, String, Long, Long, Long)]
        sorted.foreach { e =>
          runs.lastOption match {
            case Some((uu, st, f, _, c)) if st == e._2 =>
              runs(runs.size - 1) = (uu, st, f, e._3, c + 1)
            case _ => runs += ((u, e._2, e._3, e._3, 1L))
          }
        }
        runs
      }.toSet
      got == want
    }
    val res = check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("property: cumLess == brute-force rank counts under skewed scores") {
    // heavy duplication (scores 0..5) exercises the tie/boundary paths of
    // the range-partitioned histogram offsets
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      vs <- Gen.listOfN(n, Gen.chooseNum(0L, 5L))
      parts <- Gen.chooseNum(1, 5)
    } yield (vs, parts)
    val prop = Prop.forAll(gen) { case (vs, parts) =>
      val df = vs.toDF("score")
      val (cum, total) = graft.operators.Stats.cumLess(df, "score", parts)
      val got = cum.select("score", "__cnt_less")
        .as[(Long, Long)].collect().toMap
      val want = vs.distinct.map(s => s -> vs.count(_ < s).toLong).toMap
      total == vs.size.toLong && got == want
    }
    val res = check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("property: withRunningTotalBy == per-group prefix sums under hot groups") {
    // one group holding most rows = the skew the grouped prefix sum exists
    // for; order key (ord, uid) is a total order per group
    val gen = for {
      n <- Gen.chooseNum(1, 50)
      rows <- Gen.listOfN(n, for {
        g <- Gen.frequency(6 -> Gen.const("hot"), 1 -> Gen.oneOf("a", "b"))
        ord <- Gen.chooseNum(0L, 9L)
        w <- Gen.chooseNum(1L, 100L)
      } yield (g, ord, w))
      parts <- Gen.chooseNum(1, 5)
    } yield (rows.zipWithIndex.map { case ((g, o, w), i) => (g, o, w, i.toLong) },
      parts)
    val prop = Prop.forAll(gen) { case (rows, parts) =>
      val df = rows.toDF("g", "ord", "w", "uid")
      val got = graft.operators.Stats.withRunningTotalBy(
          df, Seq(col("g")), Seq(col("ord"), col("uid")), col("w"),
          "cum", parts)
        .select("uid", "cum").as[(Long, Long)].collect().toMap
      val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(r => (r._2, r._4))
          .scanLeft((0L, 0L)) { case ((_, acc), r) => (r._4, acc + r._3) }
          .tail
      }.toMap
      got == want
    }
    val res = check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("property: asofJoinDir == reference merge_asof, both directions, any tolerance") {
    val rightGen = for {
      n <- Gen.chooseNum(0, 8)
      ts <- Gen.pick(n, 0L to 15L)
    } yield ts.toList.map(t => (t, t * 100 + 7)) // value derived from ts: unique
    val gen = for {
      lts <- Gen.listOf(Gen.chooseNum(0L, 15L)).map(_.take(8))
      r1 <- rightGen
      r2 <- rightGen
      dir <- Gen.oneOf("backward", "forward")
      tol <- Gen.option(Gen.chooseNum(0L, 5L))
    } yield (lts, List(1L -> r1, 2L -> r2), dir, tol)
    val prop = Prop.forAll(gen) { case (lts, rights, dir, tol) =>
      val left = lts.zipWithIndex.flatMap { case (t, i) =>
        Seq((1L, t, i.toLong), (2L, t, i.toLong + 100))
      }
      val right = rights.flatMap { case (k, rs) => rs.map(r => (k, r._1, r._2)) }
      if (left.isEmpty) true
      else {
        val got = graft.operators.AsofJoin.asofJoinDir(
            left.toDF("k", "ts", "lv"), right.toDF("k", "ts", "rv"),
            "k", "ts", "rv", dir, tol)
          .select("k", "ts", "lv", "asof_rv", "asof_ts")
          .as[(Long, Long, Long, Option[Long], Option[Long])]
          .collect().toSet
        val rmap = rights.toMap
        val want = left.map { case (k, t, lv) =>
          val cands = rmap.getOrElse(k, Nil).filter { case (rt, _) =>
            if (dir == "backward") rt <= t && tol.forall(rt >= t - _)
            else rt >= t && tol.forall(rt <= t + _)
          }
          val m =
            if (cands.isEmpty) None
            else Some(if (dir == "backward") cands.maxBy(_._1) else cands.minBy(_._1))
          (k, t, lv, m.map(_._2), m.map(_._1))
        }.toSet
        got == want
      }
    }
    val res = check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("property: concurrency sweep == brute-force interval overlap count") {
    val gen = for {
      n <- Gen.chooseNum(1, 10)
      ss <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 3L)
        s <- Gen.chooseNum(0L, 20L)
        len <- Gen.chooseNum(0L, 10L)
      } yield (u, s, s + len))
    } yield ss.zipWithIndex.map { case ((u, s, e), i) => (u, i.toLong, s, e) }
    val prop = Prop.forAll(gen) { sessions =>
      val got = graft.operators.Sessionize.concurrency(
          sessions.toDF("user_id", "session_id", "start_sec", "end_sec"),
          "user_id", "session_id", "start_sec", "end_sec")
        .select("user_id", "session_id", "n_concurrent")
        .as[(Long, Long, Long)].collect().toSet
      val want = sessions.map { case (u, sid, s, _) =>
        (u, sid, sessions.count { case (_, _, s2, e2) => s2 <= s && e2 >= s }.toLong)
      }.toSet
      got == want
    }
    val res = check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("property: graft-xlsx write -> read round-trips arbitrary cell content") {
    val cellGen = Gen.frequency(
      5 -> Gen.listOf(Gen.oneOf(
        Gen.alphaNumChar, Gen.oneOf('<', '>', '&', '"', '\'', ' ', 'é')))
        .map(_.mkString).map(s => if (s.isEmpty) "x" else s),
      1 -> Gen.const(null.asInstanceOf[String]))
    val gen = for {
      n <- Gen.chooseNum(1, 12)
      rows <- Gen.listOfN(n, Gen.zip(cellGen, cellGen))
    } yield rows.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
    val prop = Prop.forAll(gen) { rows =>
      val dir = java.nio.file.Files.createTempDirectory("xlsx-prop").toString
      rows.toDF("id", "a", "b").coalesce(1)
        .write.format("graft-xlsx").mode("append").save(dir)
      val back = spark.read.format("graft-xlsx")
        .load(new java.io.File(dir).listFiles()
          .filter(_.getName.endsWith(".xlsx")).map(_.getPath): _*)
        .as[(String, Option[String], Option[String])].collect()
        .map(t => t._1.toLong -> ((t._2, t._3))).toMap
      rows.forall { case (i, a, b) =>
        back(i) == ((Option(a), Option(b)))
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: canonicalize is idempotent and matches the JVM reference") {
    val strGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '-', '!', ',', 'é', 'Ü', 'ß', '́')
    )).map(_.mkString)
    val prop = Prop.forAll(Gen.listOf(strGen).map(_.take(30))) { ss =>
      ss.isEmpty || {
        val df = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("id", "t")
        val once = df.select(col("id"),
            graft.functions.Text.canonicalize(col("t")).as("c"))
        val got = once.as[(Long, String)].collect().toMap
        val twice = once.select(col("id"),
            graft.functions.Text.canonicalize(col("c")).as("c"))
          .as[(Long, String)].collect().toMap
        val ref = ss.zipWithIndex.map { case (s, i) =>
          i.toLong -> java.text.Normalizer
            .normalize(s, java.text.Normalizer.Form.NFC)
            .toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        }.toMap
        got == ref && twice == got
      }
    }
    val res = check(params, prop)
    assert(res.passed, res.status.toString)
  }

  // ---- event analytics ----------------------------------------------

  private val evGen: Gen[List[(Long, String, Long, Long)]] =
    Gen.chooseNum(1, 40).flatMap { n =>
      Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 5L)
        t <- Gen.oneOf("a", "b", "c", "signup")
        s <- Gen.chooseNum(0L, 30L) // small domain forces sec ties
      } yield (u, t, s, 0L))
    }.map(_.zipWithIndex.map { case ((u, t, s, _), i) => (u, t, s, i.toLong) })

  test("property: transitions == in-memory reference, ties broken by event id") {
    val prop = Prop.forAll(evGen) { evs =>
      val ref = evs.groupBy(_._1).values.flatMap { es =>
        es.sortBy(e => (e._3, e._4)).sliding(2).collect {
          case List(p, c) => (p._2, c._2)
        }
      }.toList.groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      val rowTotals = ref.groupBy(_._1).map { case (f, rs) => f -> rs.map(_._3).sum }
      val expect = ref.map { case (f, t, n) => (f, t, n, n * 1000000L / rowTotals(f)) }.toSet
      val got = graft.operators.Funnel.transitions(
          evs.toDF("user_id", "event_type", "sec", "event_id"),
          col("user_id"), col("event_type"), col("sec"), col("event_id"))
        .as[(String, String, Long, Long)].collect().toSet
      got == expect
    }
    val res = check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("property: retention == in-memory reference on random event logs") {
    val wk = 7L // small 'week' so offsets vary
    val prop = Prop.forAll(evGen) { evs =>
      val cohorts = evs.filter(_._2 == "signup").groupBy(_._1)
        .map { case (u, es) => u -> es.map(_._3 / wk).min }
      val expect = evs.map(e => (e._1, e._3 / wk)).distinct
        .flatMap { case (u, w) => cohorts.get(u).map(c => (c, w - c)) }
        .filter { case (_, o) => o >= 0 && o <= 4 }
        .groupBy(identity).map { case ((c, o), v) => (c, o, v.size.toLong) }.toSet
      // operator divides by 604800; rescale the input secs to real weeks
      val scaled = evs.map(e => (e._1, e._2, e._3 * 86400L, e._4))
      val got = graft.operators.Funnel.retention(
          scaled.toDF("user_id", "event_type", "sec", "event_id"),
          col("user_id"), col("event_type"), col("sec"), "signup", 4)
        .as[(Long, Long, Long)].collect().toSet
      got == expect
    }
    val res = check(params, prop)
    assert(res.passed, res.status.toString)
  }

  // ---- SQLite record codec ------------------------------------------

  /** Test-side ENCODER for the SQLite record format (format spec §2.1):
    * an independent implementation of the write direction, so the
    * decoder is checked against the spec rather than against itself. */
  private def sqliteVarint(v: Long): Array[Byte] = {
    require(v >= 0 && (v >>> 56) == 0, "test varints stay <= 56 bits")
    var rest = v >>> 7
    var out = List[Byte]((v & 0x7F).toByte)
    while (rest != 0) { out = ((rest & 0x7F) | 0x80).toByte :: out; rest >>>= 7 }
    out.toArray
  }

  private def encodeRecord(vals: List[Any]): Array[Byte] = {
    def intBytes(v: Long, n: Int): Array[Byte] =
      (n - 1 to 0 by -1).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
    val enc: List[(Long, Array[Byte])] = vals.map {
      case null => (0L, Array.empty[Byte])
      case 0L => (8L, Array.empty[Byte])
      case 1L => (9L, Array.empty[Byte])
      case v: Long =>
        val bits = 65 - java.lang.Long.numberOfLeadingZeros(
          if (v < 0) ~v else v) // sign bit included
        val n = Seq(1, 2, 3, 4, 6, 8).find(_ * 8 >= bits).get
        (Seq(1, 2, 3, 4, 6, 8).indexOf(n) + 1L, intBytes(v, n))
      case d: Double =>
        (7L, intBytes(java.lang.Double.doubleToLongBits(d), 8))
      case s: String =>
        val b = s.getBytes("UTF-8"); (b.length * 2L + 13L, b)
      case b: Array[Byte] => (b.length * 2L + 12L, b)
    }
    val typeBytes = enc.flatMap(e => sqliteVarint(e._1)).toArray
    // header length includes its own varint: iterate to the fixpoint
    var hdrLen = typeBytes.length + 1
    while (sqliteVarint(hdrLen.toLong).length + typeBytes.length != hdrLen)
      hdrLen = sqliteVarint(hdrLen.toLong).length + typeBytes.length
    sqliteVarint(hdrLen.toLong) ++ typeBytes ++ enc.flatMap(_._2)
  }

  test("property: SQLite record decode inverts an independent spec encoder") {
    val valGen: Gen[Any] = Gen.oneOf(
      Gen.const(null),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(v => v: Any),
      Gen.oneOf(0L, 1L, -1L, 127L, 128L, -128L, 32767L, 32768L).map(v => v: Any),
      Gen.chooseNum(-1e12, 1e12).map(d => d: Any),
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('é', '字', ' ', '\n')))
        .map(_.mkString: Any),
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
        .map(_.toArray[Byte]: Any))
    val prop = Prop.forAll(Gen.listOfN(6, valGen)) { vals =>
      val decoded = graft.sources.SqliteFile.record(encodeRecord(vals)).toList
      decoded.length == vals.length && decoded.zip(vals).forall {
        case (a: Array[Byte], b: Array[Byte]) => a.sameElements(b)
        case (a: Double, b: Double) =>
          java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
        case (a, b) => a == b
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- training-batch assembly --------------------------------------

  test("property: packSequences == serial concat-and-chunk on random corpora") {
    val gen = for {
      n <- Gen.chooseNum(1, 30)
      toks <- Gen.listOfN(n, Gen.chooseNum(0L, 40L))
      budget <- Gen.chooseNum(1L, 16L)
    } yield (toks, budget)
    val prop = Prop.forAll(gen) { case (toks, budget) =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "n_tokens").repartition(3)
      val got = graft.operators.TrainMix
        .packSequences(df, Seq(col("doc_id")), "n_tokens", budget)
        .select("doc_id", "seq_id", "seq_off", "n_splits")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
      // serial reference: walk the docs in id order, keep a running start
      var start = 0L
      val ref = toks.zipWithIndex.collect {
        case (t, i) if t > 0 =>
          val row = (i.toLong, start / budget, start % budget,
            (start + t - 1) / budget - start / budget)
          start += t
          row
        case (t, _) => start += t; null
      }.filter(_ != null)
      got == ref
    }
    val res = check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("property: temperatureSample rates == in-memory sqrt formula, filter == md5 reference") {
    val gen = for {
      nSrc <- Gen.chooseNum(1, 5)
      masses <- Gen.listOfN(nSrc, Gen.chooseNum(1L, 500L))
    } yield masses
    val prop = Prop.forAll(gen) { masses =>
      // one doc per source carrying the whole mass keeps the table tiny
      val rows = masses.zipWithIndex.map { case (m, i) => (i.toLong, s"s$i", m) }
      val df = rows.toDF("doc_id", "source", "n_tokens")
      val out = graft.operators.TrainMix
        .temperatureSample(df, "source", "n_tokens", col("doc_id"))
        .select("doc_id", "rate_ppm").as[(Long, Long)].collect().toMap
      val mn = masses.min
      val refRate = masses.zipWithIndex.map { case (m, i) =>
        i.toLong -> math.floor(
          1000000.0 * math.sqrt(mn.toDouble) / math.sqrt(m.toDouble)).toLong
      }.toMap
      // kept set: the identical md5-threshold predicate, computed here
      // from the digest directly (independent of Stats.hashSample)
      def md5mod(id: Long): Long = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
        val top = java.nio.ByteBuffer.wrap(d.take(8)).getLong >>> 4
        ((top % 1000000) + 1000000) % 1000000
      }
      val refKept = refRate.filter { case (id, r) => md5mod(id) < r }
      out == refKept.map { case (id, r) => id -> r }
    }
    val res = check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("property: interleaveBySource is a round-robin permutation") {
    val gen = for {
      nSrc <- Gen.chooseNum(1, 4)
      sizes <- Gen.listOfN(nSrc, Gen.chooseNum(1, 15))
    } yield sizes
    val prop = Prop.forAll(gen) { sizes =>
      val rows = sizes.zipWithIndex.flatMap { case (n, s) =>
        (1 to n).map(i => ((s * 1000 + i).toLong, s"s$s"))
      }
      val out = graft.operators.TrainMix
        .interleaveBySource(rows.toDF("doc_id", "source").repartition(3),
          "source", col("doc_id"))
        .select("source", "round", "global_pos")
        .as[(String, Long, Long)].collect().sortBy(_._3).toList
      val n = rows.size.toLong
      // dense permutation, rounds non-decreasing along the global order,
      // and within a round sources strictly ascend (the cycle structure)
      out.map(_._3) == (1L to n).toList &&
        out.sliding(2).forall {
          case List((sa, ra, _), (sb, rb, _)) =>
            ra < rb || (ra == rb && sa < sb)
          case _ => true
        }
    }
    val res = check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("property: shardLayout positions are a dense per-shard permutation") {
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      ids <- Gen.listOfN(n, Gen.chooseNum(1L, 1000000L)).map(_.distinct)
      shards <- Gen.chooseNum(1, 7)
    } yield (ids, shards)
    val prop = Prop.forAll(gen) { case (ids, shards) =>
      val out = graft.operators.TrainMix
        .shardLayout(ids.toDF("doc_id").repartition(3), col("doc_id"), shards)
        .select("shard", "shard_pos").as[(Long, Long)].collect().toList
      out.forall { case (s, _) => s >= 0 && s < shards } &&
        out.groupBy(_._1).values.forall { g =>
          g.map(_._2).sorted == (1L to g.size.toLong).toList
        }
    }
    val res = check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
