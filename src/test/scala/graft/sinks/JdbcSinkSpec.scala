package graft.sinks

import graft.SparkSpec
import java.sql.DriverManager

/** Round-trips against an in-memory Derby database (the JDBC target
  * available in this sandbox; the production target is Postgres — same
  * code path, different url). */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { val s = c.createStatement(); try s.executeUpdate(sql) finally s.close() }
    finally c.close()
  }

  private def table(name: String): Unit =
    exec(s"CREATE TABLE $name (k INT, month VARCHAR(7), v DOUBLE)")

  test("append writes all rows in batches") {
    table("t_append")
    val df = Seq((1, "2024-01", 1.5), (2, "2024-01", 2.5), (3, "2024-02", 3.5))
      .toDF("k", "month", "v")
    JdbcSink.append(df, url, "t_append", batchSize = 2, numPartitions = Some(1))
    val back = JdbcSink.read(spark, url, "t_append")
    assert(back.count() === 3)
    assert(back.selectExpr("sum(v)").as[Double].head() === 7.5)
  }

  test("overwrite(truncate) replaces content but keeps the table") {
    table("t_over")
    JdbcSink.append(Seq((1, "2024-01", 1.0)).toDF("k", "month", "v"), url, "t_over")
    JdbcSink.overwrite(Seq((9, "2024-02", 9.0)).toDF("k", "month", "v"),
      url, "t_over")
    val back = JdbcSink.read(spark, url, "t_over").as[(Int, String, Double)].collect()
    assert(back.toSeq === Seq((9, "2024-02", 9.0)))
  }

  test("credentials flow from a CredentialProvider into the JDBC write as properties") {
    import graft.auth.CredentialProvider
    // file-backed secret (the mounted-volume shape)
    val dir = java.nio.file.Files.createTempDirectory("graft-secrets")
    java.nio.file.Files.writeString(dir.resolve("warehouse.properties"),
      "user=app\npassword=s3cret\n")
    val fromFile = JdbcSink.credentialProps(
      new CredentialProvider.FileProvider(dir.toString), "warehouse")
    assert(fromFile === Map("user" -> "app", "password" -> "s3cret"))
    // env-backed secret resolves the same fields
    val fromEnv = JdbcSink.credentialProps(
      new CredentialProvider.EnvProvider(Map(
        "GRAFT_SECRET_WAREHOUSE_USER" -> "app",
        "GRAFT_SECRET_WAREHOUSE_PASSWORD" -> "s3cret",
        "UNRELATED" -> "x")), "warehouse")
    assert(fromEnv === fromFile)
    // and the resolved props drive a real authenticated write + read +
    // scoped refresh (Derby: the user property selects the schema, so a
    // mismatched credential path would fail to find the table)
    table("t_cred")
    val df = Seq((1, "2024-01", 1.0)).toDF("k", "month", "v")
    JdbcSink.append(df, url, "t_cred", props = fromFile)
    JdbcSink.refreshScope(Seq((2, "2024-01", 2.0)).toDF("k", "month", "v"),
      url, "t_cred", "month = '2024-01'", props = fromFile)
    val back = JdbcSink.read(spark, url, "t_cred", props = fromFile)
      .as[(Int, String, Double)].collect()
    assert(back.toSeq === Seq((2, "2024-01", 2.0)))
    // a missing secret fails loudly at setup time
    intercept[NoSuchElementException] {
      new CredentialProvider.FileProvider(dir.toString).credentials("nope")
    }
    intercept[NoSuchElementException] {
      new CredentialProvider.EnvProvider(Map.empty).credentials("warehouse")
    }
  }

  test("legacy env credentials cannot absorb a longer secret's fields") {
    import graft.auth.CredentialProvider
    // db + db_ro both present in legacy (single-underscore) form: from
    // db's view, DB_RO_PASSWORD is claimable by secret db_ro, so it must
    // NOT surface as db's field ro_password (cross-secret leak)
    val env = Map(
      "GRAFT_SECRET_DB_USER" -> "app",
      "GRAFT_SECRET_DB_PASSWORD" -> "s3cret",
      "GRAFT_SECRET_DB_RO_PASSWORD" -> "readonly-s3cret")
    val db = new CredentialProvider.EnvProvider(env).credentials("db")
    assert(db === Map("user" -> "app", "password" -> "s3cret"))
    // the longer secret still resolves via its own prefix
    val ro = new CredentialProvider.EnvProvider(env).credentials("db_ro")
    assert(ro === Map("password" -> "readonly-s3cret"))
    // ambiguous-only legacy vars: loud failure naming the dropped keys,
    // not a silent empty map
    val e = intercept[NoSuchElementException] {
      new CredentialProvider.EnvProvider(Map(
        "GRAFT_SECRET_DB_RO_PASSWORD" -> "x")).credentials("db")
    }
    assert(e.getMessage.contains("GRAFT_SECRET_DB_RO_PASSWORD"))
    // the double-underscore form expresses multi-token fields exactly
    val strict = new CredentialProvider.EnvProvider(Map(
      "GRAFT_SECRET_DB__RO_PASSWORD" -> "y")).credentials("db")
    assert(strict === Map("ro_password" -> "y"))
  }

  test("refreshScope is an idempotent delete-then-insert for one scope") {
    table("t_scope")
    JdbcSink.append(Seq(
      (1, "2024-01", 1.0), (2, "2024-02", 2.0)).toDF("k", "month", "v"), url, "t_scope")
    val january = Seq((10, "2024-01", 10.0), (11, "2024-01", 11.0)).toDF("k", "month", "v")
    // run the same scoped refresh twice: second run must not duplicate
    JdbcSink.refreshScope(january, url, "t_scope", "month = '2024-01'")
    JdbcSink.refreshScope(january, url, "t_scope", "month = '2024-01'")
    val back = JdbcSink.read(spark, url, "t_scope")
    assert(back.where("month = '2024-01'").count() === 2)
    assert(back.where("month = '2024-02'").count() === 1) // untouched scope
    import org.apache.spark.sql.functions._
    assert(back.agg(sum("v")).as[Double].head() === 23.0)
  }

  test("upsert merges by key: updates in place, inserts new, leaves the rest") {
    table("t_upsert")
    JdbcSink.append(Seq(
      (1, "2024-01", 1.0), (2, "2024-01", 2.0), (3, "2024-02", 3.0))
      .toDF("k", "month", "v"), url, "t_upsert")
    val delta = Seq((2, "2024-03", 20.0), (4, "2024-03", 40.0))
      .toDF("k", "month", "v")
    JdbcSink.upsert(delta, url, "t_upsert", Seq("k"))
    val back = JdbcSink.read(spark, url, "t_upsert")
      .as[(Int, String, Double)].collect().sortBy(_._1).toSeq
    assert(back === Seq(
      (1, "2024-01", 1.0),   // untouched
      (2, "2024-03", 20.0),  // updated in place
      (3, "2024-02", 3.0),   // untouched
      (4, "2024-03", 40.0))) // inserted
    // idempotent: same delta again changes nothing
    JdbcSink.upsert(delta, url, "t_upsert", Seq("k"))
    assert(JdbcSink.read(spark, url, "t_upsert").count() === 4)
    // the staging table is gone (only the target remains)
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.getMetaData.getTables(null, null, "T_UPSERT%", null)
      var names = List.empty[String]
      while (rs.next()) names ::= rs.getString("TABLE_NAME")
      assert(names === List("T_UPSERT"), s"staging leaked: $names")
    } finally c.close()
  }

  test("upsert: concurrent writers racing on one target — no lost keys, no duplicate keys, loud-or-landed") {
    // the SnapshotStressSpec discipline applied to the JDBC leg: four
    // writers upsert overlapping key ranges concurrently (each stages
    // into its own UUID table, then MERGEs — the warehouse serializes
    // the MERGEs). A writer may fail LOUDLY under lock contention
    // (Derby 40001/40XL1) and retries like a real caller; the contract
    // is that afterwards every key a SUCCESSFUL writer covered exists
    // exactly once, carrying one of its writers' values — never a torn
    // row, never a duplicate key, never a silently dropped merge.
    table("t_race")
    val writers = 4
    val landedRounds =
      new java.util.concurrent.ConcurrentHashMap[(Int, Int), Boolean]()
    val threads = (0 until writers).map { w =>
      new Thread(() => {
        (0 until 2).foreach { round =>
          // keys w*10 .. w*10+39 overlap the next three writers' ranges
          val rows = (0 until 40).map(i =>
            (w * 10 + i, s"2024-0${round + 1}", (w * 1000 + round).toDouble))
          val df = rows.toDF("k", "month", "v")
          var tries = 0
          var done = false
          while (!done && tries < 5) {
            tries += 1
            try {
              JdbcSink.upsert(df, url, "t_race", Seq("k"))
              done = true
            } catch {
              case _: java.sql.SQLException if tries < 5 =>
                Thread.sleep(50L * tries)
              case e: Exception if tries < 5 &&
                  Iterator.iterate(e: Throwable)(_.getCause)
                    .takeWhile(_ != null)
                    .exists(_.isInstanceOf[java.sql.SQLException]) =>
                Thread.sleep(50L * tries)
            }
          }
          if (done) landedRounds.put((w, round), true)
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(!landedRounds.isEmpty, "no writer ever landed")
    val back = JdbcSink.read(spark, url, "t_race")
      .as[(Int, String, Double)].collect().toSeq
    // no duplicate keys survive the races
    val dupKeys = back.groupBy(_._1).filter(_._2.size > 1).keys.toSeq
    assert(dupKeys.isEmpty, s"duplicate keys: $dupKeys")
    // every key of every LANDED (writer, round) is present...
    import scala.jdk.CollectionConverters._
    val landed = landedRounds.keySet.asScala.toSet
    val mustHave = landed.flatMap { case (w, _) => (0 until 40).map(w * 10 + _) }
    val have = back.map(_._1).toSet
    assert((mustHave -- have).isEmpty,
      s"lost keys: ${(mustHave -- have).toSeq.sorted.take(10)}")
    // ...and carries a value some covering writer actually wrote
    back.foreach { case (k, _, v) =>
      val coverers = (0 until writers).filter(w => k >= w * 10 && k < w * 10 + 40)
      val legal = coverers.flatMap(w => Seq(w * 1000.0, w * 1000.0 + 1))
      assert(legal.contains(v), s"key $k carries torn value $v")
    }
  }

  test("upsert quotes SQL-reserved-word columns in the MERGE") {
    // "order" / "year" are reserved in Derby (and most engines): Spark's
    // always-quoted CREATE/INSERT stages them fine, so an unquoted MERGE
    // would fail only AFTER all the data movement. Reserved-word columns
    // can only exist QUOTED, so create the target quoted.
    exec("""CREATE TABLE t_reserved (k INT, "order" INT, "year" INT)""")
    JdbcSink.append(Seq((1, 10, 2024), (2, 20, 2024))
      .toDF("k", "order", "year"), url, "t_reserved")
    JdbcSink.upsert(Seq((2, 25, 2025), (3, 30, 2025))
      .toDF("k", "order", "year"), url, "t_reserved", Seq("k"))
    val back = JdbcSink.read(spark, url, "t_reserved")
      .as[(Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(back === Seq((1, 10, 2024), (2, 25, 2025), (3, 30, 2025)))
  }

  test("upsert with a composite key and all-key schema (insert-only merge)") {
    exec("CREATE TABLE t_ck (a INT, b VARCHAR(4))")
    JdbcSink.append(Seq((1, "x")).toDF("a", "b"), url, "t_ck")
    // every column is a key: matched rows are left alone, new pairs insert
    JdbcSink.upsert(Seq((1, "x"), (1, "y")).toDF("a", "b"),
      url, "t_ck", Seq("a", "b"))
    val back = JdbcSink.read(spark, url, "t_ck")
      .as[(Int, String)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(back === Seq((1, "x"), (1, "y")))
  }

  test("refreshScope: a frame derived from the TARGET evaluates against the intact scope") {
    table("t_rmw")
    JdbcSink.append(Seq((1, "2024-01", 1.0), (2, "2024-01", 2.0),
      (3, "2024-02", 3.0)).toDF("k", "month", "v"), url, "t_rmw")
    // read-modify-write: the replacement IS a transform of the target's
    // own scope. The naive delete-then-append evaluated this frame
    // AFTER the DELETE — it read zero rows and silently destroyed the
    // month; staging first must preserve it
    import org.apache.spark.sql.functions._
    val bumped = JdbcSink.read(spark, url, "t_rmw")
      .where(col("month") === "2024-01")
      .withColumn("v", col("v") * 10)
    JdbcSink.refreshScope(bumped, url, "t_rmw", "month = '2024-01'")
    val back = JdbcSink.read(spark, url, "t_rmw")
      .as[(Int, String, Double)].collect().sortBy(_._1).toSeq
    assert(back === Seq((1, "2024-01", 10.0), (2, "2024-01", 20.0),
      (3, "2024-02", 3.0)))
    // and replaying the same refresh is still idempotent
    JdbcSink.refreshScope(
      Seq((1, "2024-01", 10.0), (2, "2024-01", 20.0))
        .toDF("k", "month", "v"),
      url, "t_rmw", "month = '2024-01'")
    assert(JdbcSink.read(spark, url, "t_rmw").count() === 3)
  }

  test("upsert: a typo'd key column fails BEFORE any data is staged") {
    table("t_typo")
    val e = intercept[IllegalArgumentException] {
      JdbcSink.upsert(Seq((1, "2024-01", 1.0)).toDF("k", "month", "v"),
        url, "t_typo", Seq("key_id"))
    }
    assert(e.getMessage.contains("key_id"))
    // nothing staged, nothing merged
    assert(JdbcSink.read(spark, url, "t_typo").count() === 0)
  }

  test("upsert quotes engine-reserved aggregate/type names (min, varchar)") {
    // columns created QUOTED with reserved names — the hand-list must
    // cover the full Derby/Postgres union, not just the obvious words
    exec("""CREATE TABLE t_rsv (k INT, "min" DOUBLE, "varchar" VARCHAR(4))""")
    JdbcSink.append(Seq((1, 1.0, "a")).toDF("k", "min", "varchar"),
      url, "t_rsv")
    JdbcSink.upsert(Seq((1, 9.0, "b"), (2, 2.0, "c"))
      .toDF("k", "min", "varchar"), url, "t_rsv", Seq("k"))
    val back = JdbcSink.read(spark, url, "t_rsv")
      .as[(Int, Double, String)].collect().sortBy(_._1).toSeq
    assert(back === Seq((1, 9.0, "b"), (2, 2.0, "c")))
  }
}
