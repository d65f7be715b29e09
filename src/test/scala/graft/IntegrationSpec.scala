package graft

import java.io.FileOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources._
import graft.sinks._

/** The reference's whole pipeline shape, end to end, in one test:
  * fetch a zipped multi-file CSV drop → stage → distributed read →
  * normalize/validate → transform → idempotent partitioned sink →
  * month-pruned analytics read → JDBC warehouse load, with per-stage row
  * counts collected by observe() during the ONE terminal action.
  * This is the "a reference user could switch" claim, executed.
  */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("fetch -> stage -> normalize -> transform -> partitioned sink -> warehouse") {
    // --- a monthly open-data drop: zip of per-area CSVs with messy headers
    val fixture = Files.createTempDirectory("e2e-fix").toString
    val zipPath = Paths.get(fixture, "permits_2024-01.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zipPath.toFile))
    Seq(
      "north.csv" -> "Permit Ref,Work Category,Total Cost\nN1,major,100.5\nN2,minor,10.0\n",
      "south.csv" -> "Permit Ref,Work Category,Total Cost\nS1,major,200.0\n")
      .foreach { case (n, c) =>
        zos.putNextEntry(new ZipEntry(n)); zos.write(c.getBytes("UTF-8")); zos.closeEntry()
      }
    zos.close()

    // --- fetch + stage (the reference's download/unzip front door)
    val staging = Files.createTempDirectory("e2e-staging").toString
    val members = Fetch.fetchZip(s"file://$zipPath", staging)
    assert(members.size === 2)

    // --- distributed read + schema validation + normalization
    val schema = StructType(Seq(
      StructField("Permit Ref", StringType), StructField("Work Category", StringType),
      StructField("Total Cost", DoubleType)))
    val raw = CsvBundle.read(spark, Paths.get(members.head).getParent.toString,
      schema, header = true)
    val (missing, unexpected) = SchemaValidator.validate(raw,
      Seq("Permit Ref", "Work Category", "Total Cost"))
    assert(missing.isEmpty && unexpected.isEmpty)

    // --- transform stages metered by observe(): one terminal action total
    val warehouse = Files.createTempDirectory("e2e-wh").toString
    val stages = Seq(
      Pipeline.Stage("normalize", df =>
        ColumnNormalizer.snakeCase(df).withColumn("month", lit("2024-01"))),
      Pipeline.Stage("score", df => df.withColumn("impact_score",
        when(col("work_category") === "major", 10).otherwise(1))),
      Pipeline.Stage("non_trivial_only", df => df.where(col("total_cost") > 50.0)))
    val records = Pipeline.runObserved("permits_e2e", raw, stages,
      action = out => ParquetSink.writePartitioned(out, warehouse, Seq("month")))
    assert(records.map(r => r.stage -> r.n_rows)
      === Seq("normalize" -> 3L, "score" -> 3L, "non_trivial_only" -> 2L))

    // --- re-landing the same month is idempotent (dynamic overwrite)
    Pipeline.runObserved("permits_e2e", raw, stages,
      action = out => ParquetSink.writePartitioned(out, warehouse, Seq("month")))

    // --- month-pruned analytics read
    val monthly = MonthlyTables.readMonths(spark, warehouse, "2024-01", "2024-01")
    assert(monthly.count() === 2) // no duplicates from the re-land
    assert(monthly.agg(sum("impact_score")).as[Long].head() === 20L)

    // --- JDBC warehouse load (the reference's Postgres/MotherDuck step)
    val url = "jdbc:derby:memory:e2edb;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try st.executeUpdate(
        "CREATE TABLE permits (permit_ref VARCHAR(20), work_category VARCHAR(20), " +
        "total_cost DOUBLE, impact_score INT, month VARCHAR(7))")
      finally st.close()
    } finally c.close()
    JdbcSink.refreshScope(monthly, url, "permits", "month = '2024-01'")
    JdbcSink.refreshScope(monthly, url, "permits", "month = '2024-01'") // idempotent
    val back = JdbcSink.read(spark, url, "permits")
    assert(back.count() === 2)
    assert(back.agg(sum("impact_score")).as[Long].head() === 20L)
  }

  test("gpkg ingest -> WKB parse -> radius join -> snapshot publish -> incremental read") {
    import graft.operators.RangeJoin
    import graft.sinks.SnapshotTable
    // --- native container read of the OS-style GeoPackage fixture
    val gpkg = getClass.getResource("/graft/small.gpkg").getPath
    val features = graft.sources.GeoPackageSource
      .readFeatures(spark, gpkg, "built_up")
      .where($"geom_xy".isNotNull)
      .select($"fid", $"name",
        $"geom_xy"(0)("x").as("x"), $"geom_xy"(0)("y").as("y"))
    // --- geospatial enrichment: neighbors within radius 40 (grid equi-join)
    val pairs = RangeJoin.radiusJoin(
        features.select($"fid".as("a_id"), $"x".as("ax"), $"y".as("ay")),
        features.select($"fid".as("b_id"), $"x".as("bx"), $"y".as("by")),
        "ax", "ay", "bx", "by", 40.0)
      .where($"a_id" =!= $"b_id")
      .groupBy($"a_id").agg(count(lit(1)).as("n_neighbors"))
    val enriched = features.join(pairs, $"fid" === $"a_id", "left")
      .select($"fid", $"name", coalesce($"n_neighbors", lit(0L)).as("n_neighbors"))
    // --- atomic snapshot publish + a second incremental append
    val table = Files.createTempDirectory("snap-geo").toString + "/areas"
    val v1 = SnapshotTable.write(enriched, table)
    val v2 = SnapshotTable.write(
      Seq((99L, "NewTown", 0L)).toDF("fid", "name", "n_neighbors"),
      table, append = true)
    // the live snapshot has both loads; the incremental consumer that
    // processed v1 sees ONLY the new area
    assert(SnapshotTable.read(spark, table).count() === 5L)
    assert(SnapshotTable.readChanges(spark, table, sinceVersion = v1)
      .as[(Long, String, Long)].collect().toSeq == Seq((99L, "NewTown", 0L)))
    // spot-check the geometry-derived enrichment survived the round trip:
    // points (10,20) and (30.5,40.25) are within 40 of each other
    val m = SnapshotTable.read(spark, table, Some(v1))
      .as[(Long, String, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(m("Alnwick") >= 1L && m("Berwick") >= 1L)
    assert(v2 == v1 + 1)
  }

  test("curate -> mixture -> pack -> shard files: corpus to training layout") {
    import graft.operators.{Dedup, TrainMix}
    val corpus = Seq(
      (1L, "webA", "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "webA", "one two three four five six seven eight nine"),
      (3L, "webA", "red green blue cyan magenta yellow black white"),
      (4L, "webA", "north south east west up down left right"),
      (5L, "booksB", "lorem ipsum dolor sit amet consectetur"),
      (6L, "booksB", "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
      (7L, "booksB", "tiny")                                           // quality cut
    ).toDF("doc_id", "source", "text")
    // --- curation: quality gate + exact dedup (keep canonical min id)
    val gated = graft.streaming.EventStream
      .qualityScrubStream(corpus, "doc_id", "text", minTokens = 5,
        maxRepRatioPpm = 900000L)
      .select($"doc_id", $"scrubbed_text".as("text"), $"n_tokens")
      .join(corpus.select("doc_id", "source"), Seq("doc_id"))
    val canon = Dedup.exactDupGroups(gated, "doc_id", "text")
      .select($"canonical_id".as("doc_id"))
    val clean = gated.join(canon, Seq("doc_id"), "left_semi")
    assert(clean.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L)) // 6 deduped, 7 quality-cut
    // --- assembly: mixture (webA 33 tokens (8+9+8+8), booksB 6 ->
    // rates floor(1e6*sqrt(6)/sqrt(33)) = 426401 / 1e6)
    val mixed = TrainMix.temperatureSample(clean, "source", "n_tokens", $"doc_id")
    assert(mixed.where($"source" === "booksB").count() == 1) // rate 1e6
    // --- pack into 8-token sequences: invariants over whatever survived
    val packed = TrainMix.packSequences(mixed, Seq($"doc_id"), "n_tokens", 8L)
    val total = mixed.agg(sum("n_tokens")).as[Long].head()
    val nSeqs = packed.agg(max($"seq_id")).as[Long].head() + 1
    assert(nSeqs == (total - 1) / 8 + 1)
    // --- shard layout materialized; reading back matches the in-memory plan
    val dir = Files.createTempDirectory("graft-train").toString + "/shards"
    TrainMix.writeShards(mixed.select("doc_id", "source", "n_tokens"),
      $"doc_id", 2, dir)
    val back = spark.read.parquet(dir)
      .select("doc_id", "shard", "shard_pos")
      .as[(Long, Long, Long)].collect().toSet
    val mem = TrainMix.shardLayout(
        mixed.select("doc_id", "source", "n_tokens"), $"doc_id", 2)
      .select("doc_id", "shard", "shard_pos")
      .as[(Long, Long, Long)].collect().toSet
    assert(back == mem && back.map(_._1) == mixed.select("doc_id")
      .as[Long].collect().toSet)
  }
}
