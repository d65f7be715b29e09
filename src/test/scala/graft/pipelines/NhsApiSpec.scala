package graft.pipelines

import graft.SparkSpec
import graft.sinks.SnapshotTable
import graft.sources.{Fetch, MonthlyTables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The NHS multi-month API-discovery front door, end to end against a
  * loopback CKAN-style listing (reference: nhs_english_prescriptions.py
  * `_fetch_api_resources`/`download_links`; nhs_prescriptions.py
  * last-6-months pipeline; nhs_prescriptions_custom_range.py date
  * range): resource discovery → month selection → per-month streamed
  * fetch → one `nhs_prescriptions_MM_YYYY` warehouse table per month,
  * each validated against its vintage-correct template. */
class NhsApiSpec extends SparkSpec {

  private def res(name: String, format: String, url: Option[String]) =
    Fetch.JsonResource(name, format, url)

  private val listing = Seq(
    res("EPD_SNOMED_202503", "CSV", Some("u3")),
    res("EPD_SNOMED_202505", "CSV", Some("u5")),
    res("EPD_SNOMED_202505", "ZIP", Some("decoy-zip")), // wrong format
    res("EPD_LEGACY_202505", "CSV", Some("decoy-name")), // wrong prefix
    res("EPD_SNOMED_2025AB", "CSV", Some("decoy-month")), // non-digit month
    res("EPD_SNOMED_202504", "CSV", Some("u4")),
    res("EPD_SNOMED_202506", "CSV", None)) // listed but not yet downloadable

  test("nhsSelectMonths: filter, newest-first sort, and all three selection modes") {
    // latest = newest month THAT HAS a url (202506 has none)
    assert(Catalog.nhsSelectMonths(listing, Catalog.NhsLatest) ===
      Seq("202505" -> "u5"))
    assert(Catalog.nhsSelectMonths(listing, Catalog.NhsLastN(2)) ===
      Seq("202505" -> "u5", "202504" -> "u4"))
    // n larger than available: everything, newest first (reference take-N)
    assert(Catalog.nhsSelectMonths(listing, Catalog.NhsLastN(99)) ===
      Seq("202505" -> "u5", "202504" -> "u4", "202503" -> "u3"))
    assert(Catalog.nhsSelectMonths(listing,
      Catalog.NhsRange("202503", "202504")) ===
      Seq("202504" -> "u4", "202503" -> "u3"))
    // empty selection aborts, like the reference's "No valid download URLs"
    val e = intercept[IllegalArgumentException] {
      Catalog.nhsSelectMonths(listing, Catalog.NhsRange("202601", "202602"))
    }
    assert(e.getMessage.contains("EPD_SNOMED"))
    // malformed selections are rejected at construction
    intercept[IllegalArgumentException](Catalog.NhsLastN(0))
    intercept[IllegalArgumentException](Catalog.NhsRange("202407", "202402"))
    intercept[IllegalArgumentException](Catalog.NhsRange("2024-02", "202407"))
  }

  test("nhsSelectMonths: a duplicated month dedups, revised upload wins") {
    // a revised upload (…_V2) passes the name filter and maps to the
    // SAME month: without dedup it would burn a last-N slot and land
    // nhs_prescriptions_05_2025 twice
    val withRevision = listing :+
      res("EPD_SNOMED_202505_V2", "CSV", Some("u5v2"))
    assert(Catalog.nhsSelectMonths(withRevision, Catalog.NhsLatest) ===
      Seq("202505" -> "u5v2")) // _V2 sorts above the original name-desc
    assert(Catalog.nhsSelectMonths(withRevision, Catalog.NhsLastN(2)) ===
      Seq("202505" -> "u5v2", "202504" -> "u4"))
    assert(Catalog.nhsSelectMonths(withRevision, Catalog.NhsLastN(99))
      .map(_._1) === Seq("202505", "202504", "202503"))
  }

  test("landNhsFromApi: data fetch follows an allow-listed redirect (CKAN -> object store)") {
    val wh = java.nio.file.Files.createTempDirectory("graft-nhs-wh").toString
    val csv = (currentHeader +: Seq(currentRow("202505", 1)))
      .mkString("\n").getBytes("UTF-8")
    // the resource URL 302s to a DIFFERENT host ('localhost' and
    // '127.0.0.1' are distinct hosts for the redirect policy): the
    // caller's allowHosts must reach the DATA fetch, not just the listing
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/files/real.csv",
      (x: com.sun.net.httpserver.HttpExchange) => {
        x.sendResponseHeaders(200, csv.length.toLong)
        x.getResponseBody.write(csv); x.close()
      })
    server.createContext("/redir", (x: com.sun.net.httpserver.HttpExchange) => {
      val p = x.getHttpContext.getServer.getAddress.getPort
      x.getResponseHeaders.add("Location", s"http://localhost:$p/files/real.csv")
      x.sendResponseHeaders(302, -1); x.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      serve(Map("/api" -> ckanListing(base,
          Seq("202505" -> "/redir")))) { apiBase =>
        val tables = Catalog.landNhsFromApi(spark, s"$apiBase/api",
          Catalog.NhsLatest, wh,
          allowHosts = Set("127.0.0.1", "localhost"))
        assert(SnapshotTable.read(spark,
          tables("nhs_prescriptions_05_2025")).count() === 1)
      }
    } finally server.stop(0)
  }

  test("property: nhsSelectMonths invariants on random listings") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val monthGen = for {
      y <- Gen.choose(2024, 2025); m <- Gen.choose(1, 12)
    } yield f"$y$m%02d"
    val resourceGen = for {
      m <- monthGen
      suffix <- Gen.oneOf("", "", "", "_V2", "_REV")
      format <- Gen.oneOf("CSV", "CSV", "CSV", "ZIP")
      prefix <- Gen.oneOf("EPD_SNOMED_", "EPD_SNOMED_", "OTHER_")
      url <- Gen.option(Gen.identifier.map("u-" + _))
    } yield Fetch.JsonResource(s"$prefix$m$suffix", format, url)
    val listingGen = Gen.listOfN(25, resourceGen)
    def eligible(rs: Seq[Fetch.JsonResource]): Map[String, Seq[Fetch.JsonResource]] =
      rs.filter(r => r.format == "CSV" && r.name.startsWith("EPD_SNOMED_") &&
          r.name.length >= 17 && r.url.isDefined &&
          r.name.substring(11, 17).forall(_.isDigit))
        .groupBy(_.name.substring(11, 17))
    val selGen: Gen[Catalog.NhsSelection] = Gen.oneOf(
      Gen.const(Catalog.NhsLatest),
      Gen.choose(1, 30).map(Catalog.NhsLastN(_)),
      for { a <- monthGen; b <- monthGen } yield
        if (a <= b) Catalog.NhsRange(a, b) else Catalog.NhsRange(b, a))
    val prop = Prop.forAll(listingGen, selGen) { (rs, sel) =>
      val elig = eligible(rs)
      val expectMonths = (sel match {
        case Catalog.NhsLatest => elig.keys.toSeq.sorted.reverse.take(1)
        case Catalog.NhsLastN(n) => elig.keys.toSeq.sorted.reverse.take(n)
        case Catalog.NhsRange(a, b) =>
          elig.keys.toSeq.filter(d => a <= d && d <= b).sorted.reverse
      }).toList
      if (expectMonths.isEmpty)
        Prop(scala.util.Try(Catalog.nhsSelectMonths(rs, sel)).isFailure)
      else {
        val got = Catalog.nhsSelectMonths(rs, sel)
        val monthsOk = got.map(_._1).toList == expectMonths
        // the chosen url is the max-name eligible resource of its month
        val urlOk = got.forall { case (d, u) =>
          val best = elig(d).map(_.name).max
          elig(d).filter(_.name == best).exists(_.url.contains(u))
        }
        Prop(monthsOk && urlOk)
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("nhsTemplateFor: schema-change cutoff picks the vintage template") {
    val legacy = Catalog.nhsTemplateFor("202502").map(_._1)
    val current = Catalog.nhsTemplateFor("202503").map(_._1)
    assert(legacy.contains("BNF_CODE") && legacy.contains("ADQUSAGE") &&
      !legacy.contains("BNF_PRESENTATION_CODE"))
    assert(current.contains("BNF_PRESENTATION_CODE") &&
      current.contains("ADQ_USAGE") && !current.contains("BNF_CODE"))
    assert(Catalog.nhsTableName("202505") === "nhs_prescriptions_05_2025")
  }

  private def serve(paths: Map[String, Array[Byte]])
      (body: String => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    paths.foreach { case (path, bytes) =>
      server.createContext(path, (x: com.sun.net.httpserver.HttpExchange) => {
        x.sendResponseHeaders(200, bytes.length.toLong)
        x.getResponseBody.write(bytes); x.close()
      })
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private val currentHeader =
    Catalog.nhsTemplateCurrent.map(_._1).mkString(",")
  private val legacyHeader =
    Catalog.nhsTemplateLegacy.map(_._1).mkString(",")

  private def currentRow(ym: String, items: Int): String =
    s"$ym,LONDON,Y56,NHS NWL ICB,QRV,BRENT PCN,U06674,PRACTICE,E85000," +
      s"1 HIGH ROAD,WEMBLEY,,,HA9 6DE,04070100,Paracetamol,040701000BBABA0," +
      s"Paracetamol 500mg tablets,04: CNS,28.0,$items,28.0,0.000,1.20,1.10,N,322236009"

  private def ckanListing(base: String,
                          months: Seq[(String, String)]): Array[Byte] = {
    val resources = months.map { case (m, path) =>
      s"""{"name":"EPD_SNOMED_$m","format":"CSV","url":"$base$path"}"""
    } ++ Seq(
      """{"name":"EPD_SNOMED_202505","format":"ZIP","url":"ignored"}""",
      """{"name":"OTHER_DATASET","format":"CSV","url":"ignored"}""")
    s"""{"success":true,"result":{"resources":[${resources.mkString(",")}]}}"""
      .getBytes("UTF-8")
  }

  test("landNhsFromApi: discovers, fetches, and lands one table per month; MonthlyTables reads back") {
    val wh = java.nio.file.Files.createTempDirectory("graft-nhs-wh").toString
    // the listing advertises 3 months; LastN(2) must land only the newest 2
    val csv5 = (currentHeader +: (1 to 3).map(currentRow("202505", _)))
      .mkString("\n").getBytes("UTF-8")
    val csv4 = (currentHeader +: (1 to 2).map(currentRow("202504", _)))
      .mkString("\n").getBytes("UTF-8")
    val csv3 = (currentHeader +: Seq(currentRow("202503", 1)))
      .mkString("\n").getBytes("UTF-8")
    serve(Map("/files/m5.csv" -> csv5, "/files/m4.csv" -> csv4,
        "/files/m3.csv" -> csv3)) { base =>
      // context for /api registered lazily: the listing body embeds `base`
      serve(Map("/api" -> ckanListing(base,
          Seq("202505" -> "/files/m5.csv", "202504" -> "/files/m4.csv",
              "202503" -> "/files/m3.csv")))) { apiBase =>
        val tables = Catalog.landNhsFromApi(spark, s"$apiBase/api",
          Catalog.NhsLastN(2), wh,
          allowHosts = Set("127.0.0.1"))
        assert(tables.keySet ===
          Set("nhs_prescriptions_05_2025", "nhs_prescriptions_04_2025"))
        val m5 = SnapshotTable.read(spark, tables("nhs_prescriptions_05_2025"))
        val m4 = SnapshotTable.read(spark, tables("nhs_prescriptions_04_2025"))
        assert(m5.count() === 3 && m4.count() === 2)
        val types = m5.schema.fields.map(f => f.name -> f.dataType).toMap
        assert(types("ITEMS") === LongType && types("QUANTITY") === DoubleType
          && types("SNOMED_CODE") === LongType)
        assert(m5.agg(sum("ITEMS")).head().getLong(0) === 6L)
        // the dbt get_tables-macro read-back over the landed months
        val all = MonthlyTables.unionTagged(Seq(
          "05_2025" -> m5, "04_2025" -> m4))
        assert(all.count() === 5)
        assert(all.groupBy("source_table").count().count() === 2)
        assert(all.where(col("source_table") === "05_2025")
          .agg(sum("ITEMS")).head().getLong(0) === 6L)
      }
    }
  }

  test("landNhsFromApi: a legacy-vintage month validates against the legacy template") {
    val wh = java.nio.file.Files.createTempDirectory("graft-nhs-wh").toString
    val legacyRow =
      "202501,LONDON,Y56,NHS NWL ICB,QRV,BRENT PCN,U06674,PRACTICE,E85000," +
        "1 HIGH ROAD,WEMBLEY,,,HA9 6DE,Paracetamol,Paracetamol - oral," +
        "0407010H0AAAMAM,Paracetamol 500mg tablets,04: CNS," +
        "28.0,4,28.0,0.000,1.20,1.10,N,322236009"
    val csv = s"$legacyHeader\n$legacyRow".getBytes("UTF-8")
    serve(Map("/files/m1.csv" -> csv)) { base =>
      serve(Map("/api" -> ckanListing(base,
          Seq("202501" -> "/files/m1.csv")))) { apiBase =>
        val tables = Catalog.landNhsFromApi(spark, s"$apiBase/api",
          Catalog.NhsRange("202501", "202501"), wh,
          allowHosts = Set("127.0.0.1"))
        assert(tables.keySet === Set("nhs_prescriptions_01_2025"))
        val df = SnapshotTable.read(spark, tables("nhs_prescriptions_01_2025"))
        assert(df.columns.contains("BNF_CODE") &&
          df.columns.contains("ADQUSAGE") &&
          !df.columns.contains("BNF_PRESENTATION_CODE"))
        assert(df.where(col("ITEMS") === 4).count() === 1)
      }
    }
  }

  test("landNhsFromApi: header drift in ONE month aborts that month's load") {
    val wh = java.nio.file.Files.createTempDirectory("graft-nhs-wh").toString
    val drifted = (s"$currentHeader,ROGUE_COLUMN" +:
      Seq(currentRow("202505", 1) + ",x")).mkString("\n").getBytes("UTF-8")
    serve(Map("/files/bad.csv" -> drifted)) { base =>
      serve(Map("/api" -> ckanListing(base,
          Seq("202505" -> "/files/bad.csv")))) { apiBase =>
        val e = intercept[Exception] {
          Catalog.landNhsFromApi(spark, s"$apiBase/api",
            Catalog.NhsLatest, wh, allowHosts = Set("127.0.0.1"))
        }
        // the drift abort surfaces through the pipeline retry wrapper
        val messages = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
        assert(messages.contains("ROGUE_COLUMN"))
      }
    }
  }

  test("discoverJsonResources: success=false and non-JSON bodies fail loudly") {
    serve(Map(
        "/bad" -> """{"success":false,"error":"nope"}""".getBytes("UTF-8"),
        "/html" -> "<html>not an api</html>".getBytes("UTF-8"),
        "/noresources" -> """{"success":true,"result":{}}""".getBytes("UTF-8"))) { base =>
      val e1 = intercept[java.io.IOException](
        Fetch.discoverJsonResources(s"$base/bad"))
      assert(e1.getMessage.contains("success=false"))
      val e2 = intercept[java.io.IOException](
        Fetch.discoverJsonResources(s"$base/html"))
      assert(e2.getMessage.contains("not JSON"))
      val e3 = intercept[java.io.IOException](
        Fetch.discoverJsonResources(s"$base/noresources"))
      assert(e3.getMessage.contains("resources"))
    }
  }
}
