package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class XmlPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val naptanish =
    """<StopPoints>
      |  <StopPoint><AtcoCode>490000001</AtcoCode><Descriptor><CommonName>High St</CommonName></Descriptor>
      |    <Place><Location><Easting>530000</Easting><Northing>180000</Northing></Location></Place></StopPoint>
      |  <StopPoint><AtcoCode>490000002</AtcoCode><Descriptor><CommonName>Market Sq</CommonName></Descriptor>
      |    <Place><Location><Easting>531000</Easting><Northing>181000</Northing></Location></Place></StopPoint>
      |</StopPoints>""".stripMargin

  test("XML file read with rowTag parses NaPTAN-like stop points") {
    val dir = java.nio.file.Files.createTempDirectory("xmlsrc")
    java.nio.file.Files.writeString(dir.resolve("stops.xml"), naptanish)
    val df = XmlSource.read(spark, dir.toString, "StopPoint")
    assert(df.count() === 2)
    val flat = JsonFlatten.flatten(df)
    assert(flat.columns.contains("Place_Location_Easting"))
    assert(flat.where(col("AtcoCode") === 490000001L).select("Descriptor_CommonName")
      .as[String].head() === "High St")
  }

  test("from_xml column parse + flatten") {
    val schema = StructType(Seq(
      StructField("AtcoCode", StringType),
      StructField("Descriptor", StructType(Seq(StructField("CommonName", StringType))))))
    val df = Seq(
      "<StopPoint><AtcoCode>x1</AtcoCode><Descriptor><CommonName>A</CommonName></Descriptor></StopPoint>"
    ).toDF("xml")
    val out = XmlSource.parseColumn(df, "xml", schema)
    assert(out.columns.toSet === Set("__parsed_AtcoCode", "__parsed_Descriptor_CommonName"))
    assert(out.select("__parsed_Descriptor_CommonName").as[String].head() === "A")
  }

  test("Pipeline retries flaky stages and records metadata") {
    var calls = 0
    val (out, recs) = Pipeline.run("naptan", Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      Seq(
        Pipeline.Stage("clean", df => ColumnNormalizer.snakeCase(df)),
        Pipeline.Stage("flaky", df => {
          calls += 1
          if (calls < 2) throw new RuntimeException("transient")
          df.withColumn("ok", lit(true))
        }, maxRetries = 3, baseDelayMs = 1)))
    assert(out.columns.contains("ok"))
    // the failed attempt is LOGGED (status=failure) before the retry —
    // monitoring must be able to tell "failed then recovered" from
    // "succeeded first try"
    assert(recs.map(r => (r.stage, r.status)) ===
      Seq(("clean", "success"), ("flaky", "failure"), ("flaky", "success")))
    assert(calls === 2)
  }
}
