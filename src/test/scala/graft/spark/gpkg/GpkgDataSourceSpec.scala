package graft.spark.gpkg

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class GpkgDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): String =
    getClass.getResource(s"/graft/$name").getPath

  test("format(graft-gpkg): schema + rows match the library reader") {
    val df = spark.read.format("graft-gpkg").load(fixture("small.gpkg"))
    // table defaults to the single gpkg_contents feature entry
    assert(df.schema.fieldNames.toSeq ==
      Seq("fid", "name", "area_ha", "pop", "observed", "note", "geom"))
    assert(df.schema("geom").dataType == BinaryType)
    val lib = graft.sources.GeoPackageSource
      .readTable(spark, fixture("small.gpkg"), "built_up")
    // binary column compared by digest (Array[Byte] == is reference equality)
    def rows(x: org.apache.spark.sql.DataFrame) =
      x.withColumn("geom", md5($"geom")).orderBy("fid")
        .collect().map(_.toSeq).toSeq
    assert(rows(df) == rows(lib))
  }

  test("explicit table option reads a non-default table") {
    val c = spark.read.format("graft-gpkg").option("table", "gpkg_contents")
      .load(fixture("small.gpkg"))
      .select("table_name", "srs_id").collect()
    assert(c.map(_.toSeq).toSeq == Seq(Seq("built_up", 27700L)))
  }

  test("column pruning reaches the record decode (readSchema shrinks)") {
    val df = spark.read.format("graft-gpkg").load(fixture("small.gpkg"))
      .select("fid", "pop")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get
    assert(scan.readSchema().fieldNames.toSeq == Seq("fid", "pop"))
    assert(df.orderBy("fid").collect().map(_.toSeq).toSeq ==
      Seq(Seq(1L, 8116L), Seq(2L, 12043L), Seq(3L, -7L), Seq(4L, 48069L),
        Seq(5L, 0L)))
  }

  test("deep tree splits into multiple input partitions, all rows exactly once") {
    val df = spark.read.format("graft-gpkg").option("table", "wide")
      .option("partitions", "4").load(fixture("deep.gpkg"))
    assert(df.rdd.getNumPartitions > 1)
    val agg = df.agg(count("*"), sum("v"), countDistinct("fid")).head()
    assert(agg.toSeq == Seq(3000L, 1498500L, 3000L))
  }

  test("plain SQLite file (no gpkg_contents): single user table is the default") {
    val df = spark.read.format("graft-gpkg").load(fixture("deep.gpkg"))
    assert(df.count() == 3000L)
  }

  test("user-supplied schema binds by NAME: reorder, subset, retype") {
    val df = spark.read.format("graft-gpkg")
      .schema("name STRING, fid STRING, pop LONG") // reordered, fid retyped
      .load(fixture("small.gpkg"))
    assert(df.orderBy("pop").limit(2).collect().map(_.toSeq).toSeq ==
      Seq(Seq("Corbridge", "3", -7L), Seq("Elsdon", "5", 0L)))
  }

  test("user-supplied schema with an unknown column fails clearly") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-gpkg").schema("nope LONG")
        .load(fixture("small.gpkg")).collect()
    }
    assert(e.getMessage.contains("'nope' does not exist"))
  }

  test("multi-file load: a folder of releases scans as one table") {
    // second release = a copy of the same-schema file
    val dir = java.nio.file.Files.createTempDirectory("gpkgs")
    val p1 = dir.resolve("jan.gpkg"); val p2 = dir.resolve("feb.gpkg")
    java.nio.file.Files.copy(java.nio.file.Paths.get(fixture("deep.gpkg")), p1)
    java.nio.file.Files.copy(java.nio.file.Paths.get(fixture("deep.gpkg")), p2)
    val df = spark.read.format("graft-gpkg").option("table", "wide")
      .load(p1.toString, p2.toString)
    assert(df.count() == 6000L)
    assert(df.agg(sum("v")).head().getLong(0) == 2L * 1498500L)
    // partitions come from BOTH files
    assert(df.rdd.getNumPartitions >= 2)
  }

  test("multi-file load with mismatched schemas fails clearly") {
    val e = intercept[Exception] {
      spark.read.format("graft-gpkg").option("table", "built_up")
        .load(fixture("small.gpkg"), fixture("deep.gpkg")).collect()
    }
    assert(e.getMessage.contains("graft"), e.getMessage)
  }

  test("geometry blobs compose with the native WKB decoder") {
    val pts = spark.read.format("graft-gpkg").load(fixture("small.gpkg"))
      .select($"fid", graft.functions.Geo.stGeomFromWkb($"geom").as("g"))
      .where($"g".isNotNull)
      .select($"fid", $"g"(0)("x")).orderBy("fid").collect()
    assert(pts.map(_.toSeq).toSeq ==
      Seq(Seq(1L, 10.0), Seq(2L, 30.5), Seq(3L, -5.0), Seq(4L, 55.0)))
  }

  test("multi-file fuzz: valid first release + 80 mutated second files — loud or clean, never an Error") {
    // the multi-file layout checks (planInputPartitions re-reads every
    // file's physical layout) parse UNTRUSTED later releases against a
    // trusted first one: every mutation of the second file must either
    // read cleanly or fail with a controlled exception — never a JVM
    // Error, unbounded allocation, or silent page-walk corruption
    val validBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture("small.gpkg")))
    val dir = java.nio.file.Files.createTempDirectory("gpkg-mfuzz")
    val p1 = dir.resolve("jan.gpkg")
    java.nio.file.Files.write(p1, validBytes)
    var i = 0
    graft.FuzzUtil.fuzz("gpkg-multifile", Seq(validBytes), 80, 7331L) {
      bytes =>
        i += 1
        val p2 = dir.resolve(s"feb-$i.gpkg")
        java.nio.file.Files.write(p2, bytes)
        try spark.read.format("graft-gpkg").option("table", "built_up")
          .load(p1.toString, p2.toString).collect()
        finally java.nio.file.Files.deleteIfExists(p2)
        ()
    }(accept = _ => true)
  }
}
