package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("stripPrefix removes object_data. like street_manager rename_columns") {
    val df = Seq((1, 2)).toDF("object_data.usrn", "plain")
    val out = ColumnNormalizer.stripPrefix(df, "object_data.")
    assert(out.columns.toSeq === Seq("usrn", "plain"))
  }

  test("snakeCase normalizes messy CSV headers") {
    val df = Seq((1, 2, 3)).toDF("Sex (2 categories) Code", " Postcode ", "already_ok")
    val out = ColumnNormalizer.snakeCase(df)
    assert(out.columns.toSeq === Seq("sex_2_categories_code", "postcode", "already_ok"))
  }

  test("SchemaValidator reports missing and unexpected columns") {
    val df = Seq((1, 2)).toDF("a", "b")
    val (missing, unexpected) = SchemaValidator.validate(df, Seq("a", "c"))
    assert(missing === Seq("c"))
    assert(unexpected === Seq("b"))
  }

  test("JsonFlatten flattens nested structs to flat columns") {
    val df = spark.read.json(Seq(
      """{"id": 1, "object_data": {"usrn": 123, "loc": {"x": 1.5, "y": 2.5}}}"""
    ).toDS())
    val out = JsonFlatten.flatten(df)
    assert(out.columns.toSet === Set("id", "object_data_usrn", "object_data_loc_x", "object_data_loc_y"))
    assert(out.select("object_data_loc_x").as[Double].head() === 1.5)
  }

  test("CsvBundle reads a directory of CSVs with caller schema and harmonizes drift") {
    val dir = java.nio.file.Files.createTempDirectory("csvb").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "a.csv").toPath, "id,v\n1,x\n2,y\n")
    java.nio.file.Files.writeString(new java.io.File(dir, "b.csv").toPath, "id,v\n3,z\n")
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val df = CsvBundle.read(spark, dir.getAbsolutePath, schema, header = true)
    assert(df.count() === 3)

    val drift = CsvBundle.unionHarmonized(Seq(
      Seq((1L, "x")).toDF("id", "v"),
      Seq((2L, 9L)).toDF("id", "extra")))
    assert(drift.columns.toSet === Set("id", "v", "extra"))
    assert(drift.where(col("extra").isNull).count() === 1)
  }
}
