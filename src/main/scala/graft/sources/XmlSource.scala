package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** XML ingestion — the reference parses NaPTAN stop-point XML
  * (reference: src/data_sources/naptan.py, data_processors/naptan.py)
  * imperatively; Spark 4 ships a native XML source + `from_xml`, so the
  * parse is a distributed scan and the nested result flattens through
  * [[JsonFlatten]] like any other struct tree.
  */
object XmlSource {

  /** Read an XML file/directory of row-tagged records. */
  def read(spark: SparkSession, path: String, rowTag: String,
           schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format("xml").option("rowTag", rowTag)
    schema.fold(r)(s => r.schema(s)).load(path)
  }

  /** Parse an XML string column with `from_xml` + flatten the struct. */
  def parseColumn(df: DataFrame, xmlCol: String, schema: StructType,
                  sep: String = "_"): DataFrame =
    JsonFlatten.flatten(
      df.withColumn("__parsed", from_xml(col(xmlCol), schema))
        .drop(xmlCol),
      sep)
}
