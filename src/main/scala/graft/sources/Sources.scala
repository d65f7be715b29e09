package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

/** Ingestion-layer utilities re-expressing the reference's source handling.
  *
  * The reference streams HTTP zips and normalises columns imperatively
  * (reference: src/data_processors/street_manager.py:15 rename_columns,
  * src/data_processors/nhs_english_prescriptions.py:72 validate_column_names,
  * src/data_sources/code_point.py multi-file CSV merge). Here those become
  * schema-level transforms on DataFrames: the read itself is Spark's
  * distributed CSV/JSON/parquet scan.
  */
object ColumnNormalizer {

  /** Strip a nesting prefix from flattened column names — the reference
    * strips "object_data." from Street Manager permits
    * (street_manager.py:15-28). */
  def stripPrefix(df: DataFrame, prefix: String): DataFrame =
    df.columns.foldLeft(df) { (d, c) =>
      if (c.startsWith(prefix)) d.withColumnRenamed(c, c.stripPrefix(prefix)) else d
    }

  /** snake_case + de-space column names (processors normalise CSV headers
    * like "Sex (2 categories) Code"). Collisions — "Works Category" and
    * "works-category" both cleaning to works_category — get _2/_3
    * suffixes: a blind rename would create DUPLICATE columns and every
    * later by-name reference would throw AMBIGUOUS_REFERENCE. */
  def snakeCase(df: DataFrame): DataFrame = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    df.columns.foldLeft(df) { (d, c) =>
      val clean0 = c.trim
        .replaceAll("[^A-Za-z0-9]+", "_")
        .replaceAll("_+", "_")
        .stripSuffix("_").stripPrefix("_")
        .toLowerCase
      val n = seen.getOrElse(clean0, 0) + 1
      seen(clean0) = n
      val clean = if (n == 1) clean0 else s"${clean0}_$n"
      if (clean != c) d.withColumnRenamed(c, clean) else d
    }
  }
}

object SchemaValidator {
  /** Expected-columns check before load (nhs_english_prescriptions.py:72).
    * Returns the missing / unexpected sets instead of throwing so callers
    * decide policy. */
  def validate(df: DataFrame, expected: Seq[String]): (Seq[String], Seq[String]) = {
    val have = df.columns.toSet
    val want = expected.toSet
    (expected.filterNot(have), df.columns.filterNot(want).toSeq)
  }
}

object JsonFlatten {
  /** Recursively flatten nested struct columns to `parent.child` ->
    * `parent_child` flat columns — the reference flattens Street Manager's
    * nested JSON dict the same way (street_manager.py:72 flatten_json).
    * Pure projection: no shuffle, stays columnar. */
  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    def cols(schema: StructType, path: Seq[String]): Seq[org.apache.spark.sql.Column] =
      schema.fields.toSeq.flatMap {
        case StructField(name, st: StructType, _, _) => cols(st, path :+ name)
        case StructField(name, _, _, _) =>
          val full = (path :+ name)
          Seq(col(full.map(p => s"`$p`").mkString(".")).as(full.mkString(sep)))
      }
    df.select(cols(df.schema, Nil): _*)
  }
}

object CsvBundle {
  /** Read a directory of same-schema CSV files as one DataFrame (code_point
    * merges 120 per-area CSVs; GTFS bundles are named CSV members). Spark
    * lists and splits files in parallel; schema comes from the caller to
    * avoid an inference pass over 100 TB. */
  def read(spark: SparkSession, dir: String, schema: StructType,
           header: Boolean): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .csv(dir)

  /** Harmonize then union frames whose column sets drifted between files
    * (missing columns become nulls) — the reference pads mismatched CSV
    * vintages the same way. */
  def unionHarmonized(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty)
    frames.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }
}
