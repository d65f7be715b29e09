package graft.sinks

import java.sql.DriverManager
import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.auth.CredentialProvider

/** JDBC warehouse sink — the reference loads its processed frames into
  * Postgres / MotherDuck with batched inserts and two refresh styles
  * (reference: src/databases/postgresql.py batch executemany;
  * src/data_processors/utils/data_processor_utils.py:60 delete-then-insert).
  *
  * Spark-first shape: `df.write.jdbc` writes PARTITIONS CONCURRENTLY — each
  * executor task opens one connection and streams its partition in JDBC
  * batches of `batchSize`. `numPartitions` caps the connection count (at
  * 1000 executors you bound it to what the warehouse tolerates, not the
  * cluster width). The only driver-side statement is the scoped DELETE in
  * [[refreshScope]] — a constant-size metadata operation, not data movement.
  *
  * Credentials arrive as connection PROPERTIES (`props`, typically from a
  * [[graft.auth.CredentialProvider]] — the reference's get_credentials
  * seam), never embedded in the URL: drivers and Spark both log URLs.
  */
object JdbcSink {

  /** Resolve a named secret into JDBC connection properties. */
  def credentialProps(provider: CredentialProvider, secretName: String): Map[String, String] =
    provider.credentials(secretName)

  private def withProps(w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row],
                        props: Map[String, String]) =
    props.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }

  /** Append rows in JDBC batches; `numPartitions` = max concurrent
    * connections (coalesce, not repartition: no shuffle just to write). */
  def append(df: DataFrame, url: String, table: String,
             batchSize: Int = 10000, numPartitions: Option[Int] = None,
             props: Map[String, String] = Map.empty): Unit =
    withProps(
      (numPartitions match {
        case Some(n) if n < df.rdd.getNumPartitions => df.coalesce(n)
        case _ => df
      }).write
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchSize.toString), props)
      .mode(SaveMode.Append)
      .save()

  /** Full refresh. With `truncate=true` Spark TRUNCATEs instead of
    * DROP+CREATE when the dialect supports it — preserving grants/indexes,
    * the reference's truncate-then-insert path. */
  def overwrite(df: DataFrame, url: String, table: String,
                batchSize: Int = 10000, truncate: Boolean = true,
                props: Map[String, String] = Map.empty): Unit =
    withProps(
      df.write
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchSize.toString)
        .option("truncate", truncate.toString), props)
      .mode(SaveMode.Overwrite)
      .save()

  /** Idempotent scoped refresh: DELETE the rows matching `scopePredicate`
    * (e.g. `month = '2024-01'`) then append the replacement — the
    * reference's delete-then-insert month refresh, and the JDBC analogue of
    * ParquetSink's dynamic partition overwrite. The DELETE runs once on the
    * driver; re-running the load for the same scope never duplicates. */
  def refreshScope(df: DataFrame, url: String, table: String,
                   scopePredicate: String, batchSize: Int = 10000,
                   numPartitions: Option[Int] = None,
                   props: Map[String, String] = Map.empty): Unit = {
    val jprops = new java.util.Properties()
    props.foreach { case (k, v) => jprops.setProperty(k, v) }
    val conn = DriverManager.getConnection(url, jprops)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(s"DELETE FROM $table WHERE $scopePredicate")
      finally st.close()
    } finally conn.close()
    append(df, url, table, batchSize, numPartitions, props)
  }

  /** Key-based UPSERT via stage-then-MERGE — the incremental-refresh leg
    * between [[append]] (blind insert) and [[refreshScope]]
    * (delete-then-insert): matched keys update in place, new keys
    * insert, absent keys are untouched.
    *
    * Scale shape: the DATA moves distributed (executors stream the frame
    * into a staging table cloned from the target with
    * `CREATE TABLE … AS SELECT … WITH NO DATA` — identical column types
    * and identifier case, so the set-based MERGE needs no quoting
    * gymnastics); the driver then runs ONE `MERGE INTO target USING
    * stage` statement — set-based inside the warehouse, no row ships
    * through the driver — and drops the stage. Works on any
    * SQL:2003-MERGE warehouse (Derby here, Postgres 15+ in production).
    *
    * Rows in `df` must be unique per key (standard MERGE contract —
    * duplicate source keys are a cardinality violation in the
    * warehouse); dedupe upstream with `distinctOnLatest`. */
  def upsert(df: DataFrame, url: String, table: String, keyCols: Seq[String],
             batchSize: Int = 10000, numPartitions: Option[Int] = None,
             props: Map[String, String] = Map.empty): Unit = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val cols = df.schema.fieldNames.toSeq
    val dataCols = cols.filterNot(c => keyCols.exists(_.equalsIgnoreCase(c)))
    val stage = s"${table}_stg${System.nanoTime() % 1000000}"
    // quote identifiers that NEED quoting (workbook-derived columns like
    // "Region Name" stage fine through Spark's quoted INSERT and would
    // then break an unquoted MERGE after all the data movement). Plain
    // identifiers stay UNQUOTED: the database folds them the same way it
    // folded the unquoted CREATE, whereas always-quoting would pin a
    // case that unquoted-created columns (e.g. Derby's upper-folding)
    // don't have. SQL RESERVED WORDS must quote too — a column named
    // "order" stages fine through Spark's always-quoted INSERT and then
    // breaks the driver-side MERGE after all the data movement (and a
    // reserved-word column can only ever have been CREATEd quoted, so
    // exact-case quoting matches its definition).
    // the union of the Derby and Postgres RESERVED word lists (a word
    // reserved in either engine cannot have been CREATEd unquoted there,
    // so quoting it can only match); words merely non-reserved-keyword in
    // both (e.g. "month") stay unquoted to match unquoted-created tables
    val reserved = Set("order", "user", "group", "table", "select", "from",
      "where", "having", "join", "on", "using", "primary", "key", "foreign",
      "references", "unique", "not", "null", "default", "index", "create",
      "insert", "update", "delete", "merge", "values", "set", "into", "as",
      "and", "or", "between", "like", "in", "exists", "case", "when",
      "then", "else", "end", "union", "all", "distinct", "limit", "offset",
      "desc", "asc", "column", "constraint", "grant", "to", "with", "by",
      "check", "current_date", "current_time", "current_timestamp",
      "year", "hour", "minute", "second", "current", "cross", "inner",
      "outer", "left", "right", "full", "is", "of", "for", "at", "any",
      "some", "both", "close", "cursor", "true", "false", "fetch",
      "except", "intersect", "add", "alter", "begin", "call", "cascade",
      "connect", "continue", "declare", "describe", "disconnect", "drop",
      "execute", "explain", "external", "function", "get", "immediate",
      "indicator", "isolation", "language", "local", "match", "numeric",
      "overlaps", "prepare", "procedure", "restrict", "revoke", "rollback",
      "rows", "schema", "substring", "transaction", "translate", "trim",
      "whenever", "window", "lateral", "localtime", "localtimestamp",
      "returning", "symmetric", "asymmetric", "variadic", "leading",
      "trailing", "placing", "do", "array", "analyse", "analyze",
      "initially", "deferrable", "current_user", "current_role",
      "session_user", "system_user", "cast", "collate", "only", "open")
    def q(ident: String): String =
      if (ident.matches("[A-Za-z_][A-Za-z0-9_]*") &&
          !reserved.contains(ident.toLowerCase)) ident
      else "\"" + ident.replace("\"", "\"\"") + "\""
    val jprops = new java.util.Properties()
    props.foreach { case (k, v) => jprops.setProperty(k, v) }
    def execute(sql: String): Unit = {
      val conn = DriverManager.getConnection(url, jprops)
      try {
        val st = conn.createStatement()
        try { st.executeUpdate(sql); () } finally st.close()
      } finally conn.close()
    }
    execute(s"CREATE TABLE $stage AS SELECT * FROM $table WITH NO DATA")
    try {
      append(df, url, stage, batchSize, numPartitions, props)
      val on = keyCols.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      val updates = dataCols.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
      val insertCols = cols.map(q).mkString(", ")
      val insertVals = cols.map(c => s"s.${q(c)}").mkString(", ")
      val matched =
        if (dataCols.isEmpty) "" else s"WHEN MATCHED THEN UPDATE SET $updates "
      execute(
        s"MERGE INTO $table t USING $stage s ON $on " + matched +
          s"WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)")
    } finally execute(s"DROP TABLE $stage")
  }

  def read(spark: org.apache.spark.sql.SparkSession, url: String, table: String,
           props: Map[String, String] = Map.empty): DataFrame =
    props.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", table)) {
      case (acc, (k, v)) => acc.option(k, v)
    }.load()
}
