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
  * cluster width). Driver-side statements are constant-size metadata
  * operations (the scoped swap in [[refreshScope]], the MERGE in
  * [[upsert]]), never data movement.
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
    * connections (Spark's JDBC writer coalesces down to it — never a
    * shuffle just to write). */
  def append(df: DataFrame, url: String, table: String,
             batchSize: Int = 10000, numPartitions: Option[Int] = None,
             props: Map[String, String] = Map.empty): Unit =
    withProps(
      numPartitions.foldLeft(
        df.write
          .format("jdbc")
          .option("url", url)
          .option("dbtable", table)
          .option("batchsize", batchSize.toString)) {
        case (w, n) => w.option("numPartitions", n.toString)
      }, props)
      .mode(SaveMode.Append)
      .save()

  /** Full refresh. With `truncate=true` Spark TRUNCATEs instead of
    * DROP+CREATE when the dialect supports it — preserving grants/indexes,
    * the reference's truncate-then-insert path. `numPartitions` caps the
    * connection count like [[append]] — the full-table path is the one
    * that hits the warehouse hardest. */
  def overwrite(df: DataFrame, url: String, table: String,
                batchSize: Int = 10000, truncate: Boolean = true,
                numPartitions: Option[Int] = None,
                props: Map[String, String] = Map.empty): Unit =
    withProps(
      numPartitions.foldLeft(
        df.write
          .format("jdbc")
          .option("url", url)
          .option("dbtable", table)
          .option("batchsize", batchSize.toString)
          .option("truncate", truncate.toString)) {
        case (w, n) => w.option("numPartitions", n.toString)
      }, props)
      .mode(SaveMode.Overwrite)
      .save()

  private def jProps(props: Map[String, String]): java.util.Properties = {
    val jprops = new java.util.Properties()
    props.foreach { case (k, v) => jprops.setProperty(k, v) }
    jprops
  }

  /** Run statements on ONE driver-side connection. */
  private def onConnection[T](url: String, props: Map[String, String])
                             (f: java.sql.Connection => T): T = {
    val conn = DriverManager.getConnection(url, jProps(props))
    try f(conn) finally conn.close()
  }

  /** Run `body` in ONE transaction holding an exclusive lock on `table`.
    *
    * Why: MERGE's existence probe and its insert are NOT atomic against
    * a concurrent writer's probe under READ COMMITTED — two racing
    * upserts of one key both take the NOT MATCHED branch and the key
    * DUPLICATES (stress-spec-found, JdbcSinkSpec "concurrent writers");
    * two racing scope refreshes each miss the other's fresh rows in
    * their DELETE snapshot and the scope doubles. The lock serializes
    * writers on the target (readers are unaffected in Postgres's
    * EXCLUSIVE mode); `LOCK TABLE … IN EXCLUSIVE MODE` is the shared
    * Derby/Postgres spelling, consistent with the sink's documented
    * dialect contract. A lock-wait timeout surfaces LOUDLY — retry the
    * write. */
  private def withTableLock(url: String, props: Map[String, String],
                            table: String)(
                            body: java.sql.Connection => Unit): Unit =
    onConnection(url, props) { conn =>
      conn.setAutoCommit(false)
      try {
        execute(conn, s"LOCK TABLE $table IN EXCLUSIVE MODE")
        body(conn)
        conn.commit()
      } catch {
        case e: Throwable =>
          try conn.rollback() catch { case _: java.sql.SQLException => () }
          throw e
      }
    }

  private def execute(conn: java.sql.Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try { st.executeUpdate(sql); () } finally st.close()
  }

  private def executeOne(url: String, props: Map[String, String],
                         sql: String): Unit =
    onConnection(url, props)(execute(_, sql))

  /** A collision-safe staging-table name: UUID-derived, never negative,
    * never shared by two concurrent loads into the same target (a
    * nanoTime-modulo suffix cycles every millisecond AND may be negative
    * per the nanoTime spec — an invalid identifier). */
  private def stageName(table: String): String =
    s"${table}_stg_${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"

  /** Drop the stage, never masking an in-flight failure: a connection
    * that died mid-load would otherwise surface as "cannot drop stage"
    * instead of the real cause. A leaked stage is reported, not fatal. */
  private def dropStageQuietly(url: String, props: Map[String, String],
                               stage: String): Unit =
    try executeOne(url, props, s"DROP TABLE $stage")
    catch {
      case e: java.sql.SQLException =>
        System.err.println(
          s"jdbc-sink: stage table $stage was not dropped: ${e.getMessage}")
    }

  /** Idempotent scoped refresh: replace the rows matching
    * `scopePredicate` (e.g. `month = '2024-01'`) — the reference's
    * delete-then-insert month refresh, and the JDBC analogue of
    * ParquetSink's dynamic partition overwrite.
    *
    * Order of operations matters twice over, so this stages first:
    *
    *  1. `df` materializes into a staging table BEFORE anything is
    *     deleted — a frame derived from the TARGET itself (the
    *     read-modify-write refresh) must evaluate against the intact
    *     scope, not the already-deleted one (silent data loss);
    *  2. the DELETE and the INSERT..SELECT then run in ONE transaction
    *     on one connection, so a failure never leaves the scope
    *     deleted-but-unwritten (the naive delete-then-append's torn
    *     window) and a re-run of the same scope never duplicates.
    *
    * Dialect contract (same as [[upsert]]'s): the target must support
    * `CREATE TABLE … AS SELECT … WITH NO DATA`, plain `DROP TABLE`, and
    * multi-statement transactions — SQL:2003, satisfied by Derby and
    * Postgres. MySQL/Oracle/SQLite spell the empty-clone differently and
    * are NOT supported here; this is deliberate, not an oversight — a
    * delete-then-append fallback would reintroduce the torn window AND
    * the self-read wipe (a `df` derived from the target evaluating after
    * the DELETE) that staging exists to close. */
  def refreshScope(df: DataFrame, url: String, table: String,
                   scopePredicate: String, batchSize: Int = 10000,
                   numPartitions: Option[Int] = None,
                   props: Map[String, String] = Map.empty): Unit = {
    val stage = stageName(table)
    executeOne(url, props,
      s"CREATE TABLE $stage AS SELECT * FROM $table WITH NO DATA")
    try {
      append(df, url, stage, batchSize, numPartitions, props)
      // the lock makes two racing refreshes of one scope serialize to
      // last-writer-wins instead of doubling the scope (each racer's
      // DELETE snapshot misses the other's uncommitted insert)
      withTableLock(url, props, table) { conn =>
        execute(conn, s"DELETE FROM $table WHERE $scopePredicate")
        execute(conn, s"INSERT INTO $table SELECT * FROM $stage")
      }
    } finally dropStageQuietly(url, props, stage)
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
    // a typo'd key fails HERE, not in the warehouse MERGE after the
    // whole frame was staged
    val missing = keyCols.filterNot(k => cols.exists(_.equalsIgnoreCase(k)))
    require(missing.isEmpty,
      s"upsert key column(s) not in the frame: ${missing.mkString(", ")} " +
        s"(frame has: ${cols.mkString(", ")})")
    val dataCols = cols.filterNot(c => keyCols.exists(_.equalsIgnoreCase(c)))
    val stage = stageName(table)
    executeOne(url, props,
      s"CREATE TABLE $stage AS SELECT * FROM $table WITH NO DATA")
    try {
      append(df, url, stage, batchSize, numPartitions, props)
      val on = keyCols.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      val updates = dataCols.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
      val insertCols = cols.map(q).mkString(", ")
      val insertVals = cols.map(c => s"s.${q(c)}").mkString(", ")
      val matched =
        if (dataCols.isEmpty) "" else s"WHEN MATCHED THEN UPDATE SET $updates "
      // under the table lock: a concurrent MERGE's probe must not race
      // this one's insert, or both take NOT MATCHED and the key
      // duplicates (stress-spec-found)
      withTableLock(url, props, table) { conn =>
        execute(conn,
          s"MERGE INTO $table t USING $stage s ON $on " + matched +
            s"WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)")
      }
    } finally dropStageQuietly(url, props, stage)
  }

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
  // The set is the FULL union of the Derby reserved-word list
  // (docs/ref/rrefkeywords29722) and the Postgres reserved words
  // (pg_get_keywords() catcode 'R'/'T') — a word reserved in EITHER
  // engine cannot have been CREATEd unquoted there, so quoting it can
  // only match; words merely non-reserved keywords in both (e.g.
  // "month", "name", "data") stay unquoted to match unquoted-created
  // tables.
  private val reserved: Set[String] = Set(
    // Derby reserved words
    "add", "all", "allocate", "alter", "and", "any", "are", "as", "asc",
    "assertion", "at", "authorization", "avg", "begin", "between", "bigint",
    "bit", "boolean", "both", "by", "call", "cascade", "cascaded", "case",
    "cast", "char", "character", "check", "close", "coalesce", "collate",
    "collation", "column", "commit", "connect", "connection", "constraint",
    "constraints", "continue", "convert", "corresponding", "create",
    "current", "current_date", "current_time", "current_timestamp",
    "current_user", "cursor", "deallocate", "dec", "decimal", "declare",
    "default", "deferrable", "deferred", "delete", "desc", "describe",
    "diagnostics", "disconnect", "distinct", "double", "drop", "else",
    "end", "end-exec", "escape", "except", "exception", "exec", "execute",
    "exists", "explain", "external", "false", "fetch", "first", "float",
    "for", "foreign", "found", "from", "full", "function", "get",
    "getcurrentconnection", "global", "go", "goto", "grant", "group",
    "having", "hour", "identity", "immediate", "in", "indicator",
    "initially", "inner", "inout", "input", "insensitive", "insert", "int",
    "integer", "intersect", "into", "is", "isolation", "join", "key",
    "last", "left", "like", "lower", "ltrim", "match", "max", "min",
    "minute", "national", "natural", "nchar", "nvarchar", "next", "no",
    "none", "not", "null", "nullif", "numeric", "of", "on", "only", "open",
    "option", "or", "order", "outer", "output", "over", "overlaps", "pad",
    "partial", "prepare", "preserve", "primary", "prior", "privileges",
    "procedure", "public", "read", "real", "references", "relative",
    "restrict", "revoke", "right", "rollback", "rows", "rtrim", "schema",
    "scroll", "second", "select", "session_user", "set", "smallint",
    "some", "space", "sql", "sqlcode", "sqlerror", "sqlstate", "substr",
    "substring", "sum", "system_user", "table", "temporary",
    "timezone_hour", "timezone_minute", "to", "transaction", "translate",
    "translation", "true", "union", "unique", "unknown", "update", "upper",
    "user", "using", "values", "varchar", "varying", "view", "whenever",
    "where", "window", "with", "work", "write", "xml", "xmlexists",
    "xmlparse", "xmlquery", "xmlserialize", "year",
    // Postgres reserved words not already above
    "analyse", "analyze", "array", "asymmetric", "binary", "concurrently",
    "cross", "current_catalog", "current_role", "current_schema", "do",
    "freeze", "ilike", "isnull", "lateral", "leading", "limit",
    "localtime", "localtimestamp", "notnull", "offset", "placing",
    "returning", "similar", "symmetric", "tablesample", "then", "trailing",
    "variadic", "verbose", "when",
    // common engine extras that are reserved in one of the two
    "index", "merge", "using", "references")

  private def q(ident: String): String =
    if (ident.matches("[A-Za-z_][A-Za-z0-9_]*") &&
        !reserved.contains(ident.toLowerCase)) ident
    else "\"" + ident.replace("\"", "\"\"") + "\""

  def read(spark: org.apache.spark.sql.SparkSession, url: String, table: String,
           props: Map[String, String] = Map.empty): DataFrame =
    props.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", table)) {
      case (acc, (k, v)) => acc.option(k, v)
    }.load()
}
