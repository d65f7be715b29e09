package graft.auth

/** Named-secret lookup seam — the reference resolves warehouse tokens
  * through a secret manager at pipeline start (reference:
  * src/auth/get_credentials.py:9 `get_secrets(secret_name)` feeding the
  * MotherDuck/Postgres connections). The engine-side contract is just
  * "name -> field map": concrete backends stay pluggable and
  * public-knowledge-only (environment, properties files, in-memory for
  * tests — a cloud secret manager is one more implementation of this
  * trait living outside this library).
  *
  * Fields flow into [[graft.sinks.JdbcSink]] as JDBC connection
  * properties (`user`, `password`, ...), so credentials never appear in
  * the connection URL (which gets logged by drivers and Spark plans).
  */
trait CredentialProvider {
  /** The named secret's fields; throws NoSuchElementException with the
    * name if absent — a missing credential should fail the pipeline
    * loudly at setup, not as a mid-write auth error. */
  def credentials(name: String): Map[String, String]
}

object CredentialProvider {

  /** Environment-variable provider: fields of secret `db` are read from
    * `GRAFT_SECRET_DB__USER`, `GRAFT_SECRET_DB__PASSWORD`, ... — the
    * DOUBLE underscore separates secret name from field, so secret names
    * containing underscores cannot collide (`db` vs `db_ro`: a single-
    * underscore prefix match would merge db_ro's PASSWORD into db's map
    * as field `ro_password`, leaking one credential into the other
    * connection's properties). Single-underscore variables are still
    * accepted for back-compat, but ONLY when no `__` variable exists for
    * the secret AND the field part is a single token: a legacy key whose
    * remainder contains `_` (GRAFT_SECRET_DB_RO_PASSWORD seen from `db`)
    * is claimable by a longer secret name (`db_ro`) that this provider
    * cannot rule out, so it is dropped rather than surfaced as a
    * multi-token field — multi-token fields require the `__` form. */
  class EnvProvider(env: Map[String, String] = sys.env) extends CredentialProvider {
    def credentials(name: String): Map[String, String] = {
      val strict = s"GRAFT_SECRET_${name.toUpperCase}__"
      val legacy = s"GRAFT_SECRET_${name.toUpperCase}_"
      val strictFound = env.collect {
        case (k, v) if k.startsWith(strict) =>
          k.stripPrefix(strict).toLowerCase -> v
      }
      if (strictFound.nonEmpty) return strictFound
      val (unambiguous, ambiguous) = env.toSeq.collect {
        // legacy single-underscore form: exclude any var that belongs to
        // a longer double-underscore-named secret (GRAFT_SECRET_DB_RO__X
        // must never surface as db's field ro__x)
        case (k, v) if k.startsWith(legacy) && !k.contains("__") =>
          k.stripPrefix(legacy).toLowerCase -> v
      }.partition { case (f, _) => !f.contains("_") }
      if (unambiguous.isEmpty)
        throw new NoSuchElementException(
          s"no $strict* (or legacy $legacy*) variables for secret '$name'" +
            (if (ambiguous.nonEmpty)
              s"; dropped ambiguous legacy key(s) ${
                ambiguous.map(legacy + _._1.toUpperCase).sorted.mkString(", ")
              } — use the double-underscore form" else ""))
      unambiguous.toMap
    }
  }

  /** Properties-file provider: secret `db` is `<dir>/db.properties`
    * (mounted secret volumes, local dev). */
  class FileProvider(dir: String) extends CredentialProvider {
    def credentials(name: String): Map[String, String] = {
      val p = java.nio.file.Paths.get(dir, s"$name.properties")
      if (!java.nio.file.Files.exists(p))
        throw new NoSuchElementException(s"no secret file $p")
      val props = new java.util.Properties()
      val in = java.nio.file.Files.newInputStream(p)
      try props.load(in) finally in.close()
      import scala.jdk.CollectionConverters._
      props.asScala.toMap
    }
  }

  /** Fixed map, for tests and wiring defaults. */
  class StaticProvider(secrets: Map[String, Map[String, String]])
      extends CredentialProvider {
    def credentials(name: String): Map[String, String] =
      secrets.getOrElse(name,
        throw new NoSuchElementException(s"no static secret '$name'"))
  }
}
