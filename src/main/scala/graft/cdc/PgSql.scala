package graft.cdc

/** The one place Postgres SQL quoting lives. Identifier and literal
  * escaping is a security posture, not a convenience: when four copies
  * drift, an escaping fix lands in three of them and the fourth is the
  * injection vector. Every module that builds SQL or replication-command
  * text (slot lifecycle, native COPY snapshot, replication bootstrap)
  * routes through these two functions. */
object PgSql {

  /** Double-quoted identifier with embedded quotes doubled. */
  def quoteIdent(id: String): String =
    "\"" + id.replace("\"", "\"\"") + "\""

  /** Single-quoted string literal with embedded quotes doubled. */
  def quoteLit(s: String): String =
    "'" + s.replace("'", "''") + "'"
}
