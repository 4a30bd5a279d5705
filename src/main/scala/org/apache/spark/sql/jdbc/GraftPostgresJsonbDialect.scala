package org.apache.spark.sql.jdbc

import org.apache.spark.sql.types.{StringType, StructField}

/** Spark 4 marks its concrete dialects (and the [[JdbcDialects]]
  * registry) package-private, so the graft JSONB dialect lives in this
  * package namespace — the same one-file bridge technique as
  * `org.apache.spark.sql.graftbridge.ColumnBridge`; no Spark internals
  * are modified. The implementation class stays `private[jdbc]` (a
  * public subclass of the package-private [[PostgresDialect]] would
  * "escape its defining scope"); callers hold it as the public
  * [[JdbcDialect]] supertype via [[GraftPostgresJsonbDialect.apply]].
  *
  * The subclass changes ONE thing: `insertIntoTable` casts the
  * parameters of designated JSON payload columns to JSONB explicitly —
  * Spark binds StringType parameters as VARCHAR, and Postgres will not
  * implicitly coerce a VARCHAR parameter into a jsonb column unless
  * the connection URL carries `stringtype=unspecified`, a
  * deployment-wide knob the cast makes unnecessary (reference
  * app/team_utilities.py:345-365 creates these columns as JSONB).
  * Every other behavior (type mappings, quoting, expression
  * compilation) is inherited from [[PostgresDialect]], so registering
  * this dialect ahead of the builtin degrades nothing. */
private[jdbc] class GraftPostgresJsonbDialectImpl(jsonbColumns: Set[String])
    extends PostgresDialect {
  override def insertIntoTable(table: String,
      fields: Array[StructField]): String = {
    val columns = fields.map(f => quoteIdentifier(f.name)).mkString(",")
    val placeholders = fields.map { f =>
      if (f.dataType == StringType && jsonbColumns(f.name.toLowerCase))
        "CAST(? AS JSONB)"
      else "?"
    }.mkString(",")
    s"INSERT INTO $table ($columns) VALUES ($placeholders)"
  }
}

object GraftPostgresJsonbDialect {
  /** A Postgres dialect that casts the named columns' INSERT
    * parameters to JSONB (lowercase names; the caller's DDL is the
    * source of truth for which columns are JSONB). */
  def apply(jsonbColumns: Set[String]): JdbcDialect =
    new GraftPostgresJsonbDialectImpl(jsonbColumns)

  /** Idempotently put a dialect instance at the head of Spark's
    * registry (registration order decides the match). */
  def register(d: JdbcDialect): Unit = {
    JdbcDialects.unregisterDialect(d)
    JdbcDialects.registerDialect(d)
  }

  /** The dialect Spark resolves for a URL — test hook. */
  def resolve(url: String): JdbcDialect = JdbcDialects.get(url)
}
