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
  * The cast is scoped BY (TABLE, COLUMN), not by column name alone
  * (ADVICE r7): the registry is JVM-global, so a name-based dialect
  * left registered would cast a same-named VARCHAR column of any
  * unrelated Postgres insert in the process. Every other behavior
  * (type mappings, quoting, expression compilation) is inherited from
  * [[PostgresDialect]]. */
private[jdbc] class GraftPostgresJsonbDialectImpl(
    tables: Map[String, Set[String]]) extends PostgresDialect {
  override def insertIntoTable(table: String,
      fields: Array[StructField]): String = {
    val jsonbCols = tables.getOrElse(table.toLowerCase, Set.empty)
    val columns = fields.map(f => quoteIdentifier(f.name)).mkString(",")
    val placeholders = fields.map { f =>
      if (f.dataType == StringType && jsonbCols(f.name.toLowerCase))
        "CAST(? AS JSONB)"
      else "?"
    }.mkString(",")
    s"INSERT INTO $table ($columns) VALUES ($placeholders)"
  }
}

object GraftPostgresJsonbDialect {
  /** A Postgres dialect that casts the named columns' INSERT
    * parameters to JSONB, scoped per table (lowercase table and
    * column names; the caller's DDL is the source of truth for which
    * columns are JSONB). */
  def apply(tables: Map[String, Set[String]]): JdbcDialect =
    new GraftPostgresJsonbDialectImpl(
      tables.map { case (t, cs) => t.toLowerCase -> cs.map(_.toLowerCase) })

  /** Idempotently put a dialect instance at the head of Spark's
    * registry (registration order decides the match). The registry is
    * JVM-global: pair every register with [[unregister]] once the
    * write completes so unrelated Postgres writes are untouched. */
  def register(d: JdbcDialect): Unit = {
    JdbcDialects.unregisterDialect(d)
    JdbcDialects.registerDialect(d)
  }

  /** Remove a previously registered instance. */
  def unregister(d: JdbcDialect): Unit = JdbcDialects.unregisterDialect(d)

  /** The dialect Spark resolves for a URL — test hook. */
  def resolve(url: String): JdbcDialect = JdbcDialects.get(url)
}
