package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression conversions, needed
  * to build Columns from raw Catalyst expressions (e.g. StaticInvoke) under
  * the Spark-4 split Column API. Standard extension-library pattern; no
  * Spark internals are modified. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** FULL ColumnNode → Catalyst conversion. `expression` wraps complex
    * column nodes (when-chains, operators) in a lazy ColumnNodeExpression
    * that only a DataFrame's analyzer unwraps — an expression returned
    * from a SQL FUNCTION BUILDER never passes through that path, so
    * convert eagerly there. */
  def fullExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Where the catalog would place (or did place) a managed table's data —
    * database-qualified names and the session's current database included.
    * Used to clear stale files from a previous JVM whose managed table
    * never made it into this session's in-memory catalog. */
  def defaultTablePath(spark: SparkSession, table: String): java.net.URI = {
    val ss = spark.asInstanceOf[classic.SparkSession]
    val ident = ss.sessionState.sqlParser.parseTableIdentifier(table)
    ss.sessionState.catalog.defaultTablePath(ident)
  }

  /** Register a SQL function on an EXISTING session (the
    * `SparkSessionExtensions` path only applies at session build time;
    * tests and notebooks attach to live sessions). Idempotent: a name
    * already in the registry is left alone, so repeated `register` calls
    * (one per bench/verify query construction) don't emit a WARN
    * "replaced a previously registered function" per function per call. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(catalyst.FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
