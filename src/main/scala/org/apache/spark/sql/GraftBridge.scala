package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the sql-private Column <-> Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 moved Column to
  * a ColumnNode facade; libraries adding custom Catalyst expressions need
  * this pair to expose them as user-facing Columns. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Serializable Hadoop-conf carrier for closures that open the
    * FileSystem API on executors (spark-private class re-exposed). */
  def serializableConf(conf: org.apache.hadoop.conf.Configuration)
      : org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(conf)
}
