package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions (Spark 4 moved
  * the public `new Column(expr)` constructor behind
  * `classic.ExpressionUtils`). Needed to expose custom Catalyst
  * expressions as user-facing Columns.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** An isolated twin of `spark`: shared SparkContext/shared state, its
    * own SQLConf COPY (unlike `newSession()`, which resets runtime-set
    * conf). Iterative operators that must scope conf overrides (shuffle
    * width, AQE) run their loops on the clone so concurrent queries on
    * the caller's session can never observe the mutation.
    */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Rebind a DataFrame's (analyzed) plan to another session sharing the
    * same SparkContext — the companion of [[cloneSession]]: checkpointed
    * frames (LogicalRDD leaves) move between sessions for free, so a
    * loop can run clone-side and hand its checkpointed result back.
    */
  def rebind(df: Dataset[Row], spark: SparkSession): Dataset[Row] =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession],
      df.queryExecution.analyzed)
}
