package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression conversion
  * (Spark 4 moved Column onto ColumnNode; classic.ExpressionUtils does
  * the conversion but is sql-private). Standard extension-library shim —
  * the only Spark-internal surface this project touches.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a hand-built LogicalPlan as a DataFrame (classic Dataset.ofRows
    * is sql-private). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Re-wrap an eagerly-planned BATCH frame as a STREAMING frame — the
    * shape a v1 streaming `Source.getBatch` must return
    * (`MicroBatchExecution` asserts `isStreaming` on it). The physical
    * plan is fixed here on the driver (which is what pins the snapshot
    * the batch reads); the RDD itself stays lazy until the micro-batch
    * runs. `internalCreateDataFrame` is `private[sql]`, hence the
    * bridge. */
  def streamingFrame(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }
}
