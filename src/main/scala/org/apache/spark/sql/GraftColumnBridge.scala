package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor (Connect
  * refactor); classic mode still supports it through the private[sql]
  * ExpressionUtils. This bridge re-exports exactly that pair of
  * conversions for graft's native expressions — the standard technique for
  * libraries that ship custom Catalyst expressions without a function
  * registry round-trip.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly release the storage behind a `localCheckpoint()`-ed
    * Dataset. `Dataset.unpersist` only clears CacheManager entries
    * created by `persist()`; a local checkpoint lives as RDD-level
    * MEMORY_AND_DISK blocks referenced from the plan's `LogicalRDD`,
    * which otherwise linger until the ContextCleaner GC-collects the
    * RDD — unacceptable for an iterative loop that checkpoints every
    * round. No-op for non-checkpointed Datasets.
    */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
