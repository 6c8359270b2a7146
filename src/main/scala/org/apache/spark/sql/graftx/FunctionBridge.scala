package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.SparkSession

/** FunctionRegistry access for an ALREADY-BUILT session.
  *
  * The public path for SQL-callable custom expressions is
  * `SparkSessionExtensions.injectFunction` at session-build time
  * (`graft.functions.GraftExtensions`); a library must also serve callers
  * whose session it does not construct (the driver harness hands graft a
  * ready session). `sessionState` is `private[sql]`, so the post-hoc
  * registration lives here in the `org.apache.spark.sql` subpackage,
  * alongside [[ColumnBridge]] — the same pattern Spark-native libraries
  * (Sedona's `registerAll`, Delta) use for late registration.
  */
object FunctionBridge {
  def register(spark: org.apache.spark.sql.SparkSession,
               fn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)): Unit =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
      .registerFunction(fn._1, fn._2, fn._3)
}
