package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access shim for the graft engine's custom logical plans.
  *
  * `Dataset.ofRows` — the only way to wrap a custom [[LogicalPlan]] node in
  * a public DataFrame — is `private[sql]`, so this one-object bridge lives
  * in the `org.apache.spark.sql` package, the standard pattern for Spark
  * extension libraries that ship their own plan nodes. Nothing else in the
  * codebase reaches into Spark internals this way.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Runtime strategy injection for sessions the harness builds without
    * `spark.sql.extensions` (the config-time path is GraftExtensions). */
  def addStrategy(spark: SparkSession, strategy: execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
