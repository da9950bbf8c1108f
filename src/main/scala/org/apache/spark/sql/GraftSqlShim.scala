package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge (the standard Spark-extension-library
  * pattern) so graft's sharing layer can wrap an existing analyzed plan
  * fragment — e.g. the exact scan LogicalRelation a job used — in a Dataset.
  *
  * Needed because relation identity is sensitive to the path *string* the
  * user passed (`/x` vs `file:/x` produce non-equal HadoopFsRelations), so
  * re-reading by path cannot reliably hit Catalyst's CacheManager
  * substitution; wrapping the original plan node always does.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
