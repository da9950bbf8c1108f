package graft.sharing

import graft.{SparkSpec, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.concurrent.Await
import scala.concurrent.duration._

class WorkSharingSpec extends SparkSpec {

  private def jobs: Seq[QueryJob[Seq[String]]] = Seq(
    QueryJob("agg_by_flag",
      s => T(s, sfDir).lineitem.groupBy("l_returnflag").agg(sum("l_quantity").as("q")),
      snap),
    QueryJob("count_by_status",
      s => T(s, sfDir).lineitem.groupBy("l_linestatus").count(),
      snap),
    QueryJob("cheap_items",
      s => T(s, sfDir).lineitem.filter(col("l_extendedprice") < 1000)
        .select("l_orderkey", "l_linenumber"),
      snap),
    QueryJob("order_priorities",
      s => T(s, sfDir).orders.groupBy("o_orderpriority").count(),
      snap))

  test("detector groups jobs by shared scan relation") {
    val built = jobs.map(j => (j.name, j.build(spark)))
    val groups = ShareDetector.detect(spark, built)
    // lineitem shared by 3 jobs; orders has only 1 job -> not a group
    assert(groups.size == 1)
    assert(groups.head.jobNames.toSet == Set("agg_by_flag", "count_by_status", "cheap_items"))
    assert(groups.head.paths.exists(_.contains("lineitem")))
  }

  test("metamorphic: batch-with-sharing results == isolated results") {
    val isolated = jobs.map(j => j.name -> j.action(j.build(spark))).toMap
    val ex = new WorkSharingExecutor(spark)
    try {
      val batched = ex.runBatch(jobs)
      assert(batched.keySet == isolated.keySet)
      batched.foreach { case (name, rows) => assert(rows == isolated(name), s"job $name") }
      assert(ex.cachedFingerprints.size == 1)
    } finally ex.shutdown()
  }

  test("shared scan is substituted with InMemoryRelation in sibling plans") {
    val ex = new WorkSharingExecutor(spark)
    try {
      ex.runBatch(jobs)
      val probe = T(spark, sfDir).lineitem.groupBy("l_returnflag").count()
      assert(probe.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
      val orders = T(spark, sfDir).orders.groupBy("o_orderstatus").count()
      assert(!orders.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
    } finally ex.shutdown()
  }

  test("zero budget -> no caching, results still correct") {
    val isolated = jobs.map(j => j.name -> j.action(j.build(spark))).toMap
    val ex = new WorkSharingExecutor(spark, budgetBytes = 0L)
    try {
      val batched = ex.runBatch(jobs)
      batched.foreach { case (name, rows) => assert(rows == isolated(name), s"job $name") }
      assert(ex.cachedFingerprints.isEmpty)
    } finally ex.shutdown()
  }

  test("batch window: size-or-timeout trigger completes all submissions") {
    val ex = new WorkSharingExecutor(spark)
    val win = new BatchWindow[Seq[String]](ex, windowSize = 2, maxWaitMs = 200)
    try {
      val isolated = jobs.map(j => j.name -> j.action(j.build(spark))).toMap
      val futures = jobs.map(j => j.name -> win.submit(j))
      futures.foreach { case (name, f) =>
        assert(Await.result(f, 5.minutes) == isolated(name), s"job $name")
      }
    } finally { win.close(); ex.shutdown() }
  }
}
