package graft.sharing

import graft.{SparkSpec, T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AutoMergeSpec extends SparkSpec {

  private lazy val li = T(spark, sfDir).lineitem

  private def returned = li.filter(col("l_returnflag") === "R")
    .groupBy("l_linestatus").agg(sum("l_quantity").as("qty"))
  private def taxed = li.filter(col("l_tax") > 0.05)
    .groupBy("l_linestatus")
    .agg(sum("l_extendedprice").as("rev"), count(lit(1)).as("n"))
  private def unfiltered = li.groupBy("l_linestatus")
    .agg(max("l_discount").as("mx"))
  private def joinShaped = li.join(T(spark, sfDir).orders,
    col("l_orderkey") === col("o_orderkey")).groupBy("l_linestatus").count()

  test("shapeOf recognizes aggregate jobs and rejects joins") {
    assert(AutoMerge.shapeOf(returned.queryExecution.analyzed).isDefined)
    assert(AutoMerge.shapeOf(unfiltered.queryExecution.analyzed)
      .exists(_.cond.isEmpty))
    assert(AutoMerge.shapeOf(joinShaped.queryExecution.analyzed).isEmpty)
  }

  test("detect groups same-relation same-keys jobs, leaves the join out") {
    val built = Seq[(String, DataFrame)]("returned" -> returned,
      "taxed" -> taxed, "unfiltered" -> unfiltered, "join" -> joinShaped)
    val (groups, unmerged) = AutoMerge.detect(built)
    assert(groups.size == 1)
    assert(groups.head.map(_._1).toSet == Set("returned", "taxed", "unfiltered"))
    assert(unmerged == Seq("join"))
  }

  test("metamorphic: auto-merged window results == isolated results") {
    val defs = Map[String, () => DataFrame](
      "returned" -> (() => returned), "taxed" -> (() => taxed),
      "unfiltered" -> (() => unfiltered), "join" -> (() => joinShaped))
    val isolated = defs.map { case (n, f) => n -> snap(f()) }
    val ex = new WorkSharingExecutor(spark, autoMerge = true)
    try {
      val out = ex.runBatch(defs.toSeq.map { case (n, f) =>
        QueryJob[Seq[String]](n, _ => f(), snap)
      })
      isolated.foreach { case (n, rows) => assert(out(n) == rows, s"job $n") }
    } finally ex.shutdown()
  }

  test("the merged meta-plan scans the relation once for the whole group") {
    val built = Seq[(String, DataFrame)]("returned" -> returned,
      "taxed" -> taxed, "unfiltered" -> unfiltered)
    val (groups, _) = AutoMerge.detect(built)
    val merged = AutoMerge.mergedPlan(spark, groups.head)
    val scans = "FileScan".r
      .findAllIn(merged.queryExecution.executedPlan.toString).size
    assert(scans == 1, merged.queryExecution.executedPlan)
    // every member's aggregates and presence counter are columns of the plan
    val cols = merged.columns.toSet
    assert(cols.contains("__agg_returned_qty") && cols.contains("__agg_taxed_rev")
      && cols.contains("__agg_taxed_n") && cols.contains("__agg_unfiltered_mx")
      && cols.contains("__n_returned") && cols.contains("__n_taxed"), cols)
  }
}
