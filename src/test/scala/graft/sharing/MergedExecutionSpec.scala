package graft.sharing

import graft.{SparkSpec, T}
import org.apache.spark.sql.functions._

class MergedExecutionSpec extends SparkSpec {

  import MergedExecution._

  private lazy val li = T(spark, sfDir).lineitem

  private val jobs = Seq(
    FilterAggJob("qty_returned", col("l_returnflag") === "R", sum, "l_quantity"),
    FilterAggJob("qty_cheap", col("l_extendedprice") < 2000, sum, "l_quantity"),
    FilterAggJob("qty_taxed", col("l_tax") > 0.05, sum, "l_quantity"))

  private def separate(j: FilterAggJob) =
    li.filter(j.filter).groupBy("l_linestatus")
      .agg(sum(col(j.valueCol)).as(j.name))

  test("metamorphic: merged meta-job results == separate per-job results") {
    val merged = runMerged(li, Seq("l_linestatus"), jobs, snap)
    jobs.foreach { j =>
      assert(merged(j.name) == snap(separate(j)), s"job ${j.name}")
    }
  }

  test("merged plan reads the scan once; separate plans read it N times") {
    val mergedScans = "FileScan".r
      .findAllIn(mergedPlan(li, Seq("l_linestatus"), jobs).queryExecution.executedPlan.toString)
      .size
    assert(mergedScans == 1)
    val separateScans = jobs.map(j =>
      "FileScan".r.findAllIn(separate(j).queryExecution.executedPlan.toString).size).sum
    assert(separateScans == jobs.size)
  }

  test("no tuple tagging: merged shuffle carries no label column") {
    val p = mergedPlan(li, Seq("l_linestatus"), jobs).queryExecution.sparkPlan.toString
    assert(!p.contains("__tag") && !p.contains("job_tag"), p)
  }

  test("groups a job never touched are absent from its split") {
    val none = FilterAggJob("impossible", col("l_quantity") < 0, sum, "l_quantity")
    val out = runMerged(li, Seq("l_linestatus"), Seq(none), snap)
    assert(out("impossible").isEmpty)
  }

  // per-job map-output ratios that make the DP split the window: 0.005 -> p=1,
  // 10.0 -> p=3. The cheap shallow member joins the deep leader (it pays only
  // 2*0.005*dp), while the anchored first group's delta=1 surcharge leaves
  // qty_returned isolated — both branches of the dispatch get exercised.
  private val mixedRatios = Map(
    "qty_returned" -> 0.005, "qty_cheap" -> 10.0, "qty_taxed" -> 0.005)

  test("cost-gated dispatch returns identical results whether it merges or not") {
    val expected = jobs.map(j => j.name -> snap(separate(j))).toMap
    // tiny equal ratios: the DP merges everything
    assert(runCostGated(li, Seq("l_linestatus"), jobs, _ => 0.01, snap) == expected)
    // mixed ratios: partial merge + isolated job — same answers
    assert(runCostGated(li, Seq("l_linestatus"), jobs, j => mixedRatios(j.name), snap)
      == expected)
  }

  test("cost gate actually consults the policy (merge vs isolate split)") {
    val groups = MRSharePolicy.plan(
      jobs.map(j => MRSharePolicy.jobOf(j.name, mixedRatios(j.name))))
    val (merged, singles) = groups.partition(_.size > 1)
    assert(merged.size == 1 &&
      merged.head.map(_.name).toSet == Set("qty_taxed", "qty_cheap"), groups)
    assert(singles.flatten.map(_.name) == Seq("qty_returned"), groups)
  }
}
