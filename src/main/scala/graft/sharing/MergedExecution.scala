package graft.sharing

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** MRShare-style job merge ("simultaneous pipeline") re-expressed Spark-first.
  *
  * The reference merged N same-shape jobs over one scan by tagging every
  * tuple with its job label before the shuffle and widening the shuffle
  * machinery to per-label aggregators (fork operators MuxRDD / LabellingRDD /
  * DispatchRDD / multi-aggregator ShuffledRDD — SURVEY.md §2.3, thesis
  * §4.3.1). Its own evaluation found the merge *lost* to separate execution
  * on Spark: per-tuple tag objects blew up GC and inflated shuffled bytes
  * (reference: report.pdf ch.5, Table 5.1).
  *
  * The Spark-native formulation dissolves that overhead: N filter+aggregate
  * jobs over the same scan and grouping keys become ONE aggregation whose
  * per-job aggregates are conditional columns (`agg FILTER (WHERE job_i)`).
  * No tuple is tagged, nothing extra is shuffled — the "label" is which
  * column a tuple contributes to, resolved inside codegen. One scan, one
  * shuffle, N outputs.
  *
  * Restrictions (same as the reference's merge groups): all jobs share the
  * scan and the grouping keys; each job contributes a row filter and an
  * aggregate over a value column.
  */
object MergedExecution {

  /** One mergeable job: keep rows matching `filter`, aggregate with `agg`
    * (a column builder applied under the job's filter condition). */
  final case class FilterAggJob(name: String, filter: Column, agg: Column => Column,
                                valueCol: String)

  /** Build the merged meta-plan: one scan + one shuffle computing every
    * job's aggregate as a filtered column, plus a per-job contribution count
    * used to drop groups the job never touched. */
  def mergedPlan(scan: DataFrame, keyCols: Seq[String],
                 jobs: Seq[FilterAggJob]): DataFrame = {
    require(jobs.map(_.name).distinct.size == jobs.size, "job names must be unique")
    val aggCols = jobs.flatMap { j =>
      Seq(
        j.agg(when(j.filter, col(j.valueCol))).as(s"__agg_${j.name}"),
        count(when(j.filter, lit(1))).as(s"__n_${j.name}"))
    }
    scan.groupBy(keyCols.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
  }

  /** Split one job's result back out of the merged meta-result (the
    * DispatchRDD/PullRDD plane, as plain projections). */
  def split(merged: DataFrame, keyCols: Seq[String], job: FilterAggJob): DataFrame =
    merged
      .filter(col(s"__n_${job.name}") > 0)
      .select(keyCols.map(col) :+ col(s"__agg_${job.name}").as(job.name): _*)

  /** Execute a merge group: materialize the meta-result once (persist), run
    * every job's action against its slice, release. */
  def runMerged[A](scan: DataFrame, keyCols: Seq[String], jobs: Seq[FilterAggJob],
                   action: DataFrame => A): Map[String, A] = {
    val merged = mergedPlan(scan, keyCols, jobs).persist(StorageLevel.MEMORY_AND_DISK)
    try jobs.map(j => j.name -> action(split(merged, keyCols, j))).toMap
    finally merged.unpersist(blocking = false)
  }

  /** One job executed in isolation (no meta-plan) — same output shape as
    * [[split]] of a merged run. */
  def runIsolated(scan: DataFrame, keyCols: Seq[String], job: FilterAggJob): DataFrame =
    scan.filter(job.filter)
      .groupBy(keyCols.map(col): _*)
      .agg(job.agg(col(job.valueCol)).as(job.name))

  /** Cost-gated dispatch: [[MRSharePolicy]]'s DP decides which jobs merge
    * (by their map-output ratio `d` — output bytes / scan bytes, estimable
    * from stats as |groups| x row width / input size); groups it prices as a
    * win run through [[runMerged]], the rest run isolated. Results are
    * identical either way (the metamorphic property the spec asserts) — the
    * policy only moves the cost. */
  def runCostGated[A](scan: DataFrame, keyCols: Seq[String], jobs: Seq[FilterAggJob],
                      mapOutputRatio: FilterAggJob => Double,
                      action: DataFrame => A): Map[String, A] = {
    val byName = jobs.map(j => j.name -> j).toMap
    MRSharePolicy.plan(jobs.map(j => MRSharePolicy.jobOf(j.name, mapOutputRatio(j))))
      .flatMap { group =>
        val members = group.map(g => byName(g.name))
        if (members.size > 1) runMerged(scan, keyCols, members, action)
        else members.map(j => j.name -> action(runIsolated(scan, keyCols, j)))
      }.toMap
  }
}
