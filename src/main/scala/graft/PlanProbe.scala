package graft

/** Ad-hoc join/exchange skeleton dump for any registered query on any corpus
  * dir — the quick diagnostic behind scale-probe triage (e.g. the 60× d22
  * breach: this is how the SortMergeJoin-on-the-pair-stream vs
  * broadcast-verify divergence from d04 was spotted).
  *
  * Usage: `sbt "runMain graft.PlanProbe <dir> <query> [query...]"`.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Engine.session(master = Some("local[4]"), shufflePartitions = 8)
    spark.sparkContext.setLogLevel("WARN")
    for (n <- args.drop(1)) {
      val p = SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString
      println(s"===== $n")
      println(p.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Sort") || l.contains("Scan")).mkString("\n"))
    }
    spark.stop()
  }
}
