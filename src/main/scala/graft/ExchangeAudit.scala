package graft

/** Prints the Exchange (shuffle/broadcast) operator counts for the PlanDump
  * headline queries — the measurement behind PlanQualitySpec's shuffle-budget
  * regression gate. Usage: `sbt "runMain graft.ExchangeAudit [sfDir]"`.
  */
object ExchangeAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session(master = Some("local[4]"), shufflePartitions = 4)
    spark.sparkContext.setLogLevel("WARN")
    PlanDump.headline.foreach { name =>
      val p = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
      val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning")) +
        p.linesIterator.count(_.contains("Exchange rangepartitioning")) +
        p.linesIterator.count(_.contains("Exchange SinglePartition"))
      val bcasts = p.linesIterator.count(_.contains("BroadcastExchange"))
      println(s"[exchange] $name shuffles=$shuffles broadcasts=$bcasts")
    }
    spark.stop()
  }
}
