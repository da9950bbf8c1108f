package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage/task census (r14 measurement pass, guide §1/§7):
  * runs each named query twice — rep 1 warms codegen/JIT/page cache, rep 2
  * is measured under a listener — and prints one line per query with the
  * Spark job count, stage count, task count and warm wall seconds. A row
  * whose wall is dominated by job-count × scheduling floor (tiny tasks,
  * many stages) reads directly off this census, which is what separates
  * "slow operator" from "slow orchestration" before any plan surgery.
  *
  *   scripts/run-main.sh graft.JobProbe <sfDir> [namePrefix[,prefix...]]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only: String => Boolean =
      if (args.length > 1) { val ps = args(1).split(","); n => ps.exists(n.startsWith) }
      else _ => true
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        stages += 1; tasks += sc.stageInfo.numTasks
      }
    }
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    SparkEntry.queries.toSeq.sortBy(_._1).filter(kv => only(kv._1)).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm rep
        Thread.sleep(200) // drain listener events from the warm rep
        spark.sparkContext.addSparkListener(listener)
        jobs = 0; stages = 0; tasks = 0
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let the measured rep's events drain before reading
        spark.sparkContext.removeSparkListener(listener)
        println(s"""{"q":"$name","jobs":$jobs,"stages":$stages,"tasks":$tasks,"warm_sec":${fmt(sec)}}""")
      } catch { case e: Throwable => System.err.println(s"[jobprobe] $name failed: $e") }
    }
    spark.stop()
  }
}
