package graft

import org.apache.spark.sql.SparkSession

/** Generic solo re-probe (r13): run ONE registered query N times in one
  * fresh JVM against any corpus directory and print per-rep seconds. This is
  * the repo's standing noise protocol (memory: 2-4× per-row VM swings —
  * believe a growth alarm only after a solo re-probe) promoted from ad-hoc
  * ScaleSmoke single-key runs to a first-class instrument: rep 1 is the
  * process-cold figure, reps 2+ are warm (JIT + page cache + memoized
  * models), so a bimodal row decomposes into cold-start vs steady-state at
  * the cost of one command.
  *
  *   scripts/run-main.sh graft.SoloProbe <sfDir> <query> [reps=3]
  */
object SoloProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val secs = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(s"[solo] $name rep$i ${fmt(sec)}s")
      sec
    }
    println(s"""{"metric":"solo_probe","query":"$name","dir":"$dir",""" +
      s""""secs":[${secs.map(fmt).mkString(",")}]}""")
    spark.stop()
  }
}
