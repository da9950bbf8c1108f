package graft

import org.apache.spark.sql.SparkSession

/** One-off floor decomposition (r14 measurement): run a handful of queries
  * warm under AQE on vs off in the same JVM, printing per-mode warm seconds.
  * Answers "how much of the tail-row floor is adaptive stage sequencing vs
  * the operators themselves" before any trimming work is planned.
  *
  *   scripts/run-main.sh graft.AqeFloorProbe <sfDir> <q1,q2,...>
  */
object AqeFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q05_region_revenue", "q103_market_share", "d01_exact_dedup", "g01_pagerank")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      Seq("true", "false", "true", "false").zipWithIndex.foreach { case (aqe, i) =>
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        if (i >= 2) println(s"""{"q":"$name","aqe":$aqe,"warm_sec":${fmt(sec)}}""")
      }
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
