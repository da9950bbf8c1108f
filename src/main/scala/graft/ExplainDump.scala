package graft

/** Writes `explain("formatted")` for the named queries to
  * `<outDir>/<query>_<suffix>.txt` — the r14 before/after plan evidence
  * (one file per touched query, committed under plans/r14/).
  *
  *   scripts/run-main.sh graft.ExplainDump <sfDir> <outDir> <suffix> <q1,q2,...>
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args(3).split(",").toSeq
    java.nio.file.Files.createDirectories(outDir)
    val spark = Engine.session(master = Some("local[4]"), shufflePartitions = 4)
    spark.sparkContext.setLogLevel("WARN")
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        (df.queryExecution.explainString(mode).trim + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[explaindump] $name -> ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
