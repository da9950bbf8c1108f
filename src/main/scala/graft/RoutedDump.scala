package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Dev-only twin of [[Verify]] for the routing plane's COLLAPSED branches:
  * every routed front door (operators.Routing) re-dumped with its threshold
  * forced to 0, paired with the same-threshold oracle SQL, so
  * `scripts/check.py` can hash-compare the collapsed DuckDB twins that the
  * shipped low-mass corpora never reach through the registered oracles
  * (their gates correctly pick the raw branch at every sf the driver
  * verifies). Run per routed-door change:
  *
  *   sbt -batch "runMain graft.RoutedDump /root/testdata/sf0.01 /tmp/routed"
  *   python3 scripts/check.py /root/testdata/sf0.01 /tmp/routed
  */
object RoutedDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    import operators.Routing
    def t = T(spark, sfDir)
    val doors: Seq[(String, () => DataFrame, String)] = Seq(
      ("d30_routed_neardup", () => Routing.d30RoutedNearDup(t, 0), Routing.d30Oracle(0)),
      ("g15_routed_rank", () => Routing.g15RoutedRank(t, 0), Routing.g15Oracle(0)),
      ("s23_routed_clusters", () => Routing.s23RoutedClusters(t, 0), Routing.s23Oracle(0)),
      ("d31_routed_bbit", () => Routing.d31RoutedBbit(t, 0), Routing.d31Oracle(0)),
      ("s24_routed_ann", () => Routing.s24RoutedAnn(t, 0), Routing.s24Oracle(0)),
      ("d32_routed_cc", () => Routing.d32RoutedCc(t, 0), Routing.d32Oracle(0)),
      ("d33_routed_topk", () => Routing.d33RoutedTopk(t, 0), Routing.d33Oracle(0)),
      ("s26_routed_ivf", () => Routing.s26RoutedIvf(t, 0), Routing.s26Oracle(0)),
    )
    doors.foreach { case (name, fn, _) =>
      try fn().coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = doors.map { case (k, _, sql) => s"${q(k)}: ${q(sql)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
