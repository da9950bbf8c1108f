package graft

import org.apache.spark.sql.SparkSession

/** One-call entry point for library users: a SparkSession with graft's
  * functions injected and the scale-posture defaults set, plus corpus
  * registration. A user of the reference system switches by building their
  * session here and pointing clients at [[graft.server.QueryGateway]] or
  * [[graft.server.ThriftFrontend]].
  *
  * Defaults are written for a real cluster (drop `master`): AQE re-plans at
  * runtime (skew-join splitting, partition coalescing), shuffle partitions
  * sized by the caller (cores on local mode, 2-3x total cores on a cluster),
  * UTC session time.
  */
object Engine {

  def session(appName: String = "graft",
              master: Option[String] = None,
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      // priority-class pool weights (urgent 8 : default 2 : bulk 1) for the
      // pre-scheduler's job classes — Spark reads weights only from a file
      .config("spark.scheduler.allocation.file", sharing.FairPools.allocationFile())
    val spark = master.fold(b)(b.master).getOrCreate()
    functions.Registry.ensure(spark) // covers the getOrCreate-reuse path too
    operators.UserFns.ensure(spark)
    spark
  }

  /** Register the test corpus (or any directory of parquet tables). */
  def openCorpus(spark: SparkSession, dir: String): Unit =
    Tables.register(spark, dir)
}
