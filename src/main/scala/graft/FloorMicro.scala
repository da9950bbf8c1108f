package graft

import org.apache.spark.sql.SparkSession

/** Job-floor microbench (r14 measurement, guide §1): the JobProbe census
  * reads warm ≈ 0.05 + 0.070 × jobs over all 312 rows — the bench total is
  * job-count-bound, not byte-bound, at sf0.1. This decomposes that ~70 ms:
  * raw scheduler floor (1-task RDD job), noop action on a pre-analyzed df,
  * fresh analyze+plan+action, a parquet scan job, and a 1-exchange agg.
  * Whatever the floor turns out to be, per-query seconds can only drop by
  * (a) fewer jobs (fewer exchanges / actions) or (b) cheaper per-job work —
  * this tells us which.
  *
  *   scripts/run-main.sh graft.FloorMicro [sfDir]
  */
object FloorMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def bench(label: String, warm: Int, reps: Int)(f: => Unit): Unit = {
      (1 to warm).foreach(_ => f)
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      val ms = (System.nanoTime() - t0) / 1e6 / reps
      println(f"""{"probe":"$label%s","ms_per_rep":$ms%.1f}""")
    }
    val rdd = spark.sparkContext.parallelize(1 to 1, 1)
    bench("raw_rdd_1task_job", 20, 100)(rdd.count())
    val df = spark.range(1).toDF()
    bench("noop_same_df", 10, 50)(df.write.format("noop").mode("overwrite").save())
    bench("noop_fresh_range", 10, 50)(
      spark.range(1).write.format("noop").mode("overwrite").save())
    val docs = s"$sfDir/documents.parquet"
    bench("parquet_relation_create", 5, 40)(spark.read.parquet(docs))
    val docsDf = spark.read.parquet(docs)
    bench("parquet_scan_noop_cached_rel", 5, 20)(
      docsDf.write.format("noop").mode("overwrite").save())
    bench("parquet_scan_noop", 5, 20)(
      spark.read.parquet(docs).write.format("noop").mode("overwrite").save())
    bench("one_exchange_agg", 5, 20)(
      spark.read.parquet(docs).groupBy("lang").count()
        .write.format("noop").mode("overwrite").save())
    bench("shingle_pass_1task", 3, 10) {
      graft.functions.Registry.ensure(spark)
      spark.read.parquet(docs)
        .selectExpr("doc_id", "minhash_sig(shingle_hashes(text, 4, true), 32) AS sig")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
