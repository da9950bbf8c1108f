package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive fan-out for heavy per-row compute (r14, guide §2.5 "input
  * skew: one huge unsplittable file — repartition immediately after the
  * read" + §2.6 idle capacity).
  *
  * The test corpora are single-row-group parquet files, so every scan is ONE
  * task no matter how many cores the session has — and the signature passes
  * (shingle+minhash ~230 ms, simhash, gram censuses) run single-threaded on
  * a 32-core session (FloorMicro `shingle_pass_1task`). A 100 TB corpus has
  * the opposite shape: thousands of scan partitions, where an unconditional
  * repartition would be a full extra shuffle of the payload.
  *
  * So the fan-out is gated on the optimizer's SIZE ESTIMATE (driver-side
  * plan stats — no job): repartition to `defaultParallelism` only when the
  * input is estimated smaller than one `maxPartitionBytes` split per core,
  * i.e. exactly when the scan cannot reach core-count parallelism on its
  * own. Above that the frame passes through untouched — a no-op at scale,
  * parameterized by the session's own parallelism and split size, never a
  * constant tuned for local[32]. Round-robin repartition is deterministic
  * under retry (sortBeforeRepartition, SPARK-23207) and an explicit
  * partition count is exempt from AQE coalescing, so the fan-out survives
  * adaptive re-planning.
  */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val perCore = BigInt(spark.sessionState.conf.filesMaxPartitionBytes)
    if (est < perCore * p) df.repartition(p) else df
  }
}
