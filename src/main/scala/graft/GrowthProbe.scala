package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level growth forensics for the d29 ownership-collapse kernel (and
  * therefore d33, whose collapsed branch is d29 + TakeOrdered) — VERDICT r10
  * wrong-3: both doors grew ~1.3× on 1.25× data between the 160× and 200×
  * ladder levels while every other door stayed ≤ 1.21×. The kernel is four
  * stages with different hazards, so a single wall-clock number cannot name
  * the cause; this main times each cumulative prefix on an already-built
  * scale corpus (`/tmp/graft-scale/x<mult>`, left behind by
  * [[ScaleSmoke]]):
  *
  *   scan   — parquet scan + char mass (the I/O floor)
  *   sig    — + shingle hashing and the 32-slot MinHash signature (pure
  *            per-doc CPU, linear in corpus chars)
  *   census — + band explode and the (band,bkey) ownership aggregate (the
  *            4n-row narrow shuffle)
  *   keeper — + the min-owner-per-doc aggregate and keeper filter
  *   d29    — the full door: keepers joined back and the constant-size
  *            kept set re-paired through the PPJoin index
  *
  * Run it twice (e.g. x200 and x240) and diff per-stage growth against the
  * data ratio: the stage whose ratio exceeds it is the cause; if every
  * stage tracks the ratio and only the total exceeds it, the growth is
  * memory-pressure (GC) rather than plan shape. Output: one JSON line.
  */
object GrowthProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scale/x200")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Registry.ensure(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def timed(body: => Unit): Double = {
      // cleanup BEFORE the window opens (ADVICE r11: clearing the cache and
      // running a full GC inside the timed region charged the previous
      // stage's teardown to this stage's seconds — a bias in the very
      // ratios the probe compares). The band-frame memo is cleared too so
      // each cumulative stage rebuilds the full prefix it claims to time.
      spark.sharedState.cacheManager.clearCache()
      graft.operators.Dedup.clearBandMemo()
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)

    import graft.operators.Dedup
    val nDocs = docs.count()
    val stages = Seq[(String, () => Unit)](
      "scan" -> (() =>
        docs.agg(sum(length(col("text")))).collect()),
      "sig" -> (() =>
        Dedup.minhashSigTable(docs)
          .agg(sum(hash(col("sig")))).collect()),
      "census" -> (() =>
        Dedup.ownershipCensus(docs)
          .agg(count(lit(1)), sum(hash(col("owner")))).collect()),
      "keeper" -> (() =>
        Dedup.ownershipKeepers(docs).agg(count(lit(1))).collect()),
      "d29" -> (() =>
        Dedup.d29FrontCollapsePairsDocs(docs, 4200)
          .write.format("noop").mode("overwrite").save()))
    val times = stages.map { case (name, fn) =>
      val sec = timed(fn())
      System.err.println(s"[growth] $name ${fmt(sec)}s")
      name -> sec
    }
    val qs = times.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString(",")
    println(s"""{"metric":"growth_probe","dir":"$dir","docs":$nDocs,$qs}""")
    spark.stop()
  }
}
