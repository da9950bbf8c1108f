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
  *
  * Second arg selects the kernel (VERDICT r13 next-5): `d29` (default, the
  * stages above) or `p29` — the curation funnel, the ladder's largest real
  * unrouted row (85.3 s wall / 63.5 s warm at 320×), whose wall composes
  * quality→exact→near-dedup→decontamination and was previously only
  * measurable whole. The p29 stages time each CUMULATIVE flag-frame prefix
  * ([[graft.operators.Pipeline.p29StageFrames]] — the same definitions the
  * query aggregates), so a level-over-level growth alarm names a stage.
  */
object GrowthProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scale/x200")
    val kernel = if (args.length > 1) args(1) else "d29"
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
      // every cumulative prefix pays its routing/gate censuses cold, so a
      // stage DIFF attributes marginal cost instead of crediting stage N
      // with the memo stage N-1 happened to fill (the memos are linear
      // jobs, so they cancel in the diff when every stage pays them)
      graft.operators.Routing.clearMassMemo()
      graft.operators.BroadcastGate.clearCountMemo()
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)

    import graft.operators.{Dedup, Pipeline}
    val nDocs = docs.count()
    val d29Stages = Seq[(String, () => Unit)](
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
    // p29 mode: each cumulative flag frame collapses through one scalar
    // aggregate over its flag/token columns only — the funnel's own
    // conditional-aggregate pass reads exactly those, so Catalyst prunes
    // `text` out of the join spine the same way in probe and query
    // (hashing every column was measured 3× the funnel itself at 20×:
    // it forced full texts through all four joins)
    def p29t = graft.T(spark, dir)
    val p29FlagCols =
      Seq("n_tokens", "q_keep", "e_keep", "n_keep", "contam_bp", "c_keep")
    val p29Stages: Seq[(String, () => Unit)] =
      Pipeline.p29StageFrames(p29t).map { case (name, _) =>
        // rebuild the frame INSIDE the timed body: p29StageFrames' routing
        // verdict (nearDupKeepers' mass census) must run inside the stage
        // that claims it, not at stage-list construction
        name -> (() => {
          val frame = Pipeline.p29StageFrames(p29t)
            .find(_._1 == name).get._2
          val cols = p29FlagCols.filter(frame.columns.contains).map(col)
          frame.agg(count(lit(1)), sum(hash(cols: _*))).collect()
          ()
        })
      } :+ ("funnel" -> (() =>
        Pipeline.p29CurationFunnel(p29t)
          .write.format("noop").mode("overwrite").save(): Unit))
    // p29near mode (r14): the 480× p29 stage probe read a stable +50 s
    // near_dedup marginal where 320× read ~+1 s — a discrete jump, so an
    // interior size-gate crossing is the suspect, not smooth growth. These
    // sub-stages time the near stage's real pieces (the SAME frames the
    // route runs): the exact-survivor set, the corpus replica-mass census,
    // the ownership collapse, the kept-set candidate pairs, and the full
    // keeper election (adds the CC + join residue). Each stage rebuilds its
    // frames cold (memos cleared in [[timed]]), and constructing eDocs via
    // p29StageFrames re-pays the same frame-construction censuses in every
    // stage, so stage DIFFS attribute marginal cost exactly as in p29 mode.
    // Counts go to stderr: a count jump vs the data ratio names a gate.
    import graft.operators.Routing
    def p29EDocs = {
      val withE = Pipeline.p29StageFrames(p29t).find(_._1 == "exact_dedup").get._2
      withE.filter(col("e_keep")).select("doc_id", "text", "n_chars")
    }
    val p29NearStages: Seq[(String, () => Unit)] = Seq(
      "edocs" -> (() =>
        System.err.println(s"[growth]   n_edocs=${p29EDocs.count()}")),
      "mass_census" -> (() => { Routing.docReplicaMassBp(p29t.documents); () }),
      "ownership" -> (() =>
        System.err.println(
          s"[growth]   n_keepers=${Dedup.ownershipKeepers(p29EDocs).count()}")),
      "pairs" -> (() => {
        val (_, pairs) = Routing.nearDupCollapseKeptPairs(p29EDocs)
        System.err.println(s"[growth]   n_pairs=${pairs.count()}")
      }),
      "keepers_full" -> (() =>
        Routing.nearDupKeepers(p29t.documents, p29EDocs)
          .write.format("noop").mode("overwrite").save(): Unit))
    val stages = kernel match {
      case "p29"     => p29Stages
      case "p29near" => p29NearStages
      case _         => d29Stages
    }
    val times = stages.map { case (name, fn) =>
      val sec = timed(fn())
      System.err.println(s"[growth] $name ${fmt(sec)}s")
      name -> sec
    }
    val qs = times.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString(",")
    println(s"""{"metric":"growth_probe","dir":"$dir","kernel":"$kernel","docs":$nDocs,$qs}""")
    spark.stop()
  }
}
