package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interior-stage timing of the prefix-Jaccard (PPJoin) chain (r14
  * measurement): the chain is the shared kernel of the heaviest bench
  * family (d08 raw, d26/d29/g14 collapsed, d30/d31/d33 routed), so before
  * touching it we time each stage separately — shingle+sort census, vocab
  * dictionary (the global-window dense-id assignment), bitmap build,
  * prefix explode, candidate self-join + verify — warm, at bench configs.
  *
  *   scripts/run-main.sh graft.PpProbe <sfDir> [thresholdBp=8000]
  */
object PpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tBp = if (args.length > 1) args(1).toInt else 8000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.Registry.ensure(spark)
    val docs = Tables.load(spark, sfDir, "documents")
    def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
      f // warm
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val med = secs.sorted.apply(secs.size / 2)
      println(f"""{"stage":"$label%s","sec":$med%.3f}""")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val d = 10000 + tBp
    val shingles = "shingle_hashes(text, 4, true)"
    time("hs_shingle_sort")(noop(
      docs.select($"doc_id", array_sort(expr(shingles)).as("h"))))
    val hs = docs.select($"doc_id", array_sort(expr(shingles)).as("h")).localCheckpoint()
    val toks = hs.select($"doc_id", explode($"h").as("tok"))
    time("vocab_census_only")(noop(toks.groupBy($"tok").agg(count(lit(1)).as("df"))))
    time("vocab_with_window")(noop(
      toks.groupBy($"tok").agg(count(lit(1)).as("df"))
        .select($"tok", (row_number().over(Window.orderBy($"df", $"tok")) - 1L).as("bit"))))
    val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("df"))
      .select($"tok", (row_number().over(Window.orderBy($"df", $"tok")) - 1L).as("bit"))
      .localCheckpoint()
    val vocabSize = vocab.count()
    println(s"""{"stage":"vocab_size","n":$vocabSize}""")
    val nWords = ((vocabSize + 63) / 64).toInt
    val dense = nWords <= 512
    println(s"""{"stage":"dense","v":$dense,"nWords":$nWords}""")
    val docsB = toks.join(broadcast(vocab), "tok")
      .groupBy($"doc_id").agg(sort_array(collect_list($"bit")).as("bits"))
      .withColumn("n", size($"bits"))
      .withColumn("payload",
        if (dense) expr(s"bits_to_words(bits, $nWords)") else $"bits")
    time("bitmap_build")(noop(docsB))
    val pre = docsB
      .select($"doc_id", $"n", $"payload",
        posexplode(expr(s"slice(bits, 1, n - (($tBp * n + 9999) DIV 10000) + 1)"))
          .as(Seq("p", "bit")))
      .select($"doc_id", $"n", $"payload", ($"p" + 1).as("rn"), $"bit",
        ($"p" + 1 <= expr(s"n - ((2 * $tBp * n + ${d - 1}) DIV $d) + 1")).as("indexable"))
    time("prefix_explode")(noop(pre))
    val preCk = pre.localCheckpoint()
    val simFn = if (dense) "jaccard_bp_words" else "jaccard_bp_sorted"
    time("cand_join_verify")(noop(
      preCk.as("a").join(preCk.as("b"), expr(
          s"""a.bit = b.bit AND b.indexable
             AND (b.n < a.n OR (b.n = a.n AND b.doc_id < a.doc_id))
             AND b.n * 10000 >= a.n * $tBp
             AND 1 + least(a.n - a.rn, b.n - b.rn) >= ($tBp * (a.n + b.n) + ${d - 1}) DIV $d"""))
        .select(least($"a.doc_id", $"b.doc_id").as("doc_a"),
          greatest($"a.doc_id", $"b.doc_id").as("doc_b"),
          expr(s"$simFn(a.payload, b.payload)").as("jaccard_bp"))
        .filter($"jaccard_bp" >= tBp)
        .distinct()))
    time("full_chain")(noop(graft.operators.Dedup.d08PrefixJaccardJoin(T(spark, sfDir))))
    spark.stop()
  }
}
