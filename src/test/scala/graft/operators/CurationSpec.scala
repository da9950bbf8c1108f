package graft.operators

import graft.{SparkSpec, T}
import org.apache.spark.sql.functions._

/** Behavioral specs for the round-7 curation additions: the Gopher n-gram
  * repetition filters (t25) and the end-to-end curation funnel (p29).
  *
  * Both get crafted corpora where every stage/branch is exercised by
  * construction, and t25's arithmetic is checked against an independent
  * in-memory reimplementation (sliding-window census) rather than a second
  * copy of the SQL — the same discipline as RetrievalDedupSpec.
  */
class CurationSpec extends SparkSpec {

  /** Crafted corpus: one doc per funnel branch. */
  private lazy val craftedDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-curation").toString
    // long enough (~480 chars) that a one-word edit keeps char-4-shingle
    // Jaccard ≈ 0.98, which the 4x8 MinHash banding catches with
    // near-certainty; the edit sits INSIDE the first 64 chars so the exact
    // stage's prefix hash does NOT conflate the near pair
    val base = ("the heavy analytics engine and the storage layer stream rows " +
      "into a merge sort while the planner is folding constants and pruning " +
      "columns for every scan stage under a shared cost model with stats " +
      "and the executor keeps a partial aggregate in the hash table so the " +
      "exchange only carries one row per group while the broadcast side is " +
      "pinned in memory and every probe of the join is a constant lookup " +
      "against the built relation with no spill and no sort of the rows").trim
    val rows = Seq(
      // holdout (src0): never counted in the funnel, feeds decontamination
      (100L, "the frozen benchmark suite holds out a fixed evaluation set of " +
        "questions and answers that no training document is allowed to quote " +
        "verbatim in any of its spans", "en", "src0"),
      // fails the quality cascade (f_len: 2 tokens)
      (0L, "tiny doc", "en", "src1"),
      // clean survivor
      (1L, base, "en", "src1"),
      // exact duplicate of doc 1 (same 64-char prefix -> d01 keeper drops it)
      (2L, base, "en", "src1"),
      // near duplicate: one EARLY word changed (inside the 64-char exact
      // prefix) -> different exact key, char-shingle Jaccard ≈ 0.98
      (3L, base.replace("heavy", "hefty"), "en", "src1"),
      // contaminated: quotes the holdout verbatim plus a little framing
      (4L, "as noted before the frozen benchmark suite holds out a fixed " +
        "evaluation set of questions and answers that no training document " +
        "is allowed to quote verbatim in any of its spans", "en", "src1"),
      // second clean survivor (distinct content)
      (5L, "a compact vector index keeps the centroid table in memory and is " +
        "probing only the nearest buckets while the reranker is scoring the " +
        "candidates with exact distances over the quantized codes", "en", "src1"))
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("p32: raw docs that speak the target's language are the ones resampled") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-p32").toString
    val targetText = ("alpha beta gamma delta epsilon " * 12).trim
    val likeText = ("alpha beta gamma delta epsilon " * 10).trim
    val junkText = ("omega sigma tau phi chi " * 10).trim
    val docs =
      (0L to 2L).map(i => (i, targetText, "en", "src0")) ++
      Seq((10L, likeText, "en", "src1"), (11L, likeText, "en", "src1")) ++
      (12L to 17L).map(i => (i, junkText, "en", "src1"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Pipeline.p32DsirResample(T(spark, dir)).collect()
    // only the raw side is scored; k = ceil(8/4) = 2 and the two
    // target-vocabulary docs out-score every junk doc
    assert(out.length == 8)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    val selected = out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(selected == Set(10L, 11L), s"selected $selected")
    val likeScore = byId(10L).getLong(2)
    val junkScore = byId(12L).getLong(2)
    assert(likeScore > junkScore,
      s"target-like $likeScore must out-score junk $junkScore")
    // junk bigrams never occur on the target side: add-one smoothing puts
    // their llr strictly negative, so the junk score is negative too
    assert(junkScore < 0L, s"junk score $junkScore")
  }

  /** Replica-heavy corpus for the routed near-dedup stage: three byte
    * replicas push the 64-char-prefix mass to 4000 bp (≥ the 2000 bp
    * gate), and one near-dup pair (4, 5) differs INSIDE the first 64 chars
    * so exact dedup keeps both and the gear choice decides its keeper —
    * raw keeps the LONGEST member (doc 5), the collapsed gear keeps the
    * bucket OWNER (doc 4, first arrival). */
  private lazy val replicaDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-routedfunnel").toString
    val base = ("the heavy analytics engine and the storage layer stream rows " +
      "into a merge sort while the planner is folding constants and pruning " +
      "columns for every scan stage under a shared cost model with stats " +
      "and the executor keeps a partial aggregate in the hash table so the " +
      "exchange only carries one row per group while the broadcast side is " +
      "pinned in memory and every probe of the join is a constant lookup " +
      "against the built relation with no spill and no sort of the rows").trim
    val other = ("a compact vector index keeps the centroid table in memory and is " +
      "probing only the nearest buckets while the reranker is scoring the " +
      "candidates with exact distances over the quantized codes and the " +
      "planner is reading the stats to prune every partition of the scan").trim
    val rows = Seq(
      (100L, "the frozen benchmark suite holds out a fixed evaluation set of " +
        "questions and answers that no training document may quote", "en", "src0"),
      // three byte replicas -> mass (5-3)/5 = 4000 bp over the train side
      (1L, other, "en", "src1"), (2L, other, "en", "src1"), (3L, other, "en", "src1"),
      // near pair: one-word edit inside the first 64 chars, doc 5 longer
      (4L, base, "en", "src1"),
      (5L, base.replace("heavy", "heavier"), "en", "src1"))
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("routed near-dedup stage: the gear flips on replica mass, keeper identity proves it") {
    import spark.implicits._
    val t = T(spark, replicaDir)
    assert(Routing.docReplicaMassBp(t.documents) >= Routing.defaultThresholdBp)
    val eDocs = t.documents.filter($"source" =!= "src0")
      .select($"doc_id", $"text", $"n_chars")
      // exact-collapsed survivors, as p29 feeds the stage
      .filter($"doc_id".isin(1L, 4L, 5L))
    // raw gear (gate forced out of reach): longest member of the near pair
    val raw = Routing.nearDupKeepers(t.documents, eDocs, thresholdBp = 1000000)
      .collect().map(_.getLong(0)).toSet
    assert(raw == Set(1L, 5L), s"raw kept $raw")
    // default gate: collapsed gear -> bucket owner (first arrival) wins
    val routed = Routing.nearDupKeepers(t.documents, eDocs)
      .collect().map(_.getLong(0)).toSet
    assert(routed == Set(1L, 4L), s"routed kept $routed")
  }

  test("p29 funnel inherits the routed stage: near-dedup tokens are the OWNER's on a replica corpus") {
    import spark.implicits._
    val t = T(spark, replicaDir)
    val out = Pipeline.p29CurationFunnel(t).collect()
      .map(r => r.getString(1) -> r).toMap
    val tok: Long => Long = id => t.documents.filter($"doc_id" === id)
      .select(size(split($"text", " ")).cast("long")).head().getLong(0)
    assert(out("raw").getLong(2) === 5L)
    assert(out("exact_dedup").getLong(2) === 3L) // {1, 4, 5}
    assert(out("near_dedup").getLong(2) === 2L)
    // doc 4 (owner), NOT doc 5 (longest) — the collapsed gear decided
    assert(out("near_dedup").getLong(3) === tok(1L) + tok(4L),
      s"near_dedup tokens ${out("near_dedup").getLong(3)} != ${tok(1L)} + ${tok(4L)}")
  }

  test("p32: k stays a Long — no Int truncation past 8.6B docs (VERDICT r9 #1)") {
    assert(Pipeline.dsirK(0L) === 0L)
    assert(Pipeline.dsirK(1L) === 1L)
    assert(Pipeline.dsirK(8L) === 2L)
    assert(Pipeline.dsirK(9L) === 3L)
    // the old ((n + 3) / 4).toInt wrapped here: 10 B docs -> k 2.5 B > Int.MaxValue
    assert(Pipeline.dsirK(10000000000L) === 2500000000L)
    // and no n + 3 wrap at the extreme either
    assert(Pipeline.dsirK(Long.MaxValue) === Long.MaxValue / 4 + 1)
  }

  test("p32: radix descent finds exact order statistics, any sign, with duplicates") {
    import spark.implicits._
    val vals: Seq[Long] = Seq(-9000000000L, -12L, -12L, 0L, 3L, 3L, 3L,
      17L, 255L, 65536L, 4294967296L, Long.MaxValue, Long.MinValue)
    val df = vals.toDF("v")
    val sorted = vals.sorted
    for (j <- 1 to sorted.length)
      assert(Pipeline.kthSmallestLong(df, j.toLong) === sorted(j - 1),
        s"rank $j")
  }

  test("p32: cutoff inside a tie group breaks ties by smallest doc_id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-p32-tie").toString
    val targetText = ("alpha beta gamma delta epsilon " * 12).trim
    val likeText = ("alpha beta gamma delta epsilon " * 10).trim
    val junkText = ("omega sigma tau phi chi " * 10).trim
    // 1 target-like + 7 identically-scored junk docs: k = ceil(8/4) = 2, so
    // the cutoff lands INSIDE the junk tie group and exactly one junk doc
    // is taken — the smallest doc_id, per the oracle's (score desc, doc_id)
    val docs =
      (0L to 2L).map(i => (i, targetText, "en", "src0")) ++
      Seq((30L, likeText, "en", "src1")) ++
      (31L to 37L).map(i => (i, junkText, "en", "src1"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Pipeline.p32DsirResample(T(spark, dir)).collect()
    assert(out.length == 8)
    val selected = out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(selected == Set(30L, 31L), s"selected $selected")
  }

  test("p32: cutoff decision is exact on a corpus with ~n distinct scores (r10 wrong-2)") {
    import spark.implicits._
    // The r10 census collected O(#distinct score) rows to the driver; the
    // r11 decision runs entirely through the bounded radix descent (≤ 4
    // jobs, ≤ 65536-row digit censuses — proven exact by the radix spec
    // above). This spec pins the DECISION's contract on the adversarial
    // shape that motivated the rewrite: every doc a distinct score, plus a
    // tie group planted exactly across the k-boundary, plus negatives.
    def check(scores: Seq[Long]): Unit = {
      val n = scores.length.toLong
      val rows = scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val scored = rows.toDF("doc_id", "score_bits")
      // in-memory frame: no file snapshot, so the memo is bypassed and the
      // decision recomputes for each constructed corpus
      val (cut, tie) = Pipeline.dsirCutoff(scored, scored)
      val k = Pipeline.dsirK(n)
      val want = rows.sortBy { case (id, s) => (-s, id) }.take(k.toInt)
        .map(_._1).toSet
      val got = rows.filter { case (id, s) =>
        s > cut || (s == cut && id <= tie) }.map(_._1).toSet
      assert(got == want, s"n=$n cut=$cut tie=$tie")
    }
    val rnd = new scala.util.Random(41)
    // ~n distinct: 4001 draws across the full signed-long range
    check(Seq.fill(4001)(rnd.nextLong()))
    // all-distinct dense ascending (cutoff between adjacent values)
    check((0L until 1000L).map(i => i - 500L))
    // tie group of 64 planted so the k-boundary lands inside it
    check((0L until 900L).map(_ => 7L) ++ Seq.fill(64)(100L) ++
      (0L until 36L).map(i => 200L + i))
    // whole-tie-group selection (tie sentinel = Long.MaxValue path)
    check(Seq(9L, 9L, 1L, 1L, 1L, 1L, 1L, 1L))
    // negative-heavy corpus: sign-bit bias correctness end to end
    check(Seq.fill(257)(rnd.nextLong() | Long.MinValue) ++ Seq(5L, -5L))
  }

  /** Independent reimplementation of t25's mass arithmetic: sliding-window
    * word n-gram census; top = max cnt*chars, dup = sum (cnt-1)*chars. */
  private def masses(text: String, n: Int): (Long, Long) = {
    val grams = text.split(" ").sliding(n).map(_.mkString(" ")).toSeq
    val counts = grams.groupBy(identity).map { case (g, o) => (g, o.size) }
    val top = if (counts.isEmpty) 0L else counts.map { case (g, c) => c.toLong * g.length }.max
    val dup = counts.collect { case (g, c) if c > 1 => (c - 1).toLong * g.length }.sum
    (top, dup)
  }

  test("t25: masses match an independent census; repetition flags fire correctly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-t25").toString
    val rep = ("spark table " * 30).trim // maximal 2-gram repetition
    val uniq = (1 to 60).map(i => s"word$i").mkString(" ") // zero repetition
    Seq((0L, rep, "en", "src1"), (1L, uniq, "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.t25GopherRepetition(T(spark, dir))
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, text) <- Seq(0L -> rep, 1L -> uniq)) {
      val dlen = text.length.toLong
      val (t2, d2) = masses(text, 2)
      val (t3, d3) = masses(text, 3)
      val row = out(id)
      assert(row.getLong(1) == t2 * 10000 / dlen, s"doc $id top2")
      assert(row.getLong(2) == t3 * 10000 / dlen, s"doc $id top3")
      assert(row.getLong(3) == d2 * 10000 / dlen, s"doc $id dup2")
      assert(row.getLong(4) == d3 * 10000 / dlen, s"doc $id dup3")
    }
    assert(out(0L).getBoolean(5), "fully-repetitive doc must flag")
    assert(!out(1L).getBoolean(5), "zero-repetition doc must not flag")
    assert(out(1L).getLong(3) == 0L && out(1L).getLong(4) == 0L)
    // the multiset char-mass definition is documented to exceed 10000 bp on
    // overlapping runs — pin that the crafted run actually exercises it
    assert(out(0L).getLong(3) > 10000L, "overlap counting is the documented contract")
  }

  test("p29: every funnel stage removes exactly its crafted doc, monotonically") {
    val rows = Pipeline.p29CurationFunnel(T(spark, craftedDir)).collect()
    assert(rows.length == 5)
    val byStage = rows.map(r => r.getString(1) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val docs = Seq("raw", "quality", "exact_dedup", "near_dedup", "decontaminated")
      .map(s => byStage(s)._1)
    // 6 train docs; quality drops doc 0, exact drops doc 2, near drops one of
    // {1,3}, decontamination drops doc 4 -> 6,5,4,3,2
    assert(docs == Seq(6L, 5L, 4L, 3L, 2L), s"funnel docs: $docs")
    // tokens monotone non-increasing, retained_bp consistent with n_docs
    val toks = Seq("raw", "quality", "exact_dedup", "near_dedup", "decontaminated")
      .map(s => byStage(s)._2)
    assert(toks == toks.sorted.reverse, s"token funnel not monotone: $toks")
    val rawDocs = byStage("raw")._1
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) * 10000 / rawDocs, s"bp row $r")
    }
  }

  test("p29: funnel on the shipped corpus is monotone and starts at the train count") {
    val t0 = T(spark, sfDir)
    val expectedRaw = t0.documents.filter(col("source") =!= "src0").count()
    val rows = Pipeline.p29CurationFunnel(t0).collect()
    val docs = rows.sortBy(_.getLong(0)).map(_.getLong(2)).toSeq
    assert(docs.head == expectedRaw)
    assert(docs == docs.sorted.reverse, s"not monotone: $docs")
  }
}
