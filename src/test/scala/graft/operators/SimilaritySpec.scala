package graft.operators

import graft.{SparkSpec, T}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def t = T(spark, sfDir)

  test("s28: the margin device mines the mutual pair and suppresses the hub") {
    import spark.implicits._
    // constructed corpus on a shared dominant axis: every vector is
    // e0 + jitter with |jitter|_1 < 1, so no ±1 hyperplane dot can flip —
    // all rows share ONE 32-bit sig and the candidate set is exactly the
    // full cross-side product (banding is deterministic here, not lucky).
    def vec(c: (Int, Float)*): Array[Float] = {
      val a = new Array[Float](64); a(0) = 1.0f
      c.foreach { case (i, v) => a(i) = v }; a
    }
    val rows = Seq(
      (2L, vec(1 -> 0.45f), 0L), // a1 — true source (shares axis 1 with b1)
      (4L, vec(2 -> 0.45f), 0L),
      (6L, vec(3 -> 0.45f), 0L),
      (8L, vec(4 -> 0.45f), 0L),
      (1L, vec(1 -> 0.44f), 1L), // b1 — a1's translation
      (3L, vec(5 -> 0.45f), 1L),
      (5L, vec(6 -> 0.45f), 1L),
      (7L, vec(7 -> 0.45f), 1L),
      (9L, vec(), 1L))           // the hub: cos 0.9119 with EVERY source
    val dir = java.nio.file.Files.createTempDirectory("graft-s28").toString
    rows.toDF("vec_id", "embedding", "label").coalesce(1)
      .write.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.s28BitextMargin(T(spark, dir)).collect()
    assert(out.length == 4, s"one best pair per source: ${out.toSeq}")
    val best = out.map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    // the mutual pair clears 1.06 because both directional neighborhood
    // means sit well under its cosine
    assert(best(2L)._1 == 1L && best(2L)._3 == 1L, s"a1 must mine b1: $best")
    // every filler source's best RAW cosine is the hub (0.9119 > 0.8316),
    // but the hub's own dense backward neighborhood drags the margin to
    // ~1.034 < 1.06 — margin, not cosine, decides what is mined
    Seq(4L, 6L, 8L).foreach { a =>
      assert(best(a)._1 == 9L && best(a)._3 == 0L,
        s"hub must win on cosine yet be suppressed for $a: $best")
    }
  }

  test("s25: concentrated far-from-centroid arrivals flip exactly their cell's retrain flag") {
    import spark.implicits._
    // constructed corpus: 8 axis-anchor cells. Indexed mass (30/cell) sits
    // tightly on 0.9*anchor_k; the arriving feed (vec_id % 25 == 7) lands
    // ONLY near anchor 0 but at 0.5 scale — still nearest to cell 0, yet
    // far from its centroid — so cell 0 must show high growth AND drift
    // while the untouched cells stay below both thresholds.
    def vec(k: Int, scale: Float, jitter: Float): Array[Float] = {
      val a = Array.fill(64)(jitter)
      a(k) = scale; a
    }
    val anchors = (0 until 8).map(k => (k.toLong, vec(k, 0.9f, 0.0f), k.toLong))
    // indexed rows: ids chosen ≠ 7 mod 25; 30 per cell with tiny per-row jitter
    var id = 100L
    val indexed = for (k <- 0 until 8; j <- 0 until 30) yield {
      id += 1; if (id % 25 == 7) id += 1
      (id, vec(k, 0.9f, 0.0001f * ((j % 5) + 1)), k.toLong)
    }
    // arriving rows: ids ≡ 7 mod 25, all in cell 0's basin at 0.5 scale
    val arriving = (0 until 10).map(j => (1007L + 25L * j, vec(0, 0.5f, 0.0f), 0L))
    val dir = java.nio.file.Files.createTempDirectory("graft-s25").toString
    (anchors ++ indexed ++ arriving).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")

    val rows = Similarity.s25IndexDrift(T(spark, dir)).collect()
    assert(rows.length == 8)
    val cell0 = rows.find(_.getLong(0) == 0L).get
    assert(cell0.getLong(3) >= 2000, s"cell 0 growth_bp ${cell0.getLong(3)}")
    assert(cell0.getLong(6) >= 1500, s"cell 0 drift_bp ${cell0.getLong(6)}")
    assert(cell0.getLong(7) == 1L, "cell 0 must be flagged for retraining")
    // the untouched cells (1..6) stay unflagged; cell 7's seed vector is
    // itself id 7 ≡ 7 mod 25 (one arriving member at distance ~0), which
    // must not trip either threshold
    val others = rows.filter(_.getLong(0) != 0L)
    assert(others.forall(_.getLong(7) == 0L),
      s"only cell 0 may be flagged: ${others.map(r => (r.getLong(0), r.getLong(7))).toSeq}")
  }

  test("k-means training moves the centroids off their seeds") {
    import spark.implicits._
    val seeds = Similarity.trainIvfCentroids(t, iters = 0)
    val trained = Similarity.trainIvfCentroids(t)
    assert(seeds.length == Similarity.IvfK && trained.length == Similarity.IvfK)
    assert(seeds.zip(trained).exists { case (s, c) => !s.sameElements(c) },
      "2 Lloyd iterations left every centroid exactly on its seed vector")
    // training is deterministic: same input -> same model (retrain through
    // the uncached path — the default entry memoizes per corpus dir)
    val again = Similarity.trainIvfUncached(t, Similarity.IvfK, Similarity.IvfIters)
    assert(trained.zip(again).forall { case (a, b) => a.sameElements(b) })
  }

  test("IVF ANN recalls a useful share of the brute-force top-3") {
    import spark.implicits._
    val exact = Similarity.s01CosineTopK(t).filter($"rk" <= 3)
      .select($"query_id", $"neighbor_id")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = Similarity.s04IvfAnn(t)
      .select($"query_id", $"neighbor_id")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(exact.nonEmpty)
    val recalls = exact.map { case (q, nbrs) =>
      (approx.getOrElse(q, Set.empty) & nbrs).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF top-3 recall vs brute force: $mean%.3f over ${recalls.size} queries")
    // 2-probe IVF with k=8 on synthetic embeddings: recall is bounded by how
    // often true neighbors land in the query's two nearest clusters — well
    // above chance (3/n ~ 0.6%), and asserted with slack under the measured
    // value (nprobe=1 measured 0.283, nprobe=2 raises it)
    assert(mean >= 0.3, f"mean recall $mean%.3f below floor 0.3")
  }

  test("s07 recall query agrees with the spec's hand-computed recall") {
    import spark.implicits._
    val rows = Similarity.s07IvfRecall(t)
      .select($"query_id", $"n_hits", $"recall_bp").collect()
    assert(rows.nonEmpty)
    // recall_bp is the integer-bp rendering of n_hits/3
    rows.foreach(r => assert(r.getLong(2) == r.getLong(1) * 10000 / 3))
    val mean = rows.map(_.getLong(2)).sum.toDouble / rows.length / 10000.0
    info(f"s07 mean IVF recall@3: $mean%.3f")
    assert(mean >= 0.3, f"s07 mean recall $mean%.3f below floor 0.3")
  }
}
