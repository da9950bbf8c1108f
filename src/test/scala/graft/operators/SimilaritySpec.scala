package graft.operators

import graft.{SparkSpec, T}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def t = T(spark, sfDir)

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
