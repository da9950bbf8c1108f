package graft.operators

import graft.{SparkSpec, T}
import org.apache.spark.sql.functions._

/** The replica-mass routing policy (Routing.scala): the estimator's two
  * regimes, and plan-choice equivalence — the routed operator must return
  * EXACTLY the chosen gear's answer on either side of the gate (the same
  * metamorphic contract the sharing plane is specced by).
  */
class RoutingSpec extends SparkSpec {

  private def t = T(spark, sfDir)

  test("estimator: low mass on the shipped corpus, saturated on a replicated one") {
    import spark.implicits._
    val shipped = Routing.docReplicaMassBp(t.documents)
    assert(shipped < Routing.defaultThresholdBp,
      s"shipped corpus mass $shipped bp should sit under the gate")
    // 5× replication with suffix-only perturbation (the probe corpus's
    // shape): every replica shares its source's 64-char prefix key, so
    // mass ≈ 4/5 = 8000 bp
    val reps = t.documents.crossJoin(broadcast(spark.range(5).toDF("rep")))
      .select(($"doc_id" * 10 + $"rep").as("doc_id"),
        concat($"text", lit(" r"), $"rep").as("text"))
    val replicated = Routing.docReplicaMassBp(reps)
    assert(replicated >= 7500, s"replica corpus mass $replicated bp should saturate")
    // vector estimator: the shipped corpus carries a legitimate near-dup
    // baseline (~2700 bp) but sits under the vector gate
    assert(Routing.vecReplicaMassBp(t.embeddings) < Routing.vecThresholdBp)
  }

  test("d30: routes to the raw exact gear under the gate, to the d29 collapse above it") {
    assert(snap(Routing.d30RoutedNearDup(t)) ==
      snap(Dedup.d08PrefixJaccardJoin(t)))
    assert(snap(Routing.d30RoutedNearDup(t, thresholdBp = 0)) ==
      snap(Dedup.d29FrontCollapsePairs(t, 8000)))
  }

  test("g15: routes to raw g01 under the gate, to g14's collapsed rank above it") {
    assert(snap(Routing.g15RoutedRank(t)) == snap(Graph.g01PageRank(t)))
    assert(snap(Routing.g15RoutedRank(t, thresholdBp = 0)) ==
      snap(Graph.g14CollapsedRank(t)))
  }

  test("d31: routes to raw d22 under the gate, to the residual-pair audit above it") {
    assert(snap(Routing.d31RoutedBbit(t)) == snap(Dedup.d22BbitMinhash(t)))
    val collapsed = Routing.d31RoutedBbit(t, thresholdBp = 0)
    assert(snap(collapsed) == snap(Dedup.bbitScoreOnPairs(spark,
      t.documents.join(Dedup.ownershipKeepers(t.documents), "doc_id"),
      Dedup.d29FrontCollapsePairs(t, 4200))))
    // non-vacuous: the residual stage must actually surface pairs here
    assert(collapsed.count() > 0)
  }

  test("s24: routes to raw s02 under the gate, to the representative kernel above it") {
    assert(snap(Routing.s24RoutedAnn(t)) == snap(Similarity.s02HyperplaneLsh(t)))
    assert(snap(Routing.s24RoutedAnn(t, thresholdBp = 0)) ==
      snap(Similarity.s02OverRepresentatives(t)))
  }

  test("s23: routes to raw d13 under the gate, to d27's signature collapse above it") {
    assert(snap(Routing.s23RoutedClusters(t)) ==
      snap(Dedup.d13SemanticClustersBucketed(t)))
    assert(snap(Routing.s23RoutedClusters(t, thresholdBp = 0)) ==
      snap(Dedup.d27SemanticCollapse(t)))
  }

  test("d32: routes to verified-pair CC under the gate, to star-edge CC above it") {
    import spark.implicits._
    assert(snap(Routing.d32RoutedCc(t)) == snap(Dedup.d07DedupClusters(t)))
    val collapsed = Routing.d32RoutedCc(t, thresholdBp = 0)
    assert(snap(collapsed) ==
      snap(Dedup.connectedComponents(Dedup.bucketStarEdges(t.documents))))
    // the star graph's components contain the verified graph's: dropping
    // the edge verify only MERGES clusters, never splits them — every
    // verified-together pair stays together in the collapsed branch
    val verified = Dedup.d07DedupClusters(t)
      .select($"doc_id", $"cluster_id".as("vc"))
    val star = collapsed.select($"doc_id", $"cluster_id".as("sc"))
    val refinement = verified.join(star, "doc_id")
      .groupBy($"vc").agg(countDistinct($"sc").as("n_star"))
      .filter($"n_star" > 1).count()
    assert(refinement == 0, "a verified cluster split across star clusters")
  }

  test("s26: routes to raw s04 under the gate, to the representative search above it") {
    import spark.implicits._
    assert(snap(Routing.s26RoutedIvf(t)) == snap(Similarity.s04IvfAnn(t)))
    val collapsed = Routing.s26RoutedIvf(t, thresholdBp = 0)
    assert(snap(collapsed) == snap(Similarity.s04OverRepresentatives(t)))
    // non-vacuous, and every collapsed-branch id is a representative
    // (MIN vec_id per 32-bit sig) — the rep filter reached both join sides
    assert(collapsed.count() > 0)
    val repIds = Similarity.sigRepresentatives(t.embeddings)
      .select($"vec_id").as[Long].collect().toSet
    val ids = collapsed.select($"query_id").as[Long].collect() ++
      collapsed.select($"neighbor_id").as[Long].collect()
    assert(ids.forall(repIds), "collapsed branch surfaced a non-representative id")
  }

  test("s27: routes to raw s21 under the gate, to the representative IVFADC above it") {
    assert(snap(Routing.s27RoutedIvfPq(t)) == snap(Similarity.s21IvfPqAnn(t)))
    val collapsed = Routing.s27RoutedIvfPq(t, thresholdBp = 0)
    assert(snap(collapsed) == snap(Similarity.s21OverRepresentatives(t)))
    assert(collapsed.count() > 0)
  }

  test("d34: routes to raw d06 under the gate, to simhash-rep pairs above it") {
    import spark.implicits._
    assert(snap(Routing.d34RoutedSimhash(t)) == snap(Dedup.d06SimhashPairs(t)))
    val collapsed = Routing.d34RoutedSimhash(t, thresholdBp = 0)
    assert(snap(collapsed) == snap(Dedup.d06OverSimhashReps(t)))
    // the collapsed pairs are a subset of the raw verdict restricted to
    // representatives, and none of them is a hamming-0 (same-sig) pair
    val raw = Dedup.d06SimhashPairs(t)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val col = collapsed.select($"doc_a", $"doc_b", $"hamming")
      .as[(Long, Long, Long)].collect()
    assert(col.forall { case (a, b, _) => raw.contains((a, b)) })
    assert(col.forall(_._3 >= 1), "a same-simhash pair survived the collapse")
  }

  test("d35: routes to the raw index probe under the gate, to the keeper index above it") {
    assert(snap(Routing.d35RoutedIncremental(t)) ==
      snap(Dedup.d21IncrementalDedup(t)))
    val collapsed = Routing.d35RoutedIncremental(t, thresholdBp = 0)
    assert(snap(collapsed) == snap(Dedup.d21AgainstKeeperIndex(t)))
    assert(collapsed.count() > 0)
  }

  test("s29: routes to raw s28 under the gate, to the representative mining above it") {
    import spark.implicits._
    assert(snap(Routing.s29RoutedBitext(t)) == snap(Similarity.s28BitextMargin(t)))
    val collapsed = Routing.s29RoutedBitext(t, thresholdBp = 0)
    assert(snap(collapsed) == snap(Similarity.s28OverRepresentatives(t)))
    assert(collapsed.count() > 0)
    // the rep filter reached both mining sides
    val repIds = Similarity.sigRepresentatives(t.embeddings)
      .select($"vec_id").as[Long].collect().toSet
    val ids = collapsed.select($"src_id").as[Long].collect() ++
      collapsed.select($"tgt_id").as[Long].collect()
    assert(ids.forall(repIds), "collapsed branch surfaced a non-representative id")
  }

  test("d36: routes to the exact string census under the char-mass gate, to d28's strided census above it") {
    import spark.implicits._
    // the estimator is CHARACTER mass, not replica mass — the substring
    // census's hazard is shuffle width (corpus-chars × 40-char string
    // keys), linear in chars and independent of replication
    val mass = Routing.docCharMass(t.documents)
    val expected = t.documents
      .agg(sum(length($"text").cast("long"))).head().getLong(0)
    assert(mass == expected, s"char mass $mass != corpus sum $expected")
    assert(mass < Routing.charMassThreshold,
      s"shipped corpus char mass $mass should sit under the gate")
    assert(snap(Routing.d36RoutedSubstring(t)) ==
      snap(Dedup.d09SubstringDupCoverage(t)))
    assert(snap(Routing.d36RoutedSubstring(t, thresholdChars = 0L)) ==
      snap(Dedup.d28StridedGramCensus(t)))
  }

  test("d33: routes to the raw band top-k under the gate, to the keeper residual top-k above it") {
    assert(snap(Routing.d33RoutedTopk(t)) == snap(Dedup.d18TopkSimJoin(t)))
    val collapsed = Routing.d33RoutedTopk(t, thresholdBp = 0)
    assert(snap(collapsed) == snap(
      Dedup.d29FrontCollapsePairs(t, 4200)
        .orderBy(org.apache.spark.sql.functions.col("jaccard_bp").desc,
          org.apache.spark.sql.functions.col("doc_a"),
          org.apache.spark.sql.functions.col("doc_b"))
        .limit(20)))
    // non-vacuous: the residual ranking must surface pairs on this corpus
    assert(collapsed.count() > 0)
  }
}
