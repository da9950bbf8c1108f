package graft

/** The scale-smoke corpus builder must produce exactly mult x rows, unique
  * doc_ids, and NEAR-duplicate (not identical) replica text — if replicas
  * were byte-identical the smoke would measure exact-dup collapse, not
  * candidate-generation pressure.
  */
class ScaleSmokeSpec extends SparkSpec {

  test("buildScaled replicates rows with unique ids and near-dup (not equal) text") {
    val out = java.nio.file.Files.createTempDirectory("graft-smoke-spec").toString
    val (nDocs, nVecs) = ScaleSmoke.buildScaled(spark, "/root/testdata/sf0.001", out, 3)
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    val baseV = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert(nDocs == base * 3 && nVecs == baseV * 3)

    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.select("doc_id").distinct().count() == nDocs) // ids unique
    // replica texts are perturbed, so exact-dup of a full text never crosses
    // replica boundaries: every distinct text appears exactly once
    assert(docs.select("text").distinct().count() == nDocs)
    // and n_chars is consistent with the perturbed text
    import org.apache.spark.sql.functions._
    assert(docs.filter(length(col("text")).cast("long") =!= col("n_chars")).count() == 0)

    // build-once marker (r13): a successful build writes _GRAFT_READY with
    // the counts, and a second call attests the same corpus from the marker
    // instead of rebuilding (the row-per-JVM ladder children rely on this)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/_GRAFT_READY")))
    assert(ScaleSmoke.buildScaled(spark, "/root/testdata/sf0.001", out, 3) == ((nDocs, nVecs)))
    // a pre-r13 marker was an empty file — that shape must trigger a rebuild,
    // not a parse crash
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/_GRAFT_READY"),
      Array.empty[Byte])
    assert(ScaleSmoke.buildScaled(spark, "/root/testdata/sf0.001", out, 3) == ((nDocs, nVecs)))
    // a pre-r14 marker carried counts but no base tag (ADVICE r13 #2): that
    // shape must also rebuild, not attest a corpus of unknown parentage
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/_GRAFT_READY"),
      s"$nDocs,$nVecs".getBytes("UTF-8"))
    assert(ScaleSmoke.buildScaled(spark, "/root/testdata/sf0.001", out, 3) == ((nDocs, nVecs)))
    // base-corpus mismatch (ADVICE r13 #2): same out dir + multiplier but a
    // DIFFERENT base must rebuild from the new base, not reuse the old corpus
    // (sf0.1 — its doc count differs from sf0.001's, so reuse is detectable)
    val (nDocs2, nVecs2) = ScaleSmoke.buildScaled(spark, "/root/testdata/sf0.1", out, 3)
    val base2 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").count()
    val baseV2 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").count()
    assert(nDocs2 == base2 * 3 && nVecs2 == baseV2 * 3)
    assert(nDocs2 != nDocs, "mismatched base silently reused the stale corpus")
  }

  test("breach classification is exhaustive and self-consistent") {
    val all = SparkEntry.queries.keySet
    // every declared key (production, excluded, output-bound) is a real query
    (ScaleSmoke.productionKeys ++ ScaleSmoke.excludedBaselines ++
      ScaleSmoke.outputBoundBaselines).foreach(k =>
      assert(all.contains(k), s"declared smoke key $k is not a registered query"))
    // routed-baseline KEYS are measured raw arms in the production list, and
    // their VALUES (the shipping front doors) are benched alongside them —
    // otherwise the artifact would cite a gear the probe never measures
    ScaleSmoke.routedBaselines.foreach { case (raw, door) =>
      assert(ScaleSmoke.productionKeys.contains(raw), s"routed baseline $raw not benched")
      assert(ScaleSmoke.productionKeys.contains(door), s"front door $door not benched")
    }
    // diagnostic arms are benched too (their breach is their finding)
    ScaleSmoke.diagnosticArms.foreach(k =>
      assert(ScaleSmoke.productionKeys.contains(k), s"diagnostic arm $k not benched"))
    // no key is classified twice: a routed baseline must not also be
    // excluded/diagnostic, else the unrouted-breach filter double-counts
    val classes = Seq(ScaleSmoke.routedBaselines.keySet.toSeq,
      ScaleSmoke.diagnosticArms, ScaleSmoke.excludedBaselines,
      ScaleSmoke.outputBoundBaselines).flatten
    assert(classes.distinct.size == classes.size, s"overlapping classification: $classes")
  }
}
