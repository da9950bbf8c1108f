package graft

/** Persisted trained-model registry (VERDICT r13 next-1): load==train
  * parity on the real model queries, plus the codec/fallback contracts.
  *
  * The parity tests are the round's done-criterion: s04 (IVF centroids),
  * s21 (IVF + PQ codebook) and p32 (DSIR llr + cutoff) must produce
  * hash-equal output when their models come from the registry instead of
  * a fresh training pass — proven by snapshotting the trained run, wiping
  * the in-JVM memos (simulating a fresh JVM), and re-running with only the
  * registry warm.
  */
class ModelRegistrySpec extends SparkSpec {

  private def withRegistry[A](body: java.nio.file.Path => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-registry")
    spark.conf.set("spark.graft.modelRegistry.dir", dir.toString)
    try body(dir)
    finally {
      spark.conf.unset("spark.graft.modelRegistry.dir")
      graft.operators.Similarity.clearModelMemo()
      graft.operators.Pipeline.clearModelMemo()
    }
  }

  test("roundtrip: second JVM-touch loads instead of training") {
    withRegistry { _ =>
      var trainings = 0
      def model() = { trainings += 1; Array(Array(Array(1L, 2L), Array(3L))) }
      val l0 = ModelRegistry.loads
      val first = ModelRegistry.loadOrTrain(spark, "t-roundtrip", "key-a")(model())
      val second = ModelRegistry.loadOrTrain(spark, "t-roundtrip", "key-a")(model())
      assert(trainings === 1)
      assert(ModelRegistry.loads === l0 + 1)
      assert(second.map(_.map(_.toSeq).toSeq).toSeq === first.map(_.map(_.toSeq).toSeq).toSeq)
    }
  }

  test("key mismatch and corrupt files degrade to retrain, never a wrong model") {
    withRegistry { dir =>
      ModelRegistry.loadOrTrain1(spark, "t-corrupt", "key-b")(Array(7L, 8L))
      // different key hashing to a different file: must train its own
      val other = ModelRegistry.loadOrTrain1(spark, "t-corrupt", "key-c")(Array(9L))
      assert(other.toSeq === Seq(9L))
      // corrupt every registry file in place
      val files = java.nio.file.Files.list(dir).toArray.map(_.toString)
      assert(files.nonEmpty)
      files.foreach(f => java.nio.file.Files.write(
        java.nio.file.Paths.get(f), "garbage".getBytes("UTF-8")))
      val l0 = ModelRegistry.loads
      val again = ModelRegistry.loadOrTrain1(spark, "t-corrupt", "key-b")(Array(7L, 8L))
      assert(again.toSeq === Seq(7L, 8L)) // retrained
      assert(ModelRegistry.loads === l0)  // no load claimed
      // the retrain healed the file: next touch loads
      val healed = ModelRegistry.loadOrTrain1(spark, "t-corrupt", "key-b")(
        sys.error("should have loaded"))
      assert(healed.toSeq === Seq(7L, 8L))
      assert(ModelRegistry.loads === l0 + 1)
    }
  }

  test("registry off: no files written, plain training") {
    val dir = java.nio.file.Files.createTempDirectory("graft-registry-off")
    val s0 = ModelRegistry.stores
    val m = ModelRegistry.loadOrTrain1(spark, "t-off", "key-d")(Array(1L))
    assert(m.toSeq === Seq(1L))
    assert(ModelRegistry.stores === s0)
    assert(!java.nio.file.Files.list(dir).findAny().isPresent)
  }

  test("load==train parity: s04/s21/p32/w15 hash-equal from a registry-served model") {
    withRegistry { _ =>
      graft.operators.Similarity.clearModelMemo()
      graft.operators.Pipeline.clearModelMemo()
      val names = Seq("s04_ivf_ann", "s21_ivfpq_ann", "p32_dsir_resample",
        "w15_stream_ann")
      // pass 1: train + store (registry empty, memos cold)
      val s0 = ModelRegistry.stores
      val trained = names.map(n => n -> snap(SparkEntry.queries(n)(spark, sfDir))).toMap
      assert(ModelRegistry.stores > s0, "training pass stored nothing")
      // simulate a fresh JVM: in-JVM model memos wiped, registry files live
      graft.operators.Similarity.clearModelMemo()
      graft.operators.Pipeline.clearModelMemo()
      val l0 = ModelRegistry.loads
      val loaded = names.map(n => n -> snap(SparkEntry.queries(n)(spark, sfDir))).toMap
      // IVF centroids (s04, re-touched by s21's assignment and w15's serve),
      // PQ codebook (s21), DSIR llr + cutoff (p32): at least these four
      // artifact kinds must have been SERVED from disk
      assert(ModelRegistry.loads >= l0 + 4,
        s"expected >=4 registry loads, saw ${ModelRegistry.loads - l0}")
      names.foreach(n => assert(loaded(n) === trained(n), s"$n diverged under a loaded model"))
    }
  }
}
