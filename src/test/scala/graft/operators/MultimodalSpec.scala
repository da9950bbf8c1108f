package graft.operators

import graft.{SparkSpec, T}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val t = T(spark, sfDir)

  test("asset synthesis: binary payload column with typed metadata") {
    val a = Multimodal.assets(t)
    val schema = a.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("kind").dataType.typeName == "string")
    val kinds = a.groupBy("kind").count().collect().map(_.getString(0)).sorted
    assert(kinds.sameElements(Array("audio", "image", "video")))
  }

  test("decode is deterministic and batch-shaped (mapPartitions)") {
    val f1 = snap(Multimodal.extractFeatures(Multimodal.assets(t)).toDF())
    val f2 = snap(Multimodal.extractFeatures(Multimodal.assets(t)).toDF())
    assert(f1 == f2)
    assert(f1.nonEmpty)
  }

  test("feature stage drops blobs before any shuffle") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val rollup = Multimodal.m02MediaRollup(t)
    rollup.collect() // finalize the adaptive plan
    def exchanges(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case q: QueryStageExec => exchanges(q.plan)
      case s: ShuffleExchangeLike => s +: s.children.flatMap(exchanges)
      case other => other.children.flatMap(exchanges)
    }
    val ex = exchanges(rollup.queryExecution.executedPlan)
    assert(ex.nonEmpty)
    ex.foreach { e =>
      assert(!e.output.exists(_.name == "payload"),
        s"blob column crossed a shuffle: ${e.output.map(_.name)}")
    }
  }

  test("thumbnail arithmetic fits the 64x64 box and keeps aspect floor") {
    val bad = Multimodal.m01MediaFeatures(t)
      .filter(col("thumb_w") > 64 || col("thumb_h") > 64 || col("thumb_w") < 1 || col("thumb_h") < 1)
    assert(bad.count() == 0)
  }
}
