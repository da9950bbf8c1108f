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

  test("JvmCodec: PNG, WAV and frame-container roundtrips are bit-exact") {
    val data = Array.tabulate(257)(i => ((i * 7 + 3) % 251).toByte)
    val png = JvmCodec.encodePng(data)
    // real containers: PNG/BMP magic, not the raw bytes
    assert(png.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    assert(JvmCodec.decodeImage(png).sameElements(data))
    val bmp = JvmCodec.encodeBmp(data)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    assert(JvmCodec.decodeImage(bmp).sameElements(data))
    val wav = JvmCodec.encodeWav(data)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(JvmCodec.decodeWav(wav).sameElements(data))
    val container = JvmCodec.encodeFrameContainer(data, 16)
    val frames = JvmCodec.demuxFrames(container).toVector
    assert(frames.size == (data.length + 15) / 16)
    assert(frames.flatMap(JvmCodec.decodeImage).toArray.sameElements(data))
    // empty-content edge: all codecs pass empties through
    assert(JvmCodec.decodeImage(JvmCodec.encodePng(Array.emptyByteArray)).isEmpty)
    assert(JvmCodec.decodeImage(JvmCodec.encodeBmp(Array.emptyByteArray)).isEmpty)
    assert(JvmCodec.decodeWav(JvmCodec.encodeWav(Array.emptyByteArray)).isEmpty)
    assert(JvmCodec.demuxFrames(JvmCodec.encodeFrameContainer(Array.emptyByteArray, 16)).isEmpty)
  }

  test("property: every codec roundtrips arbitrary byte content bit-exactly") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val dec = new JvmCodec.ImageDecoder
    val bytes = Gen.listOf(Gen.choose(0, 255).map(_.toByte)).map(_.toArray)
    val prop = Prop.forAll(bytes) { bs =>
      dec.decode(JvmCodec.encodeBmp(bs)).sameElements(bs) &&
        dec.decode(JvmCodec.encodePng(bs)).sameElements(bs) &&
        JvmCodec.decodeWav(JvmCodec.encodeWav(bs)).sameElements(bs) &&
        JvmCodec.demuxFrames(JvmCodec.encodeFrameContainer(bs, 16))
          .flatMap(dec.decode).toArray.sameElements(bs)
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("real-codec path equals the codec-free twin on the whole corpus") {
    // features through real encode->decode == features over raw content
    val real = snap(Multimodal.extractFeatures(
      Multimodal.decodeAssets(Multimodal.assetsEncoded(t))).toDF())
    val twin = snap(Multimodal.extractFeatures(Multimodal.assets(t)).toDF())
    assert(real == twin && real.nonEmpty)
    // sampled frames: real demux+decode == raw chunk twin
    val realFrames = snap(Multimodal.sampleFramesReal(Multimodal.assetsEncoded(t)).toDF())
    val twinFrames = snap(Multimodal.sampleFrames(Multimodal.assets(t)).toDF())
    assert(realFrames == twinFrames && realFrames.nonEmpty)
  }

  test("encoded assets are real containers, not renamed corpus bytes") {
    import spark.implicits._
    val rows = Multimodal.assetsEncoded(t).filter($"asset_id" < 9).collect()
    rows.foreach { a =>
      a.kind match {
        case "image" => assert(a.payload(0) == 'B'.toByte && a.payload(1) == 'M'.toByte)
        case "audio" => assert(new String(a.payload.take(4), "US-ASCII") == "RIFF")
        case _ => // frame container: first 4 bytes are the first frame's length prefix
          val len = java.nio.ByteBuffer.wrap(a.payload.take(4)).getInt
          assert(len > 0 && len <= a.payload.length - 4)
      }
    }
    assert(rows.nonEmpty)
  }

  test("thumbnail arithmetic fits the 64x64 box and keeps aspect floor") {
    val bad = Multimodal.m01MediaFeatures(t)
      .filter(col("thumb_w") > 64 || col("thumb_h") > 64 || col("thumb_w") < 1 || col("thumb_h") < 1)
    assert(bad.count() == 0)
  }
}
