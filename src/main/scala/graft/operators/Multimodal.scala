package graft.operators

import graft.T
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side mechanics here are real and tested — schema, partitioning,
  * batch shape, codec dispatch — and since round 6 so is the codec on the
  * declared m01–m04 paths: [[JvmCodec]] encodes the corpus into real
  * containers (PNG via ImageIO, WAV via javax.sound, a length-prefixed
  * PNG-frame video container) and decodes them back executor-side; all
  * three are lossless, so the oracles' corpus-byte arithmetic still hashes.
  * `FakeCodec` remains the codec-free twin the spec compares against.
  * Swapping `JvmCodec` for a native one (JavaCPP/FFmpeg, TwelveMonkeys)
  * changes no plan shape.
  *
  * Scale design: media blobs ride the same rows as their metadata, so a
  * 100 TB corpus partitions by file count/size exactly like any parquet
  * table; the decode/feature stage is `mapPartitions` (one codec instance
  * per partition, streamed batches, no per-row setup) — the Scala twin of a
  * pandas `mapInPandas` UDF; feature outputs are narrow columns so downstream
  * aggregation never carries the blobs through a shuffle (project-before-
  * shuffle is the invariant the spec checks).
  */
object Multimodal {

  /** Typed row: a media asset = blob + metadata. */
  final case class Asset(asset_id: Long, kind: String, width: Int, height: Int,
                         sample_rate: Int, payload: Array[Byte])

  final case class Feature(asset_id: Long, kind: String, n_bytes: Long,
                           checksum: Long, mean_byte: Double,
                           thumb_w: Int, thumb_h: Int)

  /** Deterministic stand-in for the real media codec (see class doc). */
  object FakeCodec {
    /** "Decode" = checksum + byte statistics; real impl would decode pixels. */
    def decode(a: Asset): Feature = {
      var sum = 0L; var i = 0
      while (i < a.payload.length) { sum = (sum * 31 + (a.payload(i) & 0xff)) % 2147483647L; i += 1 }
      val mean = if (a.payload.isEmpty) 0.0 else a.payload.map(_ & 0xff).map(_.toLong).sum.toDouble / a.payload.length
      // "resize": fit into 64x64 preserving aspect ratio (pure arithmetic;
      // ceiling division or a 255-wide image scales to 85 > 64)
      val scale = math.max(1, (math.max(a.width, a.height) + 63) / 64)
      Feature(a.asset_id, a.kind, a.payload.length.toLong, sum, mean,
        math.max(1, a.width / scale), math.max(1, a.height / scale))
    }
  }

  /** Synthesize an asset table from `documents` (deterministic: payload =
    * UTF-8 text bytes, dimensions derived from doc_id). In production this is
    * `spark.read.format("binaryFile")` or parquet with a binary column. */
  def assets(t: T): Dataset[Asset] = {
    import t.spark.implicits._
    t.documents.select(
      $"doc_id".as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        ($"doc_id" % 3 + 1).cast("int")).as("kind"),
      (lit(16) + pmod($"doc_id", lit(240))).cast("int").as("width"),
      (lit(16) + pmod($"doc_id" * 7, lit(240))).cast("int").as("height"),
      when($"doc_id" % 3 === 1, 16000).otherwise(0).cast("int").as("sample_rate"),
      encode($"text", "UTF-8").as("payload")).as[Asset]
  }

  /** The corpus as REAL encoded media: image payloads become lossless
    * grayscale BMPs, audio becomes 8-bit PCM WAV, video becomes a
    * length-prefixed PNG-frame container — all encoded executor-side with
    * the pure-JVM [[JvmCodec]]. Every container is lossless, so decoded
    * content equals the raw corpus bytes and the m01–m04 oracles (which
    * state their arithmetic over the corpus text) keep hashing. */
  def assetsEncoded(t: T, only: Option[String] = None): Dataset[Asset] = {
    import t.spark.implicits._
    val base = only.fold(assets(t))(k => assets(t).filter(_.kind == k))
    base.mapPartitions { it =>
      it.map { a =>
        a.kind match {
          case "image" => a.copy(payload = JvmCodec.encodeBmp(a.payload))
          case "audio" => a.copy(payload = JvmCodec.encodeWav(a.payload))
          case _       => a.copy(payload = JvmCodec.encodeFrameContainer(a.payload, 16))
        }
      }
    }
  }

  /** The real decode stage: containers back to content bytes, one codec
    * initialization per partition, rows streamed through in one pass. */
  def decodeAssets(ds: Dataset[Asset]): Dataset[Asset] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val dec = new JvmCodec.ImageDecoder // codec init: once per partition
      it.map { a =>
        a.kind match {
          case "image" => a.copy(payload = dec.decode(a.payload))
          case "audio" => a.copy(payload = JvmCodec.decodeWav(a.payload))
          case _ => a.copy(payload =
            JvmCodec.demuxFrames(a.payload).flatMap(dec.decode).toArray)
        }
      }
    }
  }

  /** The feature-extract stage: mapPartitions so codec setup happens
    * once per partition and rows stream through in one pass. The feature
    * arithmetic is [[FakeCodec.decode]] — shared between the codec-free
    * twin (raw assets) and the real path (decoded containers). */
  def extractFeatures(ds: Dataset[Asset]): Dataset[Feature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map(FakeCodec.decode)
    }
  }

  /** Materialize a narrow post-codec frame once before a global sort or a
    * self-join consumes it (r14). The range partitioner behind a final
    * `orderBy` SAMPLES its child with one full pass before the shuffle
    * computes it again, and a self-join plans two copies of the subtree —
    * either way a map-only decode pipeline with no exchange of its own
    * pays the whole codec chain TWICE (JobProbe r14: m01's wall ≈ 2× m02's
    * single-decode wall with the extra pass attributed to the sampling
    * job). The checkpoint holds only the narrow per-asset rows — blobs
    * never reach it — so its footprint is the OUTPUT size, not the corpus,
    * at any scale. */
  private def decodedOnce(df: DataFrame): DataFrame = df.localCheckpoint()

  /** ONE definition of the decoded-feature frame — the multimodal family's
    * shared plane, like [[TextAnalysis.docTokens]] for the text family:
    * m01 and m02 both contain this CANONICALLY-EQUAL subtree (real encode →
    * real decode → per-asset features), which is what lets
    * `runBatch(sharedFragments)` pay the codec ONCE per window and
    * substitute the cached frame into every sibling. The frame is narrow
    * (7 scalar columns, no blobs) — exactly the fragment granularity the
    * r7 sharing measurements favored: heavy to compute (every byte decoded),
    * cheap to cache. */
  private[graft] def mediaFeatures(t: T): DataFrame =
    extractFeatures(decodeAssets(assetsEncoded(t))).toDF()

  /** End-to-end query: real encode -> real decode -> features + per-kind
    * aggregate, blobs dropped before the shuffle (only narrow feature
    * columns cross stage boundaries). */
  def m01MediaFeatures(t: T): DataFrame = {
    import t.spark.implicits._
    decodedOnce(mediaFeatures(t)
      .select($"asset_id", $"kind", $"n_bytes", $"checksum",
        round($"mean_byte", 4).as("mean_byte"),
        $"thumb_w".cast("long").as("thumb_w"), $"thumb_h".cast("long").as("thumb_h")))
      .orderBy($"asset_id")
  }

  /** Oracle replicates the byte-level arithmetic on the UTF-8 text (ASCII
    * corpus: byte == char code). */
  val m01Oracle: String =
    """SELECT doc_id AS asset_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CAST(length(text) AS BIGINT) AS n_bytes,
         list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(text) + 1),
           i -> ascii(substr(text, i::INT, 1))::BIGINT)),
           (acc, c) -> (acc * 31 + c) % 2147483647) AS checksum,
         ROUND(list_sum(list_transform(range(1, length(text) + 1),
           i -> ascii(substr(text, i::INT, 1))))::DOUBLE / length(text), 4) AS mean_byte,
         CAST(GREATEST(1, (16 + doc_id % 240) // GREATEST(1, (GREATEST(16 + doc_id % 240, 16 + (doc_id * 7) % 240) + 63) // 64)) AS BIGINT) AS thumb_w,
         CAST(GREATEST(1, (16 + (doc_id * 7) % 240) // GREATEST(1, (GREATEST(16 + doc_id % 240, 16 + (doc_id * 7) % 240) + 63) // 64)) AS BIGINT) AS thumb_h
       FROM documents ORDER BY asset_id"""

  /** Per-kind rollup over features (blob-free shuffle), through the real
    * encode/decode pair like m01. */
  def m02MediaRollup(t: T): DataFrame = {
    import t.spark.implicits._
    mediaFeatures(t)
      .groupBy($"kind")
      .agg(count(lit(1)).as("n"),
        sum($"n_bytes").as("total_bytes"),
        // integer aggregate: a double avg here would depend on partial-agg
        // order and can flip the 4th decimal between engines
        sum($"checksum").as("checksum_total"))
      .orderBy($"kind")
  }

  val m02Oracle: String =
    """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         COUNT(*) AS n, SUM(CAST(length(text) AS BIGINT))::BIGINT AS total_bytes,
         SUM(list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(text) + 1),
           i -> ascii(substr(text, i::INT, 1))::BIGINT)),
           (acc, c) -> (acc * 31 + c) % 2147483647))::BIGINT AS checksum_total
       FROM documents GROUP BY 1 ORDER BY kind"""

  final case class Frame(asset_id: Long, frame_idx: Long, n_bytes: Long,
                         checksum: Long)

  /** Frame sampling: video payloads chunk into fixed-size "frames", every
    * `stride`-th one is decoded — the 1-row-in, N-rows-out flatMap shape of
    * real video feature extraction (codec per partition, blobs chunked
    * inside the partition, only narrow per-frame features emitted). A real
    * codec swaps the byte-slice for an FFmpeg frame grab; the plumbing —
    * partition-local iteration, sampling arithmetic, output schema — is what
    * the plan shape exercises. */
  def sampleFrames(ds: Dataset[Asset], frameBytes: Int = 16, stride: Int = 4): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real codec: initialize the demuxer once per partition here
      it.filter(_.kind == "video").flatMap { a =>
        val nFrames = (a.payload.length + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames).filter(_ % stride == 0).map { i =>
          val start = i * frameBytes
          val end = math.min(start + frameBytes, a.payload.length)
          var sum = 0L; var j = start
          while (j < end) { sum = (sum * 31 + (a.payload(j) & 0xff)) % 2147483647L; j += 1 }
          Frame(a.asset_id, i.toLong, (end - start).toLong, sum)
        }
      }
    }
  }

  /** The REAL sampler over the encoded video container: demux the
    * length-prefixed frame stream, decode (ImageIO) only every `stride`-th
    * frame — unsampled frames are seeked past, never decoded, which is the
    * cost property real video sampling depends on. Same output schema and
    * values as the codec-free [[sampleFrames]] twin (lossless frames). */
  def sampleFramesReal(ds: Dataset[Asset], stride: Int = 4): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val dec = new JvmCodec.ImageDecoder // codec init: once per partition
      it.filter(_.kind == "video").flatMap { a =>
        JvmCodec.demuxFrames(a.payload).zipWithIndex.collect {
          case (png, i) if i % stride == 0 =>
            val px = dec.decode(png)
            var sum = 0L; var j = 0
            while (j < px.length) { sum = (sum * 31 + (px(j) & 0xff)) % 2147483647L; j += 1 }
            Frame(a.asset_id, i.toLong, px.length.toLong, sum)
        }
      }
    }
  }

  def m03FrameSample(t: T): DataFrame = {
    import t.spark.implicits._
    // only video assets are demuxed — encode only them (kind is metadata,
    // so the filter prunes before any codec work)
    decodedOnce(sampleFramesReal(assetsEncoded(t, only = Some("video"))).toDF())
      .orderBy($"asset_id", $"frame_idx")
  }

  /** Oracle: frames are 16-char substrings of the UTF-8 text (ASCII corpus),
    * sampled every 4th, checksummed with m01's polynomial.
    *
    * DuckDB `range` takes only constants (no lateral / subquery bound), so
    * the frame index is enumerated to 1024 (= 16 KiB of text, ~30x the
    * generator's 20-50-word cap) and a guard turns a longer doc into a hard
    * oracle ERROR instead of a silent divergence from the unbounded Spark
    * side. */
  val m03Oracle: String =
    """SELECT doc_id AS asset_id, i AS frame_idx,
         CAST(length(sub) AS BIGINT) AS n_bytes,
         list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(sub) + 1),
           j -> ascii(substr(sub, j::INT, 1))::BIGINT)),
           (acc, c) -> (acc * 31 + c) % 2147483647) AS checksum
       FROM (SELECT doc_id, i, substr(text, (i * 16 + 1)::INT, 16) AS sub
             FROM documents, range(0, 1024) r(i)
             WHERE doc_id % 3 = 2 AND i * 16 < length(text) AND i % 4 = 0)
       WHERE (SELECT CASE WHEN max(length(text)) > 16384
                          THEN error('m03 oracle frame cap exceeded: doc longer than 16384 chars')
                          ELSE 1 END FROM documents) = 1
       ORDER BY asset_id, frame_idx"""

  final case class AudioWindow(asset_id: Long, win_idx: Long, n_bytes: Long,
                               energy: Long)

  /** Audio feature extraction: 50%-overlapped sliding windows (32-byte
    * windows, 16-byte hop) over audio payloads, per-window energy = sum of
    * squared byte amplitudes (the RMS/spectrogram-frame shape; a real codec
    * would decode PCM and FFT each window — same partition-local iteration,
    * same output schema). Overlap means the flatMap emits ~2x the payload
    * bytes / hop rows per asset; only the narrow (id, idx, energy) rows
    * survive, never the blobs. */
  def audioWindows(ds: Dataset[Asset], winBytes: Int = 32, hop: Int = 16): Dataset[AudioWindow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real codec: initialize the PCM decoder once per partition here
      it.filter(_.kind == "audio").flatMap { a =>
        val n = a.payload.length
        val nWins = if (n == 0) 0 else (math.max(n - winBytes, 0) / hop) + 1
        Iterator.range(0, nWins).map { i =>
          val start = i * hop
          val end = math.min(start + winBytes, n)
          var e = 0L; var j = start
          while (j < end) { val v = (a.payload(j) & 0xff).toLong; e += v * v; j += 1 }
          AudioWindow(a.asset_id, i.toLong, (end - start).toLong, e)
        }
      }
    }
  }

  def m04AudioWindows(t: T): DataFrame = {
    import t.spark.implicits._
    // real path: WAV-decode (AudioSystem) the audio assets, then window the
    // decoded PCM; image/video rows are filtered before any decode work
    val decoded = assetsEncoded(t, only = Some("audio")).mapPartitions { it =>
      it.map(a => a.copy(payload = JvmCodec.decodeWav(a.payload)))
    }
    decodedOnce(audioWindows(decoded).toDF())
      .orderBy($"asset_id", $"win_idx")
  }

  /** Oracle: windows are 32-char substrings every 16 chars of the UTF-8
    * text (ASCII corpus), energy = sum of squared char codes. Window index
    * enumerated to 1024 (16 KiB text) with the same hard-error cap guard as
    * m03 — a longer doc fails the oracle loudly instead of diverging. */
  val m04Oracle: String =
    """SELECT doc_id AS asset_id, i AS win_idx,
         CAST(length(sub) AS BIGINT) AS n_bytes,
         list_sum(list_transform(range(1, length(sub) + 1),
           j -> ascii(substr(sub, j::INT, 1))::BIGINT
                * ascii(substr(sub, j::INT, 1))))::BIGINT AS energy
       FROM (SELECT doc_id, i, substr(text, (i * 16 + 1)::INT, 32) AS sub
             FROM documents, range(0, 1024) r(i)
             WHERE doc_id % 3 = 1
               AND i <= greatest(length(text) - 32, 0) // 16
               AND length(text) > 0)
       WHERE (SELECT CASE WHEN max(length(text)) > 16384
                          THEN error('m04 oracle window cap exceeded: doc longer than 16384 chars')
                          ELSE 1 END FROM documents) = 1
       ORDER BY asset_id, win_idx"""

  /** Cross-modal alignment manifest: join the text corpus to its embedding
    * table (doc_id = vec_id — the contract a paired multimodal dataset
    * must uphold) and report per (lang, label) pairing counts plus exact
    * integer char totals. A FULL outer join would surface dangling rows on
    * either side; on this corpus the pairing is total, so the manifest
    * doubles as the assertion of that. Shuffle keys on the join id then the
    * (lang, label) group — both standard at any scale. */
  def m05ModalityManifest(t: T): DataFrame = {
    import t.spark.implicits._
    t.documents.select($"doc_id", $"lang", $"n_chars")
      .join(t.embeddings.select($"vec_id", $"label"),
        $"doc_id" === $"vec_id", "full_outer")
      .groupBy($"lang", $"label")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"doc_id".isNull || $"vec_id".isNull, 1L).otherwise(0L)).as("n_dangling"),
        sum(coalesce($"n_chars", lit(0L))).as("total_chars"))
      .select($"lang", $"label".cast("long").as("label"),
        $"n_pairs", $"n_dangling", $"total_chars")
      .orderBy($"lang", $"label")
  }

  val m05Oracle: String =
    """SELECT lang, label::BIGINT AS label, COUNT(*) AS n_pairs,
              SUM(CASE WHEN doc_id IS NULL OR vec_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_dangling,
              SUM(COALESCE(n_chars, 0))::BIGINT AS total_chars
       FROM documents FULL OUTER JOIN embeddings ON doc_id = vec_id
       GROUP BY lang, label ORDER BY lang, label"""

  /** WebDataset-style shard manifest: assets packed into ~16 KiB shards by
    * running payload-byte budget (boundary-crossing rule as p15: a shard is
    * closed by the asset that crosses the budget), reporting per-shard byte
    * total and modality mix — the tar-shard planning step before media
    * training data ships to object storage. Payload bytes never move: the
    * manifest is arithmetic over octet lengths. The global running sum is
    * the same single-window shape as p15 (at 100 TB: per-source sub-shards
    * then a prefix-sum over per-source totals — two window passes, no
    * single-partition bottleneck; documented not implemented, as for p15). */
  /** Default shard byte budget — the registered m06 oracle is generated
    * from this same constant, so only default-budget calls are
    * oracle-comparable; other budgets are for library use. */
  val ShardBudgetBytes: Int = 16384

  def m06ShardManifest(t: T, budgetBytes: Int = ShardBudgetBytes): DataFrame = {
    import t.spark.implicits._
    import org.apache.spark.sql.expressions.Window
    assets(t).toDF()
      .select($"asset_id", $"kind", length($"payload").cast("long").as("n_bytes"))
      .withColumn("cum", sum($"n_bytes").over(
        Window.orderBy($"asset_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("shard_id", expr(s"(cum - n_bytes) DIV $budgetBytes"))
      .groupBy($"shard_id")
      .agg(count(lit(1)).as("n_assets"), sum($"n_bytes").as("shard_bytes"),
        sum(when($"kind" === "image", 1L).otherwise(0L)).as("n_image"),
        sum(when($"kind" === "audio", 1L).otherwise(0L)).as("n_audio"),
        sum(when($"kind" === "video", 1L).otherwise(0L)).as("n_video"),
        min($"asset_id").as("first_asset"), max($"asset_id").as("last_asset"))
      .orderBy($"shard_id")
  }

  /** Oracle: payload bytes == length(text) (ASCII corpus, UTF-8 payload). */
  val m06Oracle: String =
    s"""WITH a AS (SELECT doc_id AS asset_id,
                CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
                length(text)::BIGINT AS n_bytes
         FROM documents),
       c AS (SELECT asset_id, kind, n_bytes,
               SUM(n_bytes) OVER (ORDER BY asset_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             FROM a)
       SELECT ((cum - n_bytes) // $ShardBudgetBytes)::BIGINT AS shard_id,
              COUNT(*) AS n_assets, SUM(n_bytes)::BIGINT AS shard_bytes,
              SUM(CASE WHEN kind = 'image' THEN 1 ELSE 0 END)::BIGINT AS n_image,
              SUM(CASE WHEN kind = 'audio' THEN 1 ELSE 0 END)::BIGINT AS n_audio,
              SUM(CASE WHEN kind = 'video' THEN 1 ELSE 0 END)::BIGINT AS n_video,
              MIN(asset_id) AS first_asset, MAX(asset_id) AS last_asset
       FROM c GROUP BY 1 ORDER BY shard_id"""

  /** Video near-dup pairs by shared frame fingerprints: two videos whose
    * sampled-frame checksum sets overlap ≥ 25% of the smaller set are
    * re-encodes/clips of each other — the multimodal twin of d11's
    * asymmetric containment, run on m03's frame stream instead of text
    * shingles (a real pipeline swaps the checksum for a perceptual hash;
    * the join shape is identical). One shuffle on the fingerprint key,
    * pair space bounded by fingerprint collisions, never video x video. */
  def m07FrameDupPairs(t: T): DataFrame = {
    import t.spark.implicits._
    val frames = sampleFrames(assets(t)).toDF()
      .select($"asset_id", $"checksum").distinct()
    val counts = frames.groupBy($"asset_id").agg(count(lit(1)).as("nf"))
    frames.as("a").join(frames.as("b"),
        $"a.checksum" === $"b.checksum" && $"a.asset_id" < $"b.asset_id")
      .groupBy($"a.asset_id".as("asset_a"), $"b.asset_id".as("asset_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(counts.select($"asset_id".as("asset_a"), $"nf".as("na")), "asset_a")
      .join(counts.select($"asset_id".as("asset_b"), $"nf".as("nb")), "asset_b")
      .select($"asset_a", $"asset_b", $"n_shared",
        expr("n_shared * 10000 DIV least(na, nb)").as("containment_bp"))
      .filter($"containment_bp" >= 2500)
      .orderBy($"asset_a", $"asset_b")
  }

  /** The m03 oracle verbatim as a nested CTE, self-joined on checksum. */
  val m07Oracle: String =
    s"""WITH f0 AS ($m03Oracle),
       frames AS (SELECT DISTINCT asset_id, checksum FROM f0),
       counts AS (SELECT asset_id, COUNT(*) AS nf FROM frames GROUP BY asset_id),
       pairs AS (
         SELECT a.asset_id AS asset_a, b.asset_id AS asset_b, COUNT(*) AS n_shared
         FROM frames a JOIN frames b
           ON a.checksum = b.checksum AND a.asset_id < b.asset_id
         GROUP BY 1, 2)
       SELECT asset_a, asset_b, n_shared,
              (n_shared * 10000 // LEAST(ca.nf, cb.nf))::BIGINT AS containment_bp
       FROM pairs
       JOIN counts ca ON ca.asset_id = asset_a
       JOIN counts cb ON cb.asset_id = asset_b
       WHERE n_shared * 10000 // LEAST(ca.nf, cb.nf) >= 2500
       ORDER BY asset_a, asset_b"""

  /** [[m06ShardManifest]]'s 100 TB form: the running byte budget is kept
    * WITHIN each source (windows keyed by the doc's source) — the per-source
    * sub-shard pass m06's docstring only documented, and what an object-store
    * layout actually wants (each source's shard set is independently
    * append-able). Same boundary-crossing rule; shard ids restart per source. */
  def m09ShardManifestPerSource(t: T, budgetBytes: Int = ShardBudgetBytes): DataFrame = {
    import t.spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val src = t.documents.select($"doc_id".as("asset_id"), $"source")
    assets(t).toDF()
      .select($"asset_id", $"kind", length($"payload").cast("long").as("n_bytes"))
      .join(src, "asset_id")
      .withColumn("cum", sum($"n_bytes").over(
        Window.partitionBy($"source").orderBy($"asset_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("shard_id", expr(s"(cum - n_bytes) DIV $budgetBytes"))
      .groupBy($"source", $"shard_id")
      .agg(count(lit(1)).as("n_assets"), sum($"n_bytes").as("shard_bytes"),
        sum(when($"kind" === "image", 1L).otherwise(0L)).as("n_image"),
        sum(when($"kind" === "audio", 1L).otherwise(0L)).as("n_audio"),
        sum(when($"kind" === "video", 1L).otherwise(0L)).as("n_video"),
        min($"asset_id").as("first_asset"), max($"asset_id").as("last_asset"))
      .orderBy($"source", $"shard_id")
  }

  val m09Oracle: String =
    s"""WITH a AS (SELECT doc_id AS asset_id, source,
                CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
                length(text)::BIGINT AS n_bytes
         FROM documents),
       c AS (SELECT asset_id, source, kind, n_bytes,
               SUM(n_bytes) OVER (PARTITION BY source ORDER BY asset_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             FROM a)
       SELECT source, ((cum - n_bytes) // $ShardBudgetBytes)::BIGINT AS shard_id,
              COUNT(*) AS n_assets, SUM(n_bytes)::BIGINT AS shard_bytes,
              SUM(CASE WHEN kind = 'image' THEN 1 ELSE 0 END)::BIGINT AS n_image,
              SUM(CASE WHEN kind = 'audio' THEN 1 ELSE 0 END)::BIGINT AS n_audio,
              SUM(CASE WHEN kind = 'video' THEN 1 ELSE 0 END)::BIGINT AS n_video,
              MIN(asset_id) AS first_asset, MAX(asset_id) AS last_asset
       FROM c GROUP BY 1, 2 ORDER BY source, shard_id"""

  final case class AudioCorr(asset_id: Long, lag: Long, n_terms: Long,
                             autocorr: Long)

  /** Integer autocorrelation of the decoded PCM at lags 1/2/4 — the
    * periodicity proxy a pitch/voice-activity screen uses, computed over
    * REAL WAV decode (javax.sound) with pure int64 dot products so the
    * oracle can restate it over the corpus char codes. One mapPartitions
    * over audio assets; three narrow rows out per asset. */
  def m10AudioAutocorr(t: T, lags: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    import t.spark.implicits._
    assetsEncoded(t, only = Some("audio")).mapPartitions { it =>
      it.flatMap { a =>
        val pcm = JvmCodec.decodeWav(a.payload)
        lags.iterator.map { lag =>
          var s = 0L; var i = 0
          val n = math.max(pcm.length - lag, 0)
          while (i < n) { s += (pcm(i) & 0xff).toLong * (pcm(i + lag) & 0xff); i += 1 }
          AudioCorr(a.asset_id, lag.toLong, n.toLong, s)
        }
      }
    }.toDF().transform(decodedOnce).orderBy($"asset_id", $"lag")
  }

  val m10Oracle: String =
    """SELECT doc_id AS asset_id, lag,
         GREATEST(length(text) - lag, 0)::BIGINT AS n_terms,
         COALESCE(list_sum(list_transform(range(1, GREATEST(length(text) - lag, 0) + 1),
           i -> ascii(substr(text, i::INT, 1))::BIGINT
                * ascii(substr(text, (i + lag)::INT, 1)))), 0)::BIGINT AS autocorr
       FROM documents, (VALUES (1), (2), (4)) l(lag)
       WHERE doc_id % 3 = 1
       ORDER BY asset_id, lag"""

  final case class Decimated(asset_id: Long, n_out: Long, wsum: Long)

  /** PCM decimation (resample by 2) over REAL WAV decode: each output
    * sample is the truncating mean of an input pair — the cheap anti-alias
    * downsample of an audio-curation pipeline — and the result is
    * fingerprinted with a position-weighted integer sum so the oracle can
    * hash it without carrying arrays. Map-only until the final sort. */
  def m12PcmDecimate(t: T): DataFrame = {
    import t.spark.implicits._
    assetsEncoded(t, only = Some("audio")).mapPartitions { it =>
      it.map { a =>
        val pcm = JvmCodec.decodeWav(a.payload)
        val nOut = pcm.length / 2
        var w = 0L; var i = 0
        while (i < nOut) {
          val y = ((pcm(2 * i) & 0xff) + (pcm(2 * i + 1) & 0xff)) / 2
          w += (i + 1).toLong * y; i += 1
        }
        Decimated(a.asset_id, nOut.toLong, w)
      }
    }.toDF().transform(decodedOnce).orderBy($"asset_id")
  }

  /** Same pair arithmetic over the corpus char codes (lossless WAV carrier),
    * positions from a capped constant range (guarded, p25-style). */
  val m12Oracle: String =
    """SELECT doc_id AS asset_id, (length(text) // 2)::BIGINT AS n_out,
         COALESCE(list_sum(list_transform(range(1, length(text) // 2 + 1),
           i -> i * ((ascii(substr(text, (2 * i - 1)::INT, 1))
                      + ascii(substr(text, (2 * i)::INT, 1))) // 2))), 0)::BIGINT AS wsum
       FROM documents WHERE doc_id % 3 = 1 ORDER BY asset_id"""

  final case class SceneStats(asset_id: Long, n_frames: Long,
                              total_delta: Long, max_delta: Long)

  /** Scene-change score over REAL video decode: demux the frame container,
    * decode every frame (per-partition ImageIO reader), and sum per-pixel
    * absolute deltas between adjacent frames — total motion plus the
    * sharpest cut per asset, the shot-boundary signal a video curation
    * pipeline keys frame sampling on. Map-only; blobs never shuffle. */
  def m13SceneChange(t: T): DataFrame = {
    import t.spark.implicits._
    assetsEncoded(t, only = Some("video")).mapPartitions { it =>
      val dec = new JvmCodec.ImageDecoder // codec init: once per partition
      // empty assets emit no report row — the same domain the oracle's
      // length(text) > 0 states (an empty video has no frames to diff)
      it.filter(_.payload.nonEmpty).map { a =>
        val frames = JvmCodec.demuxFrames(a.payload).map(dec.decode).toArray
        var total = 0L; var mx = 0L; var i = 1
        while (i < frames.length) {
          val p = frames(i - 1); val q = frames(i)
          val n = math.min(p.length, q.length); var s = 0L; var j = 0
          while (j < n) { s += math.abs((p(j) & 0xff) - (q(j) & 0xff)); j += 1 }
          total += s; if (s > mx) mx = s
          i += 1
        }
        SceneStats(a.asset_id, frames.length.toLong, total, mx)
      }
    }.toDF().transform(decodedOnce).orderBy($"asset_id")
  }

  /** Frames are 16-char chunks of the corpus text (lossless BMP frames);
    * the oracle states the same adjacent-chunk delta arithmetic over char
    * codes, offsets bounded by both chunk lengths. */
  val m13Oracle: String =
    """WITH vids AS (
         SELECT doc_id, text, length(text) AS len,
                (length(text) + 15) // 16 AS nf
         FROM documents WHERE doc_id % 3 = 2 AND length(text) > 0),
       deltas AS (
         SELECT doc_id, f,
                SUM(abs(ascii(substr(text, (f * 16 + o + 1)::INT, 1))
                        - ascii(substr(text, ((f + 1) * 16 + o + 1)::INT, 1))))::BIGINT AS s
         FROM vids, range(0, 4096) rf(f), range(0, 16) ro(o)
         WHERE f < nf - 1 AND (f + 1) * 16 + o + 1 <= len
         GROUP BY 1, 2)
       SELECT v.doc_id AS asset_id, v.nf::BIGINT AS n_frames,
              COALESCE(SUM(d.s), 0)::BIGINT AS total_delta,
              COALESCE(MAX(d.s), 0)::BIGINT AS max_delta
       FROM vids v LEFT JOIN deltas d ON d.doc_id = v.doc_id
       WHERE (SELECT CASE WHEN max(length(text)) > 65536
                          THEN error('m13 oracle frame cap exceeded')
                          ELSE 1 END FROM documents) = 1
       GROUP BY 1, 2 ORDER BY asset_id"""

  final case class ImageStats(asset_id: Long, n_px: Long, px_sum: Long,
                              b0: Long, b1: Long, b2: Long, b3: Long)

  /** Per-image brightness statistics over REAL decoded pixels: ImageIO
    * decodes each PNG asset and the 4-bin histogram (value >> 6) plus the
    * integer pixel sum are computed in one pass over the raster — the
    * quality-filter shape (dark/blown-out frame screens) of an image
    * curation pipeline. One mapPartitions, no shuffle until the final sort;
    * only 7 narrow columns leave the decode stage. */
  def m08ImageHistogram(t: T): DataFrame = {
    import t.spark.implicits._
    assetsEncoded(t, only = Some("image")).mapPartitions { it =>
      val dec = new JvmCodec.ImageDecoder // codec init: once per partition
      it.map { a =>
        val px = dec.decode(a.payload)
        val bins = new Array[Long](4)
        var s = 0L; var i = 0
        while (i < px.length) { val v = px(i) & 0xff; s += v; bins(v >> 6) += 1; i += 1 }
        ImageStats(a.asset_id, px.length.toLong, s, bins(0), bins(1), bins(2), bins(3))
      }
    }.toDF().transform(decodedOnce).orderBy($"asset_id")
  }

  /** Oracle: the same arithmetic over the corpus char codes (the PNG is a
    * lossless carrier of exactly those bytes). ASCII means bins 2/3 stay 0
    * — asserted by construction, not assumed. */
  val m08Oracle: String =
    """SELECT doc_id AS asset_id, length(text)::BIGINT AS n_px,
         COALESCE(list_sum(list_transform(range(1, length(text) + 1),
           i -> ascii(substr(text, i::INT, 1))::BIGINT)), 0)::BIGINT AS px_sum,
         COALESCE(list_sum(list_transform(range(1, length(text) + 1),
           i -> CASE WHEN ascii(substr(text, i::INT, 1)) // 64 = 0 THEN 1::BIGINT ELSE 0::BIGINT END)), 0)::BIGINT AS b0,
         COALESCE(list_sum(list_transform(range(1, length(text) + 1),
           i -> CASE WHEN ascii(substr(text, i::INT, 1)) // 64 = 1 THEN 1::BIGINT ELSE 0::BIGINT END)), 0)::BIGINT AS b1,
         COALESCE(list_sum(list_transform(range(1, length(text) + 1),
           i -> CASE WHEN ascii(substr(text, i::INT, 1)) // 64 = 2 THEN 1::BIGINT ELSE 0::BIGINT END)), 0)::BIGINT AS b2,
         COALESCE(list_sum(list_transform(range(1, length(text) + 1),
           i -> CASE WHEN ascii(substr(text, i::INT, 1)) // 64 = 3 THEN 1::BIGINT ELSE 0::BIGINT END)), 0)::BIGINT AS b3
       FROM documents WHERE doc_id % 3 = 0 ORDER BY asset_id"""

  final case class AHashRow(asset_id: Long, ahash: Long)

  /** Perceptual-hash (aHash) image near-dup pairs — d05/d06's SimHash plane
    * re-expressed for PIXELS: decode each image (real ImageIO path), split the
    * pixel stream into 64 strips, set bit s iff strip mean > global mean
    * (exact integer cross-multiplication — no float means), then histogram
    * the Hamming distances of candidate pairs found by d06's pigeonhole
    * blocking (a shared 16-bit chunk — the join key is (chunk_idx,
    * chunk_value); recall 1.0 for Hamming <= 3). Bands of 8 bits: band 0 =
    * dup-grade. This corpus has no planted image dups, so the histogram IS
    * the expected output — it audits how separated the candidate space is.
    * 100 TB: hash is one map pass over the blobs; only 8-byte hashes enter
    * the shuffle. */
  def m11PerceptualHashPairs(t: T): DataFrame = {
    import t.spark.implicits._
    val hashes = assetsEncoded(t, only = Some("image")).mapPartitions { it =>
      val dec = new JvmCodec.ImageDecoder // codec init: once per partition
      // skip empty images: no pixels → no strips → no hash (h=0 would be a
      // fake band-0 key); the oracle drops them structurally (no px rows)
      it.filter(_.payload.nonEmpty).map { a =>
        val px = dec.decode(a.payload)
        val n = px.length
        val stripSum = new Array[Long](64); val stripLen = new Array[Long](64)
        var total = 0L; var i = 0
        while (i < n) {
          val s = (i.toLong * 64 / n).toInt; val v = (px(i) & 0xff).toLong
          stripSum(s) += v; stripLen(s) += 1; total += v; i += 1
        }
        var h = 0L; var s = 0
        while (s < 64) {
          if (stripLen(s) > 0 && stripSum(s) * n > total * stripLen(s)) h |= 1L << s
          s += 1
        }
        AHashRow(a.asset_id, h)
      }
    }.toDF().transform(decodedOnce) // self-joined below: decode once, not per join side
    val chunks = hashes.select($"asset_id", $"ahash", explode(expr(
      "transform(sequence(0, 3), c -> struct(c AS chunk, shiftright(ahash, c * 16) & 65535 AS cval))")).as("ck"))
      .select($"asset_id", $"ahash", $"ck.chunk".as("chunk"), $"ck.cval".as("cval"))
    chunks.as("x").join(chunks.as("y"),
        $"x.chunk" === $"y.chunk" && $"x.cval" === $"y.cval" && $"x.asset_id" < $"y.asset_id")
      .select($"x.asset_id".as("asset_a"), $"y.asset_id".as("asset_b"),
        $"x.ahash".as("ha"), $"y.ahash".as("hb"))
      .distinct()
      .select(expr("cast(bit_count(ha ^ hb) AS bigint) DIV 8").as("hamming_band"))
      .groupBy($"hamming_band").agg(count(lit(1)).as("n_pairs"))
      .orderBy($"hamming_band")
  }

  /** Same strip arithmetic over the corpus char codes (lossless BMP carrier),
    * positions from a capped constant range (guarded, p25-style). */
  val m11Oracle: String =
    """WITH imgs AS (
         SELECT doc_id, text, length(text) AS n FROM documents
         WHERE doc_id % 3 = 0 AND length(text) > 0),
       px AS (
         SELECT doc_id, n, (i * 64) // n AS s,
                ascii(substr(text, i::INT + 1, 1))::BIGINT AS v
         FROM imgs, range(0, 1024) r(i) WHERE i < n),
       strips AS (
         SELECT doc_id, n, s, SUM(v)::BIGINT AS ssum, COUNT(*) AS slen
         FROM px GROUP BY 1, 2, 3),
       tot AS (SELECT doc_id, SUM(v)::BIGINT AS total FROM px GROUP BY 1),
       ahash AS (
         SELECT st.doc_id,
                SUM(CASE WHEN st.ssum * st.n <= tt.total * st.slen THEN 0
                         WHEN st.s = 63 THEN (-9223372036854775807 - 1)
                         ELSE (1::BIGINT << st.s::INT) END)::BIGINT AS h
         FROM strips st JOIN tot tt ON st.doc_id = tt.doc_id GROUP BY 1),
       chunks AS (
         SELECT doc_id, h, c, (h >> (c * 16)::INT) & 65535 AS cval
         FROM ahash, range(0, 4) r(c)),
       cand AS (
         SELECT DISTINCT x.doc_id AS asset_a, y.doc_id AS asset_b,
                x.h AS ha, y.h AS hb
         FROM chunks x JOIN chunks y
           ON x.c = y.c AND x.cval = y.cval AND x.doc_id < y.doc_id)
       SELECT bit_count(xor(ha, hb))::BIGINT // 8 AS hamming_band,
              COUNT(*) AS n_pairs
       FROM cand
       WHERE (SELECT CASE WHEN max(length(text)) > 1024
                          THEN error('m11 oracle position cap exceeded')
                          ELSE 1 END FROM documents) = 1
       GROUP BY 1 ORDER BY hamming_band"""

  final case class Loudness(asset_id: Long, n_samples: Long, peak: Long,
                            rms_micro: Long, gain_bp: Long)

  /** Loudness-normalization report over REAL WAV decode: per audio asset,
    * peak sample, RMS in floored micro-units, and the linear gain (bp) to
    * reach a target RMS of 64 — the numbers an audio-ingest pipeline
    * writes next to each clip so training-time normalization is a column
    * multiply, not a second decode pass. Integer peak/sum-of-squares, one
    * sqrt + one division per asset (identical IEEE ops both engines —
    * deliberately NO dB log: cross-libm log10 is not bit-stable, a ratio
    * is). Map-only over the decode stage; payloads never shuffle. */
  def m14AudioLoudness(t: T): DataFrame = {
    import t.spark.implicits._
    assetsEncoded(t, only = Some("audio")).mapPartitions { it =>
      it.map { a =>
        val pcm = JvmCodec.decodeWav(a.payload)
        var peak = 0L; var sumSq = 0L; var i = 0
        while (i < pcm.length) {
          val v = (pcm(i) & 0xff).toLong
          if (v > peak) peak = v
          sumSq += v * v; i += 1
        }
        val n = pcm.length.toLong
        val rms = if (n > 0) math.sqrt(sumSq.toDouble / n) else 0.0
        Loudness(a.asset_id, n, peak,
          if (n > 0) math.floor(rms * 1e6).toLong else 0L,
          if (rms > 0) math.floor(64.0 * 10000.0 / rms).toLong else 0L)
      }
    }.toDF().transform(decodedOnce).orderBy($"asset_id")
  }

  val m14Oracle: String =
    """WITH pcm AS (
         SELECT doc_id AS asset_id, length(text)::BIGINT AS n,
                COALESCE(list_max(list_transform(range(1, length(text) + 1),
                  i -> ascii(substr(text, i::INT, 1))::BIGINT)), 0) AS peak,
                list_sum(list_transform(range(1, length(text) + 1),
                  i -> ascii(substr(text, i::INT, 1))::BIGINT
                     * ascii(substr(text, i::INT, 1))::BIGINT))::BIGINT AS sum_sq
         FROM documents WHERE doc_id % 3 = 1)
       SELECT asset_id, n AS n_samples, peak,
              CASE WHEN n > 0
                THEN floor(sqrt(sum_sq / n) * 1000000.0)::BIGINT ELSE 0 END AS rms_micro,
              CASE WHEN n > 0 AND sum_sq > 0
                THEN floor(64.0 * 10000.0 / sqrt(sum_sq / n))::BIGINT ELSE 0 END AS gain_bp
       FROM pcm ORDER BY asset_id"""

  /** Codec-regression audit: the real-codec feature frame ([[mediaFeatures]]
    * — encode→decode→extract) joined per-asset against the codec-free twin
    * (features straight off the raw corpus bytes). Every shipped container
    * is lossless, so checksum/byte-count/mean must agree EXACTLY; the oracle
    * states that expectation (`n_match = n` per kind), which makes this a
    * loud gate — any codec defect (truncated WAV header math, PNG bit-depth
    * drift, a frame lost in the demux) breaks the hash instead of shipping
    * silently. Production shape: runs the codec once over every blob
    * (mapPartitions, one decoder per partition), joins narrow feature rows
    * only — the blobs never reach the join. */
  def m15DecodeParity(t: T): DataFrame = {
    import t.spark.implicits._
    val twin = extractFeatures(assets(t)).toDF()
      .select($"asset_id", $"n_bytes".as("t_bytes"), $"checksum".as("t_checksum"),
        $"mean_byte".as("t_mean"))
    mediaFeatures(t)
      .join(twin, "asset_id")
      .groupBy($"kind")
      .agg(count(lit(1)).as("n"),
        sum(when($"n_bytes" === $"t_bytes" && $"checksum" === $"t_checksum" &&
          $"mean_byte" === $"t_mean", 1L).otherwise(0L)).as("n_match"),
        sum($"n_bytes").as("total_bytes"))
      .orderBy($"kind")
  }

  /** The oracle asserts full parity: a lossless codec must reproduce the
    * corpus bytes, so n_match == n and total_bytes == the text byte mass. */
  val m15Oracle: String =
    """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         COUNT(*) AS n, COUNT(*) AS n_match,
         SUM(CAST(length(text) AS BIGINT))::BIGINT AS total_bytes
       FROM documents GROUP BY 1 ORDER BY kind"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_features" -> ((s, d) => m01MediaFeatures(T(s, d))),
    "m02_media_rollup"   -> ((s, d) => m02MediaRollup(T(s, d))),
    "m03_frame_sample"   -> ((s, d) => m03FrameSample(T(s, d))),
    "m04_audio_windows"  -> ((s, d) => m04AudioWindows(T(s, d))),
    "m05_modality_manifest" -> ((s, d) => m05ModalityManifest(T(s, d))),
    "m06_shard_manifest"    -> ((s, d) => m06ShardManifest(T(s, d))),
    "m07_frame_dup_pairs"   -> ((s, d) => m07FrameDupPairs(T(s, d))),
    "m08_image_histogram"   -> ((s, d) => m08ImageHistogram(T(s, d))),
    "m09_shards_per_source" -> ((s, d) => m09ShardManifestPerSource(T(s, d))),
    "m10_audio_autocorr"    -> ((s, d) => m10AudioAutocorr(T(s, d))),
    "m11_phash_pairs"       -> ((s, d) => m11PerceptualHashPairs(T(s, d))),
    "m12_pcm_decimate"      -> ((s, d) => m12PcmDecimate(T(s, d))),
    "m13_scene_change"      -> ((s, d) => m13SceneChange(T(s, d))),
    "m14_audio_loudness"    -> ((s, d) => m14AudioLoudness(T(s, d))),
    "m15_decode_parity"     -> ((s, d) => m15DecodeParity(T(s, d))),
  )

  val oracles: Map[String, String] = Map(
    "m01_media_features" -> m01Oracle,
    "m02_media_rollup"   -> m02Oracle,
    "m03_frame_sample"   -> m03Oracle,
    "m04_audio_windows"  -> m04Oracle,
    "m05_modality_manifest" -> m05Oracle,
    "m06_shard_manifest"    -> m06Oracle,
    "m07_frame_dup_pairs"   -> m07Oracle,
    "m08_image_histogram"   -> m08Oracle,
    "m09_shards_per_source" -> m09Oracle,
    "m10_audio_autocorr"    -> m10Oracle,
    "m11_phash_pairs"       -> m11Oracle,
    "m12_pcm_decimate"      -> m12Oracle,
    "m13_scene_change"      -> m13Oracle,
    "m14_audio_loudness"    -> m14Oracle,
    "m15_decode_parity"     -> m15Oracle,
  )
}
