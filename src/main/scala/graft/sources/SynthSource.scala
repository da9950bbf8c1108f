package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic-corpus generator — a zero-I/O `documents`-shaped
  * table of any size, for exercising the engine beyond what fits on disk
  * (`spark.read.format("graft.sources.SynthSource").option("rows", 10^9)`).
  *
  * The custom-source lane of the capability surface (the reference's only
  * extension point was "ship a jar with your RDD code"; DSv2 is the modern
  * contract): implements column pruning (unrequested columns are never
  * generated — `text` is the expensive one) and doc_id range-filter pushdown
  * (the generated id range shrinks BEFORE partition planning, the generator's
  * equivalent of partition pruning). Deterministic: row content is a pure
  * function of doc_id (splitmix-style LCG), so reads are reproducible across
  * partitionings and plans.
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynthTable(properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val words = Array("key", "agg", "row", "scan", "slow", "fast",
    "table", "value", "part", "hash", "merge", "batch", "spark", "line",
    "sort", "window", "the", "a", "data", "column")
  private val langs = Array("en", "es", "fr", "de", "zh")

  def langFor(id: Long): String = langs(Math.floorMod(id, langs.length).toInt)

  /** 20-50 words drawn from an LCG seeded by doc_id — pure and stable. */
  def textFor(id: Long): String = {
    var x = id * 6364136223846793005L + 1442695040888963407L
    val n = 20 + Math.floorMod(x >>> 16, 31).toInt
    val sb = new java.lang.StringBuilder(n * 6)
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      if (i > 0) sb.append(' ')
      sb.append(words(Math.floorMod(x >>> 8, words.length).toInt))
      i += 1
    }
    sb.toString
  }
}

/** Value equality matters: two separate `spark.read...load()` calls build two
  * Table instances, and CacheManager substitution (plan `sameResult`) only
  * recognizes them as the same relation if the tables compare equal — the
  * hook the work-sharing layer's v2 scan sharing rests on. */
private case class SynthTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name: String = s"graft_synth($rows rows)"
  override def schema: StructType = SynthSource.schema
  override def capabilities: util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts,
      options.getOrDefault("rowsPerBatch", "0").toLong)
}

private class SynthScanBuilder(rows: Long, parts: Int, rowsPerBatch: Long)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = SynthSource.schema
  private var lo = 0L
  private var hi = rows // generated id range [lo, hi)
  private var pushed = Array.empty[Filter]

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def asLong(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue())
      case _ => None
    }
    val (supported, residual) = filters.partition {
      case GreaterThan("doc_id", v) => asLong(v).isDefined
      case GreaterThanOrEqual("doc_id", v) => asLong(v).isDefined
      case LessThan("doc_id", v) => asLong(v).isDefined
      case LessThanOrEqual("doc_id", v) => asLong(v).isDefined
      case EqualTo("doc_id", v) => asLong(v).isDefined
      case _ => false
    }
    supported.foreach {
      case GreaterThan("doc_id", v) => lo = math.max(lo, asLong(v).get + 1)
      case GreaterThanOrEqual("doc_id", v) => lo = math.max(lo, asLong(v).get)
      case LessThan("doc_id", v) => hi = math.min(hi, asLong(v).get)
      case LessThanOrEqual("doc_id", v) => hi = math.min(hi, asLong(v).get + 1)
      case EqualTo("doc_id", v) =>
        lo = math.max(lo, asLong(v).get); hi = math.min(hi, asLong(v).get + 1)
      case _ =>
    }
    pushed = supported
    residual // range handling is exact, nothing else needs re-evaluation
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SynthScan(lo, math.max(lo, hi), parts, required, rowsPerBatch)
}

private class SynthScan(lo: Long, hi: Long, parts: Int, required: StructType,
                        rowsPerBatch: Long = 0L)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  /** Same pruned/pushed-down scan as a micro-batch stream: offsets are doc
    * ids, each trigger admits `rowsPerBatch` more rows (0 = everything at
    * once). Column pruning and range pushdown apply to the stream too — a
    * filtered readStream never generates the pruned rows or columns. */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SynthMicroBatchStream(lo, hi, parts, required, rowsPerBatch)
  /** Honest size estimate (~190 B/row of generated text) — consumed by the
    * work-sharing cost model (ShareDetector builds a throwaway scan to ask)
    * and by anything else that plans off v2 statistics. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of((hi - lo) * 190L)
    override def numRows(): util.OptionalLong = util.OptionalLong.of(hi - lo)
  }
  /** Shows the pruned range + columns in explain output (asserted in spec). */
  override def description(): String =
    s"SynthScan[$lo,$hi) cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val total = hi - lo
    val n = math.max(1, parts)
    (0 until n).map { i =>
      SynthPartition(lo + i * total / n, lo + (i + 1) * total / n): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

private case class SynthPartition(start: Long, end: Long) extends InputPartition

/** Doc-id offset for the streaming read (connector-API Offset, JSON = the id). */
private case class SynthOffset(id: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = id.toString
}

/** Micro-batch view of the generator: the unread id range [lo, hi) drains in
  * `rowsPerBatch` admission steps (0 = all at once). Implements
  * SupportsAdmissionControl so each trigger's end offset is computed FROM
  * the checkpointed start offset — the stream object keeps no watermark
  * state, which makes restart trivially correct (a fresh instance given
  * start=N continues at N; the restart spec proves committed rows are never
  * re-emitted). Purely deterministic: replaying any offset range
  * regenerates identical rows, the replayable-source contract Structured
  * Streaming requires for end-to-end exactly-once. */
private class SynthMicroBatchStream(lo: Long, hi: Long, parts: Int,
                                    required: StructType, rowsPerBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  override def initialOffset(): Offset = SynthOffset(lo)

  /** Trigger.AvailableNow: the end offset is the static `hi` — nothing to
    * snapshot. Declaring support keeps Spark on the admission-control path
    * (multiple capped batches) instead of the one-shot Trigger.Once
    * fallback it uses for non-supporting sources. */
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def getDefaultReadLimit: ReadLimit =
    if (rowsPerBatch <= 0) ReadLimit.allAvailable()
    else ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[SynthOffset].id
    // Trigger.AvailableNow wraps the source's own limit in a
    // CompositeReadLimit — honor any embedded ReadMaxRows so the admission
    // cap survives the wrapping instead of draining the range in one batch
    def maxRowsOf(l: ReadLimit): Option[Long] = l match {
      case m: ReadMaxRows => Some(m.maxRows())
      case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        c.getReadLimits.toSeq.flatMap(maxRowsOf(_)).reduceOption(_ min _)
      case _ => None
    }
    val end = maxRowsOf(limit).fold(hi)(m => math.min(hi, start + m))
    SynthOffset(math.max(start, end))
  }

  /** Spark calls the admission-control overload when it is implemented. */
  override def latestOffset(): Offset =
    throw new IllegalStateException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def reportLatestOffset(): Offset = SynthOffset(hi)

  override def deserializeOffset(json: String): Offset = SynthOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SynthOffset].id
    val e = end.asInstanceOf[SynthOffset].id
    val total = math.max(0L, e - s)
    val n = math.max(1, parts)
    (0 until n).map { i =>
      SynthPartition(s + i * total / n, s + (i + 1) * total / n): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private class SynthReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SynthPartition]
    // resolve column generators once per partition, not per row
    val gens: Array[Long => Any] = required.fieldNames.map {
      case "doc_id" => (id: Long) => id
      case "lang" => (id: Long) => UTF8String.fromString(SynthSource.langFor(id))
      case "text" => (id: Long) => UTF8String.fromString(SynthSource.textFor(id))
      case other => sys.error(s"unknown synth column $other")
    }
    new PartitionReader[InternalRow] {
      private var cur = sp.start - 1
      override def next(): Boolean = { cur += 1; cur < sp.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(gens.toIndexedSeq.map(g => g(cur)))
      override def close(): Unit = ()
    }
  }
}
