package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `topk_longs(x, k)`: the k largest bigint values of the group, sorted
  * descending — per-group top-k as ONE aggregation instead of a window.
  *
  * Scale rationale: the window encoding (`row_number() <= k`) must shuffle
  * every surviving row to its group's partition before ranking (Spark's
  * WindowGroupLimit trims to k per input partition first, but the sort
  * machinery still runs); a TypedImperativeAggregate carries a bounded
  * k-slot buffer through the normal partial/final aggregation path, so each
  * map task ships exactly one k-element state per group — the same shape as
  * `max()`, generalized. The classic "top products per region over 100 TB"
  * aggregation. Buffer ops are O(k) linear scans (k is small by contract);
  * ties are resolved by value only, so the output array is deterministic
  * under any partial-aggregation order.
  */
case class TopKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKLongs.Buf] {

  require(k >= 1 && k <= (1 << 20), s"topk_longs k out of range: $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "topk_longs"

  override def createAggregationBuffer(): TopKLongs.Buf = new TopKLongs.Buf(k)

  override def update(buf: TopKLongs.Buf, input: InternalRow): TopKLongs.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKLongs.Buf, other: TopKLongs.Buf): TopKLongs.Buf = {
    var i = 0
    while (i < other.n) { buf.add(other.values(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKLongs.Buf): Any =
    new GenericArrayData(buf.sortedDesc)

  override def serialize(buf: TopKLongs.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): TopKLongs.Buf = {
    val bb = ByteBuffer.wrap(storage)
    val n = bb.getInt
    val buf = new TopKLongs.Buf(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLongs =
    copy(child = newChildren.head)
}

/** `topk_scored(score, id, k[, largest])`: the k best `(score, id)` pairs of
  * the group as `array<struct<score double, id bigint>>`, ordered best-first
  * — `largest=true` (default) keeps the k largest scores (score DESC, id ASC
  * on ties), `largest=false` the k smallest (score ASC, id ASC).
  *
  * This is the production shape for every per-query ANN ranking stage: the
  * window encoding (`row_number() OVER (PARTITION BY query ORDER BY score)
  * <= k`) must exchange EVERY candidate pair to its query's partition and
  * sort it, so a candidate join emitting O(n·q/k_clusters) rows pays a full
  * shuffle+sort of the pair stream (measured: 174 of s04's 227 s at the 40×
  * probe was the window exchange). As a TypedImperativeAggregate the top-k
  * runs inside normal partial aggregation: each map task ships one k-slot
  * buffer per query, the exchange carries |queries|·k rows, and no sort
  * runs anywhere. Ordering is total on (score, id), so the result is
  * deterministic under any partial-merge order.
  */
case class TopKScored(
    score: Expression,
    id: Expression,
    k: Int,
    largest: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKScored.Buf] {

  require(k >= 1 && k <= (1 << 20), s"topk_scored k out of range: $k")

  override def children: Seq[Expression] = score :: id :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = TopKScored.resultType
  override def prettyName: String = "topk_scored"

  override def createAggregationBuffer(): TopKScored.Buf = new TopKScored.Buf(k, largest)

  override def update(buf: TopKScored.Buf, input: InternalRow): TopKScored.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKScored.Buf, other: TopKScored.Buf): TopKScored.Buf = {
    var i = 0
    while (i < other.n) { buf.add(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKScored.Buf): Any = {
    val (ss, is) = buf.sortedBestFirst
    val rows = new Array[Any](ss.length)
    var i = 0
    while (i < ss.length) {
      rows(i) = InternalRow(ss(i), is(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKScored.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): TopKScored.Buf = {
    val bb = ByteBuffer.wrap(storage)
    val n = bb.getInt
    val buf = new TopKScored.Buf(k, largest)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScored =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKScored =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKScored =
    copy(score = newChildren.head, id = newChildren(1))
}

object TopKScored {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  /** Bounded k-slot (score, id) buffer; the worst slot is replaced when a
    * strictly better pair arrives. `better` is the total order (score DESC,
    * id ASC) when largest, (score ASC, id ASC) when smallest. */
  final class Buf(k: Int, largest: Boolean) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var n = 0

    private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      if (s1 != s2) { if (largest) s1 > s2 else s1 < s2 } else i1 < i2

    def add(s: Double, i: Long): Unit =
      if (n < k) { scores(n) = s; ids(n) = i; n += 1 }
      else {
        var wi = 0
        var j = 1
        while (j < n) {
          if (better(scores(wi), ids(wi), scores(j), ids(j))) wi = j
          j += 1
        }
        if (better(s, i, scores(wi), ids(wi))) { scores(wi) = s; ids(wi) = i }
      }

    def sortedBestFirst: (Array[Double], Array[Long]) = {
      val idx = Array.tabulate(n)(identity)
      val boxed = idx.sortWith((a, b) => better(scores(a), ids(a), scores(b), ids(b)))
      (boxed.map(scores), boxed.map(ids))
    }
  }
}

/** `topk_scored_str(score, id, k[, largest])`: [[TopKScored]] with STRING
  * ids — the per-group top-k where the tie-break (and identity) is a token
  * rather than a numeric id, e.g. "top terms per doc/lang" over a word
  * census. Ordering is (score DESC|ASC, id ASC in binary/UTF8 order —
  * exactly Spark's and DuckDB's default string sort). Same scale shape as
  * TopKScored: a k-slot buffer through partial aggregation instead of a
  * window exchange+sort of the full census. Input UTF8Strings are cloned
  * into the buffer (the row's backing bytes are reused by the scanner). */
case class TopKScoredStr(
    score: Expression,
    id: Expression,
    k: Int,
    largest: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKScoredStr.Buf] {

  require(k >= 1 && k <= (1 << 20), s"topk_scored_str k out of range: $k")

  override def children: Seq[Expression] = score :: id :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = TopKScoredStr.resultType
  override def prettyName: String = "topk_scored_str"

  override def createAggregationBuffer(): TopKScoredStr.Buf =
    new TopKScoredStr.Buf(k, largest)

  override def update(buf: TopKScoredStr.Buf, input: InternalRow): TopKScoredStr.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: TopKScoredStr.Buf, other: TopKScoredStr.Buf): TopKScoredStr.Buf = {
    var i = 0
    while (i < other.n) { buf.add(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKScoredStr.Buf): Any = {
    val (ss, is) = buf.sortedBestFirst
    val rows = new Array[Any](ss.length)
    var i = 0
    while (i < ss.length) {
      rows(i) = InternalRow(ss(i), is(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKScoredStr.Buf): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < buf.n) { bytes += buf.ids(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(4 + 12 * buf.n + bytes)
    bb.putInt(buf.n)
    i = 0
    while (i < buf.n) {
      bb.putDouble(buf.scores(i))
      val b = buf.ids(i).getBytes
      bb.putInt(b.length)
      bb.put(b)
      i += 1
    }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): TopKScoredStr.Buf = {
    val bb = ByteBuffer.wrap(storage)
    val n = bb.getInt
    val buf = new TopKScoredStr.Buf(k, largest)
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.add(s, UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScoredStr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKScoredStr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKScoredStr =
    copy(score = newChildren.head, id = newChildren(1))
}

object TopKScoredStr {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", StringType, nullable = false))),
    containsNull = false)

  /** Bounded k-slot (score, UTF8String id) buffer; total order (score
    * DESC|ASC, id binary ASC). */
  final class Buf(k: Int, largest: Boolean) {
    val scores = new Array[Double](k)
    val ids = new Array[UTF8String](k)
    var n = 0

    private def better(s1: Double, i1: UTF8String, s2: Double, i2: UTF8String): Boolean =
      if (s1 != s2) { if (largest) s1 > s2 else s1 < s2 } else i1.compareTo(i2) < 0

    def add(s: Double, i: UTF8String): Unit =
      if (n < k) { scores(n) = s; ids(n) = i; n += 1 }
      else {
        var wi = 0
        var j = 1
        while (j < n) {
          if (better(scores(wi), ids(wi), scores(j), ids(j))) wi = j
          j += 1
        }
        if (better(s, i, scores(wi), ids(wi))) { scores(wi) = s; ids(wi) = i }
      }

    def sortedBestFirst: (Array[Double], Array[UTF8String]) = {
      val idx = Array.tabulate(n)(identity)
      val sorted = idx.sortWith((a, b) => better(scores(a), ids(a), scores(b), ids(b)))
      (sorted.map(scores), sorted.map(ids))
    }
  }
}

object TopKLongs {
  /** Bounded k-slot buffer; smallest element replaced on overflow. */
  final class Buf(k: Int) {
    val values = new Array[Long](k)
    var n = 0
    def add(v: Long): Unit =
      if (n < k) { values(n) = v; n += 1 }
      else {
        var mi = 0
        var i = 1
        while (i < n) { if (values(i) < values(mi)) mi = i; i += 1 }
        if (v > values(mi)) values(mi) = v
      }
    def sortedDesc: Array[Long] = {
      val out = java.util.Arrays.copyOf(values, n)
      java.util.Arrays.sort(out)
      var i = 0
      while (i < out.length / 2) {
        val t = out(i); out(i) = out(out.length - 1 - i); out(out.length - 1 - i) = t
        i += 1
      }
      out
    }
  }
}
