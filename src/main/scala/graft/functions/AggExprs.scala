package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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
