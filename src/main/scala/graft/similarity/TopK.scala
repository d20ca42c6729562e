package graft.similarity

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer ordered by (cos desc, id asc). The head of the
  * heap is the WORST retained entry, so insertion is O(log k) and the
  * buffer never exceeds k pairs.
  */
final class TopKBuf(val k: Int) {
  // worst-first ordering: lower cos is worse; on ties, HIGHER id is worse
  private val heap = new java.util.PriorityQueue[(Double, Long)](
    math.max(k, 1),
    (a: (Double, Long), b: (Double, Long)) =>
      if (a._1 != b._1) java.lang.Double.compare(a._1, b._1)
      else java.lang.Long.compare(b._2, a._2))

  def insert(cos: Double, id: Long): Unit = {
    if (heap.size < k) heap.offer((cos, id))
    else {
      val w = heap.peek()
      val better = cos > w._1 || (cos == w._1 && id < w._2)
      if (better) { heap.poll(); heap.offer((cos, id)) }
    }
  }

  def mergeFrom(other: TopKBuf): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val (c, i) = it.next(); insert(c, i) }
  }

  /** Entries best-first: (cos desc, id asc). */
  def sorted: Array[(Double, Long)] = {
    val arr = heap.toArray(new Array[(Double, Long)](heap.size))
    arr.sortBy { case (c, i) => (-c, i) }
  }

  def serialize(): Array[Byte] = {
    val arr = sorted
    val bb = ByteBuffer.allocate(4 + 4 + arr.length * 16)
    bb.putInt(k); bb.putInt(arr.length)
    arr.foreach { case (c, i) => bb.putDouble(c); bb.putLong(i) }
    bb.array()
  }
}

object TopKBuf {
  def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuf(bb.getInt)
    var n = bb.getInt
    while (n > 0) { buf.insert(bb.getDouble, bb.getLong); n -= 1 }
    buf
  }
}

/** Partial top-k aggregate: per-group array<struct<cos,neighbor_id>> of
  * the k best (cos desc, id asc) pairs. Being a TypedImperativeAggregate
  * it participates in partial aggregation — each map task pre-reduces its
  * partition to at most k pairs per group BEFORE the shuffle, so the
  * exchange carries O(groups × k × partitions) rows instead of the full
  * |queries| × |corpus| candidate set the row_number window shuffled
  * (round-1 verdict, brute-force ANN note).
  */
case class TopKPairsAgg(
    cos: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  override def children: Seq[Expression] = Seq(cos, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false))))

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buffer: TopKBuf, input: InternalRow): TopKBuf = {
    val c = cos.eval(input)
    val i = id.eval(input)
    if (c != null && i != null)
      buffer.insert(c.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuf, other: TopKBuf): TopKBuf = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: TopKBuf): Any = {
    val rows: Array[Any] = buffer.sorted.map { case (c, i) =>
      InternalRow(c, i): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKBuf): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TopKBuf =
    TopKBuf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(cos = newChildren(0), id = newChildren(1))
  override def prettyName: String = "graft_topk_pairs"
}
