package graft.sched

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Bounded top-K selection as a partial-aggregable Catalyst aggregate — the
 * scale path for ranked politeness selection (SURVEY §4: replace the
 * per-host `row_number()` window SORT with an O(n log k) bounded heap that
 * combines map-side).
 *
 * `topk_select(k, priority, id)` per group keeps the k best rows by
 * (priority DESC, id ASC) — exactly W1's order with the deterministic
 * url_hash tie-break — and evaluates to the selected ids in rank order.
 * Unlike WindowExec this needs no per-partition full sort, no single
 * partition per hot host beyond the heap, and partial buffers merge, so a
 * hot host's selection parallelizes across map tasks.
 *
 * k is read from the first input row (it is constant within a politeness
 * group: the budget join puts one `allowed` value on every row of a host).
 */
case class TopKSelect(
    kExpr: Expression,
    priority: Expression,
    exetime: Expression,
    id: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKSelect.Buffer] {

  override def children: Seq[Expression] = Seq(kExpr, priority, exetime, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "topk_select"

  override def createAggregationBuffer(): TopKSelect.Buffer = new TopKSelect.Buffer(-1)

  // SQL numeric literals may arrive as Spark Decimal, not java.lang.Number
  @inline private def toD(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }

  // ids are 64-bit hashes: must NOT round-trip through Double (2^53 loss)
  @inline private def toL(v: Any): Long = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toLong
    case n: Number => n.longValue()
  }

  override def update(b: TopKSelect.Buffer, input: InternalRow): TopKSelect.Buffer = {
    if (b.k < 0) {
      val kv = kExpr.eval(input)
      b.setK(if (kv == null) 0 else toD(kv).toInt)
    }
    val p = priority.eval(input)
    val e = exetime.eval(input)
    val i = id.eval(input)
    if (p != null && i != null)
      b.add(toD(p).toInt, if (e == null) 0.0 else toD(e), toL(i))
    b
  }

  override def merge(b: TopKSelect.Buffer, o: TopKSelect.Buffer): TopKSelect.Buffer = {
    if (b.k < 0) b.setK(o.k)
    var i = 0
    while (i < o.size) { b.add(o.prios(i), o.exes(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKSelect.Buffer): Any = new GenericArrayData(b.sortedIds)

  override def serialize(b: TopKSelect.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + b.size * 20)
    bb.putInt(b.k).putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putInt(b.prios(i)).putDouble(b.exes(i)).putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKSelect.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    val b = new TopKSelect.Buffer(-1)
    b.setK(k)
    var i = 0
    while (i < n) { val p = bb.getInt; val e = bb.getDouble; val id = bb.getLong; b.add(p, e, id); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKSelect = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKSelect = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKSelect =
    copy(kExpr = c(0), priority = c(1), exetime = c(2), id = c(3))
}

object TopKSelect {

  /** Bounded worst-first binary heap over W1's order (priority desc,
    * exetime asc, id asc): the root is the WORST kept row, evicted when a
    * better one arrives. */
  final class Buffer(var k: Int) {
    var prios: Array[Int] = Array.empty
    var exes: Array[Double] = Array.empty
    var ids: Array[Long] = Array.empty
    var size: Int = 0

    /** k is a LIMIT, not a size hint: storage grows geometrically with the
      * rows actually kept, never eagerly to k — a politeness budget of 10^9
      * tokens must cost memory proportional to the rows seen, not to the
      * budget (an eager copyOf(k) here allocated 20 GB per group and took
      * down the round-1 bench). */
    def setK(newK: Int): Unit = { k = math.max(newK, 0) }

    private def grow(): Unit = {
      val cap = math.max(16, math.min(k.toLong, prios.length.toLong * 2).toInt)
      prios = java.util.Arrays.copyOf(prios, cap)
      exes = java.util.Arrays.copyOf(exes, cap)
      ids = java.util.Arrays.copyOf(ids, cap)
    }

    /** a is WORSE than b in keep-order (priority desc, exetime asc, id asc)? */
    @inline private def worse(pa: Int, ea: Double, ia: Long, pb: Int, eb: Double, ib: Long): Boolean =
      pa < pb || (pa == pb && (ea > eb || (ea == eb && ia > ib)))

    def add(p: Int, e: Double, id: Long): Unit = {
      if (k <= 0) return
      if (size < k) {
        if (size == prios.length) grow()
        prios(size) = p; exes(size) = e; ids(size) = id; size += 1
        siftUp(size - 1)
      } else if (worse(prios(0), exes(0), ids(0), p, e, id)) { // better than current worst
        prios(0) = p; exes(0) = e; ids(0) = id
        siftDown(0)
      }
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val parent = (i - 1) >> 1
        if (worse(prios(i), exes(i), ids(i), prios(parent), exes(parent), ids(parent))) {
          swap(i, parent); i = parent
        } else return
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < size && worse(prios(l), exes(l), ids(l), prios(w), exes(w), ids(w))) w = l
        if (r < size && worse(prios(r), exes(r), ids(r), prios(w), exes(w), ids(w))) w = r
        if (w == i) return
        swap(i, w); i = w
      }
    }

    @inline private def swap(a: Int, b: Int): Unit = {
      val tp = prios(a); prios(a) = prios(b); prios(b) = tp
      val te = exes(a); exes(a) = exes(b); exes(b) = te
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    /** ids in final rank order: priority desc, exetime asc, id asc. */
    def sortedIds: Array[Long] = {
      val idx = Array.range(0, size).sortBy(i => (-prios(i), exes(i), ids(i)))
      idx.map(ids(_))
    }
  }
}
