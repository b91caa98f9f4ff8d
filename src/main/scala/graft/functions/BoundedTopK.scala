package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** `top_k_by(score, id, k)` — bounded per-group top-k as ONE mergeable
  * aggregate: the k highest (score, then LOWEST id on ties) pairs,
  * returned as a sorted `array<struct<score double, id bigint>>`.
  *
  * Why an aggregate and not a window: `row_number().over(partitionBy
  * (group).orderBy(...))` must SHUFFLE EVERY CANDIDATE ROW to its
  * group's reducer and sort there — for a retrieval scorer that is
  * |queries| x |corpus| rows through the wire for a k-row answer. This
  * aggregate keeps a k-slot buffer per group inside the partial
  * (map-side) aggregate, so each partition contributes at most k rows
  * per group to the shuffle and the reducer merges presorted k-lists:
  * the wire cost drops from |candidates| to k x |groups| x |partitions|,
  * the classic 100-TB top-k shape.
  *
  * Determinism: the buffer maintains the TOTAL order (score desc,
  * id asc), so the result — including the boundary cut — is independent
  * of row arrival and merge order, bit-identical to the window
  * formulation (pinned by spec under adversarial repartitioning).
  * Ascending rankings (e.g. Hamming distance) negate the score.
  *
  * State is exactly `k` (double, long) slots per group — an insertion
  * sort into a short array (k is retrieval-sized; the O(log k) heap
  * constant loses below k ~ 1000).
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopK.Buf] {

  require(k >= 1, s"top_k_by: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by requires (double score, bigint id), " +
          s"got ${s.catalogString} and ${i.catalogString}")
    }

  override def createAggregationBuffer(): BoundedTopK.Buf =
    new BoundedTopK.Buf(k)

  override def update(buf: BoundedTopK.Buf, input: InternalRow): BoundedTopK.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedTopK.Buf, other: BoundedTopK.Buf): BoundedTopK.Buf = {
    var j = 0
    while (j < other.size) { buf.insert(other.scores(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: BoundedTopK.Buf): Any = {
    val rows = new Array[Any](buf.size)
    var j = 0
    while (j < buf.size) {
      rows(j) = InternalRow(buf.scores(j), buf.ids(j))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: BoundedTopK.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) {
      bb.putDouble(buf.scores(j)); bb.putLong(buf.ids(j)); j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BoundedTopK.Buf(k)
    buf.size = n
    var j = 0
    while (j < n) { buf.scores(j) = bb.getDouble; buf.ids(j) = bb.getLong; j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k_by"
}

/** `top_k_by_str(score, id, k)` — [[BoundedTopK]] for STRING ids: the k
  * highest (score desc, then LOWEST id by binary UTF-8 order on ties)
  * pairs as a sorted `array<struct<score double, id string>>`.
  *
  * Same mergeable map-side-partial shape and NaN-first total order as
  * the long-id twin; the id tiebreak uses `UTF8String.compareTo`
  * (byte-wise), which is exactly Spark's `string asc` sort order, so the
  * result stays bit-identical to the `row_number` window formulation it
  * replaces. Ids are CLONED on insert — the eval-time `UTF8String` may
  * point into a reused unsafe-row buffer.
  */
case class BoundedTopKStr(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopKStr.Buf] {

  require(k >= 1, s"top_k_by_str: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", org.apache.spark.sql.types.StringType,
        nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, org.apache.spark.sql.types.StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by_str requires (double score, string id), " +
          s"got ${s.catalogString} and ${i.catalogString}")
    }

  override def createAggregationBuffer(): BoundedTopKStr.Buf =
    new BoundedTopKStr.Buf(k)

  override def update(buf: BoundedTopKStr.Buf, input: InternalRow): BoundedTopKStr.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double],
        i.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].clone())
    buf
  }

  override def merge(buf: BoundedTopKStr.Buf, other: BoundedTopKStr.Buf): BoundedTopKStr.Buf = {
    var j = 0
    // other's ids were cloned on their own insert — already off-buffer
    while (j < other.size) { buf.insert(other.scores(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: BoundedTopKStr.Buf): Any = {
    val rows = new Array[Any](buf.size)
    var j = 0
    while (j < buf.size) {
      rows(j) = InternalRow(buf.scores(j), buf.ids(j))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: BoundedTopKStr.Buf): Array[Byte] = {
    var bytes = 0
    var j = 0
    while (j < buf.size) { bytes += buf.ids(j).numBytes(); j += 1 }
    val bb = ByteBuffer.allocate(4 + buf.size * 12 + bytes)
    bb.putInt(buf.size)
    j = 0
    while (j < buf.size) {
      bb.putDouble(buf.scores(j))
      val b = buf.ids(j).getBytes
      bb.putInt(b.length); bb.put(b)
      j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopKStr.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BoundedTopKStr.Buf(k)
    buf.size = n
    var j = 0
    while (j < n) {
      buf.scores(j) = bb.getDouble
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf.ids(j) = org.apache.spark.unsafe.types.UTF8String.fromBytes(b)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKStr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKStr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopKStr =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k_by_str"
}

object BoundedTopKStr {
  import org.apache.spark.unsafe.types.UTF8String

  /** k-slot sorted buffer: scores desc, ids asc (binary) on equal score. */
  final class Buf(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[UTF8String](k)
    var size: Int = 0

    /** Total order: score desc with NaN GREATEST (Spark's desc window
      * puts NaN first — see [[BoundedTopK.Buf.before]]), ties by id asc
      * under UTF8String's byte-wise compare (= Spark `string asc`).
      */
    @inline private def before(s1: Double, i1: UTF8String,
        s2: Double, i2: UTF8String): Boolean = {
      val n1 = java.lang.Double.isNaN(s1)
      val n2 = java.lang.Double.isNaN(s2)
      if (n1 || n2) (n1 && !n2) || (n1 && n2 && i1.compareTo(i2) < 0)
      else s1 > s2 || (s1 == s2 && i1.compareTo(i2) < 0)
    }

    def insert(s: Double, i: UTF8String): Unit = {
      if (size == k && !before(s, i, scores(k - 1), ids(k - 1))) return
      var pos = if (size == k) k - 1 else size
      while (pos > 0 && before(s, i, scores(pos - 1), ids(pos - 1))) pos -= 1
      var j = math.min(size, k - 1)
      while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
      scores(pos) = s
      ids(pos) = i
      if (size < k) size += 1
    }
  }
}

object BoundedTopK {
  /** k-slot sorted buffer: scores desc, ids asc on equal score. */
  final class Buf(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size: Int = 0

    /** True iff (s1, i1) ranks strictly before (s2, i2). NaN sorts as
      * GREATER than every double (Spark's window `orderBy(desc)` puts
      * NaN first) — primitive `>` would make NaN incomparable and the
      * buffer arrival/merge-order dependent, breaking the bit-identical-
      * to-window contract on degenerate scores (cos = 0/0 from a
      * zero-norm vector). 0.0 vs -0.0 stays a tie (primitive `==`),
      * matching Spark's double ordering.
      */
    @inline private def before(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val n1 = java.lang.Double.isNaN(s1)
      val n2 = java.lang.Double.isNaN(s2)
      if (n1 || n2) (n1 && !n2) || (n1 && n2 && i1 < i2)
      else s1 > s2 || (s1 == s2 && i1 < i2)
    }

    def insert(s: Double, i: Long): Unit = {
      if (size == k && !before(s, i, scores(k - 1), ids(k - 1))) return
      // find insertion point (short arrays: linear from the tail)
      var pos = if (size == k) k - 1 else size
      while (pos > 0 && before(s, i, scores(pos - 1), ids(pos - 1))) pos -= 1
      // shift tail right (dropping the last slot when full)
      var j = math.min(size, k - 1)
      while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
      scores(pos) = s
      ids(pos) = i
      if (size < k) size += 1
    }
  }
}
