package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `mg_candidates(keyHash, k)` — a mergeable Misra–Gries frequency
  * summary over bigint keys: at most `k` counters, returned as the
  * surviving keys sorted ascending (an `array<bigint>`).
  *
  * Contract (the MG survivor guarantee, and why it makes EXACT heavy
  * hitters cheap at 100 TB): after any sequence of updates and merges
  * over `n` rows, every key with true frequency > n/(k+1) still holds a
  * counter — undercount is bounded by n/(k+1) under ARBITRARY merge
  * trees (Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable
  * Summaries", PODS'12, §3). So the exact query "all keys with count ≥
  * φ·n" never needs the full `groupBy(key)` — which shuffles EVERY
  * distinct key (for n-gram vocabularies: billions of rows for a
  * hundred-row answer). Instead: (1) one pass building k-counter
  * partials map-side (this aggregate — the shuffle carries ≤ k rows per
  * partition), (2) an exact recount of the ≤ k candidates behind an
  * `InSet` probe, where partial aggregation sees only candidate rows.
  * [[graft.operators.Sketches.heavyHitters]] wires the two passes and
  * pins the threshold arithmetic that keeps the result exact.
  *
  * Determinism: the CANDIDATE SET is merge-order dependent below the
  * guarantee line (two plans may disagree about which light keys
  * survive) — that is inherent to MG and harmless, because the recount
  * pass filters to the exact answer, which IS invariant under
  * repartitioning (pinned by spec and ScaleCheck). The array is sorted
  * ascending only to make the intermediate inspectable; counts are NOT
  * exposed — MG lower bounds are also merge-order dependent, and
  * publishing them would put nondeterminism in user-visible output.
  *
  * Keys are bigint by design: callers hash arbitrary key types through
  * `xxhash64` first. Hash collisions only MERGE counters, so a heavy
  * key's hash counts at least the key's own frequency — the survivor
  * guarantee is preserved and the recount (which groups by the REAL
  * key) stays exact; a collision merely admits one spurious candidate.
  */
case class MisraGries(
    key: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries.Buf] {

  require(k >= 1, s"mg_candidates: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = key.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_candidates requires a bigint key (hash non-long keys with " +
        s"xxhash64 first), got ${other.catalogString}")
  }

  override def createAggregationBuffer(): MisraGries.Buf =
    new MisraGries.Buf(k)

  override def update(buf: MisraGries.Buf, input: InternalRow): MisraGries.Buf = {
    val v = key.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: MisraGries.Buf, other: MisraGries.Buf): MisraGries.Buf = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MisraGries.Buf): Any = {
    val keys = buf.counts.keysIterator.toArray
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys)
  }

  override def serialize(buf: MisraGries.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.counts.size * 16)
    bb.putInt(buf.counts.size)
    buf.counts.foreach { case (key, cnt) => bb.putLong(key); bb.putLong(cnt) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGries.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MisraGries.Buf(k)
    var i = 0
    while (i < n) { buf.counts.update(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(key = newChildren(0))

  override def prettyName: String = "mg_candidates"
}

object MisraGries {
  /** k-counter MG summary. `counts` holds strictly positive counters for
    * at most k keys; the decrement step is the classic spread-the-
    * overflow: each decrement of a full buffer pays down one earlier
    * increment, so update cost is O(1) amortized per row.
    */
  final class Buf(val k: Int) {
    val counts: mutable.LongMap[Long] = new mutable.LongMap[Long](k * 2)

    def add(key: Long, by: Long): Unit = {
      // counters are strictly positive, so 0 is a safe absent sentinel
      val cur = counts.getOrElse(key, 0L)
      if (cur > 0L) {
        counts.update(key, cur + by)
      } else if (counts.size < k) {
        counts.update(key, by)
      } else {
        // full and key absent: decrement ALL counters by the incoming
        // weight (the merge-ready generalization of decrement-by-1);
        // any counter driven to <= 0 frees a slot, and the remainder of
        // the incoming weight (by - m where m is the smallest decrement
        // absorbed) is bounded by the same n/(k+1) error budget.
        val m = math.min(by, minCount())
        decrementAll(m)
        if (by > m) counts.update(key, by - m)
      }
    }

    def mergeFrom(other: Buf): Unit = {
      other.counts.foreach { case (key, cnt) =>
        counts.update(key, counts.getOrElse(key, 0L) + cnt)
      }
      if (counts.size > k) {
        // subtract the (k+1)-th largest count from everything: exactly
        // the Mergeable Summaries §3 merge, keeps the union's error
        // within (n1 + n2)/(k+1).
        val vals = counts.valuesIterator.toArray
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - (k + 1))
        decrementAll(cut)
      }
    }

    private def minCount(): Long = {
      var m = Long.MaxValue
      counts.foreachValue(v => if (v < m) m = v)
      m
    }

    /** Snapshot-then-rebuild: LongMap is open-addressing, so removals
      * during its own foreach are not safe; a k-sized copy per overflow
      * is already paid for by the O(k) decrement itself.
      */
    private def decrementAll(by: Long): Unit = {
      if (by <= 0) return
      val keys = new Array[Long](counts.size)
      val vals = new Array[Long](counts.size)
      var i = 0
      counts.foreach { case (key, cnt) => keys(i) = key; vals(i) = cnt; i += 1 }
      counts.clear()
      var j = 0
      while (j < i) {
        if (vals(j) > by) counts.update(keys(j), vals(j) - by)
        j += 1
      }
    }
  }
}
