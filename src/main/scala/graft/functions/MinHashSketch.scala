package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `min_hash_sketch(h0)` — the full MinHash signature (all `numHashes`
  * permutation minima) as ONE aggregate over a column of 64-bit shingle
  * hashes.
  *
  * Bit-identical to the declarative formulation
  * `agg(min(xxhash64(h0, lit(p))) for p <- 0 until numHashes)` used by
  * [[graft.operators.Dedup.minHashSignatures]] (pinned by OperatorsSpec):
  * Spark's `xxhash64(h0, p)` folds left over its children, so each
  * permutation value is `hashInt(p, hashLong(h0, 42))` — the imperative
  * loop hoists the per-row `hashLong(h0, 42)` prefix and runs `numHashes`
  * integer hashes against a mutable buffer.
  *
  * Trade-off, measured at numHashes=16: the declarative form wins — 16
  * codegen'd `min` columns live in HashAggregate's unsafe row buffer,
  * while a TypedImperativeAggregate routes through ObjectHashAggregate
  * with per-group serialization. This aggregate is the WIDE-signature
  * path: at numHashes ≥ ~64 the declarative form's one-column-per-
  * permutation row layout and per-column update dispatch dominate, and
  * the single fused buffer wins. Exposed so callers pick per workload
  * ([[graft.operators.Dedup.minHashSignatures]] takes `fused = true`).
  */
case class MinHashSketch(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_hash_sketch requires a bigint shingle-hash column, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = XXH64.hashLong(v.asInstanceOf[Long], 42L)
      var p = 0
      while (p < numHashes) {
        val h = XXH64.hashInt(p, base)
        if (h < buf(p)) buf(p) = h
        p += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var p = 0
    while (p < numHashes) {
      if (other(p) < buf(p)) buf(p) = other(p)
      p += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](numHashes)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketch =
    copy(child = newChildren.head)

  override def prettyName: String = "min_hash_sketch"
}
