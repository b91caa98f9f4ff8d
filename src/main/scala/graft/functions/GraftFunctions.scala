package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `strip_ansi(col)` — exact reference ANSI-strip semantics ([[Ansi]]).
  *
  * A native Catalyst expression (not a Scala UDF) so it participates in
  * whole-stage codegen: `doGenCode` emits a direct static call on UTF8String
  * bytes, no Row boxing, no serialization.
  */
case class StripAnsi(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    Ansi.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Ansi.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAnsi =
    copy(child = newChild)

  override def prettyName: String = "strip_ansi"
}

/** `rolling_hash(col)` — 64-bit polynomial rolling hash (Rabin-Karp shape,
  * base 257, natural wraparound mod 2^64) over the UTF-8 bytes of a string.
  * Used for document fingerprinting in the text-analysis operator family.
  * Codegen-friendly for the same reason as [[StripAnsi]].
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Base = 257L
  def hash(s: UTF8String): Long = hashBytes(s.getBytes)
  def hashBytes(data: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < data.length) {
      h = h * Base + (data(i) & 0xffL)
      i += 1
    }
    h
  }
}

/** `vec_dot(a, b)` — dot product of two `array<float>` (or, for the
  * residual-IVFADC path whose subtractions must happen in double to match
  * the oracle's arithmetic, two `array<double>`) columns in double
  * precision. A tight codegen'd loop over the ArrayData — no intermediate
  * array allocation (unlike `aggregate(zip_with(...))`), which is what makes
  * per-pair similarity joins viable at scale.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  private lazy val doubleElems: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  // reject mixed/int inputs at analysis time: a typed accessor on
  // mis-sized slots would silently return garbage (advisor finding,
  // round 1); both sides must share one element type
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<float> or two array<double> inputs, " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    if (doubleElems) {
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    } else {
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val get = if (doubleElems) "getDouble" else "getFloat"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.$get($i) * (double) $b.$get($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)

  override def prettyName: String = "vec_dot"
}

/** `sign_lsh_buckets(emb)` — all `tables` random-hyperplane LSH bucket ids
  * of an `array<float>` embedding in one pass: bit k of table t is the sign
  * of the projection onto a deterministic ±1 hyperplane, whose component for
  * dimension d is the parity of xxhash64(t, k, d) (the exact chain the
  * HOF formulation `pmod(xxhash64(lit(t), k, d), 2)` produces).
  *
  * A native expression because the HOF formulation evaluates an interpreted
  * 3-arg hash per (table, bit, dimension) with per-element lambda dispatch —
  * measured ~2 ms/row at tables=8, bits=8, dim=64; this loop with the
  * per-(t,k) seed prefix hoisted runs in microseconds and stays inside
  * whole-stage codegen.
  */
case class SignLshBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_buckets requires array<float>, got ${t.catalogString}")
  }

  // hash-chain prefix per (table, bit): XxHash64 over (t: int, k: int, d:
  // int) with seed 42 folds left, so the (t, k) part is a constant seed
  private lazy val seeds: Array[Long] = Array.tabulate(tables * bits) { i =>
    SignLshBuckets.seedFor(i / bits, i % bits)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var k = 0
      while (k < bits) {
        val seed = seeds(t * bits + k)
        var proj = 0.0
        var d = 0
        while (d < n) {
          val x = arr.getFloat(d).toDouble
          proj += (if ((XXH64.hashInt(d, seed) & 1L) == 0L) x else -x)
          d += 1
        }
        if (proj > 0) bucket |= (1L << k)
        k += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val seed = ctx.freshName("seed")
      val proj = ctx.freshName("proj")
      val bucket = ctx.freshName("bucket")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $k = 0; $k < $bits; $k++) {
         |    long $seed = $seedsRef[$t * $bits + $k];
         |    double $proj = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      double $x = (double) $a.getFloat($d);
         |      $proj += (($xxh.hashInt($d, $seed) & 1L) == 0L) ? $x : -$x;
         |    }
         |    if ($proj > 0) $bucket |= (1L << $k);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)

  override def prettyName: String = "sign_lsh_buckets"
}

object SignLshBuckets {
  /** Seed for (table t, bit k): the XXH64 fold of (t, k) over seed 42 —
    * shared by the expression's eval/codegen paths and [[planeSigns]] so
    * the serialized oracle planes can never drift from the engine's.
    */
  private[functions] def seedFor(t: Int, k: Int): Long =
    XXH64.hashInt(k, XXH64.hashInt(t, 42L))

  /** The ±1 hyperplane matrix, serialized: one '+'/'-' string of length
    * `dim` per (table, bit), where character d is the sign the expression
    * applies to embedding component d. The matrix is data-independent, so
    * an external engine (the DuckDB oracle) can replay bucket assembly
    * exactly from these 64-char literals.
    */
  def planeSigns(tables: Int, bits: Int, dim: Int): Seq[(Int, Int, String)] =
    for { t <- 0 until tables; k <- 0 until bits } yield {
      val seed = seedFor(t, k)
      (t, k, (0 until dim)
        .map(d => if ((XXH64.hashInt(d, seed) & 1L) == 0L) '+' else '-')
        .mkString)
    }
}

/** `bloom_contains_all(positions)` — true iff every bit position in the
  * `array<bigint>` child is set in the Bloom bitset baked into the
  * expression. The bitset rides the plan as a reference object (the same
  * shape Spark's own runtime bloom-join filter uses: serialized once with
  * the task binary, shared by every row), so the membership test is a few
  * shifts inside whole-stage codegen — no join, no shuffle, no UDF.
  */
case class BloomContainsAll(child: Expression, words: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains_all needs array<bigint> positions, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    BloomBits.containsAll(words,
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BloomBits.containsAll($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsAll =
    copy(child = newChild)

  // Array[Long] equals/hashCode are by reference; value-based semantics keep
  // canonicalization and subexpression elimination working across identical
  // bitsets (advisor r6)
  override def equals(other: Any): Boolean = other match {
    case b: BloomContainsAll =>
      child == b.child && java.util.Arrays.equals(words, b.words)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(words)

  override def prettyName: String = "bloom_contains_all"
}

object BloomBits {
  def containsAll(
      words: Array[Long],
      positions: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    var i = 0
    val n = positions.numElements()
    while (i < n) {
      val p = positions.getLong(i)
      if (((words((p >>> 6).toInt) >>> (p & 63L).toInt) & 1L) == 0L) return false
      i += 1
    }
    true
  }
}

/** `z_order_key(a, b)` — Morton (Z-order) code interleaving the low
  * 31 bits of two longs (a in odd bit positions, b in even). Sorting or
  * range-partitioning a table by this key co-locates rows that are close
  * in BOTH dimensions, so per-file min/max column statistics become tight
  * in both — the standard multi-dimensional data-layout trick (Delta/
  * Iceberg OPTIMIZE ZORDER) that lets parquet row-group skipping prune
  * scans under predicates on either column. Pure bit arithmetic (magic-
  * number spread), codegen'd, and replayable in any engine with shifts
  * and masks — which is what the DuckDB oracle does.
  *
  * 31 bits per dimension (not 32): the 62-bit key stays strictly
  * positive in a SIGNED 64-bit engine, so no replay target ever hits
  * shift-overflow or sign-comparison trouble (DuckDB raises on bigint
  * shift overflow; two's-complement wraparound would flip sort order).
  */
case class BitInterleave(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_order_key needs (bigint, bigint), got (${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitInterleave.zorder(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.BitInterleave.zorder($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitInterleave =
    copy(left = l, right = r)

  override def prettyName: String = "z_order_key"
}

object BitInterleave {
  /** Spread the low 31 bits of x into the even bit positions of a long. */
  def spread(x: Long): Long = {
    var v = x & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def zorder(a: Long, b: Long): Long = (spread(a) << 1) | spread(b)
}

/** `vec_hamming(a, b)` — popcount of the elementwise XOR of two packed
  * sign-word arrays (`array<long>`), i.e. the Hamming distance between
  * the bit planes [[graft.operators.Similarity.binarySignWords]] packs.
  * A native expression for the same reason as [[VecDot]]: the
  * `zip_with + aggregate` formulation allocates an intermediate array
  * and a lambda frame per ROW on the hottest loop of binary retrieval
  * (query × corpus candidate generation); this is a straight-line
  * `Long.bitCount(x ^ y)` accumulation with no allocation, inside
  * whole-stage codegen.
  */
case class VecHamming(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_hamming requires two array<bigint> inputs, " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecHamming =
    copy(left = l, right = r)

  override def prettyName: String = "vec_hamming"
}

/** `jaro_winkler(a, b)` — the record-linkage string similarity
  * [Winkler 1990, building on Jaro 1989]: Jaro similarity (matches
  * within a ⌊max(|a|,|b|)/2⌋−1 window, half-transpositions) plus the
  * Winkler common-prefix boost `l·0.1·(1−jaro)` (prefix capped at 4,
  * applied only above the classic 0.7 boost threshold). Semantics match
  * DuckDB's `jaro_winkler_similarity`, which is what lets the fuzzy
  * linkage queries carry a DuckDB oracle.
  *
  * Native expression, not a UDF: the scorer is one static call on the
  * two UTF8Strings from generated code — stays inside whole-stage
  * codegen like [[VecHamming]] (the loop itself lives in
  * [[JaroWinkler.score]]; emitting it inline would buy nothing — the
  * JIT inlines a static monomorphic call).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires two string inputs, " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.score($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
    copy(left = l, right = r)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {
  /** Static scorer, called from both eval and generated code. ASCII
    * inputs (the overwhelming case for names/titles) run a pure
    * byte-array loop — no String materialization per pair, which is
    * where the hot join spends its time; anything with a high bit falls
    * back to the code-unit (char) loop, which is what the oracle engine
    * compares on BMP text. Both loops implement the identical
    * algorithm, and on ASCII bytes == chars, so the fast path cannot
    * change a score.
    */
  def score(aS: UTF8String, bS: UTF8String): Double = {
    val ab = aS.getBytes
    val bb = bS.getBytes
    if (allAscii(ab) && allAscii(bb)) {
      // bit-parallel matcher for the ≤64-char case (names/titles — the
      // overwhelming linkage shape): same algorithm, O(la+lb) instead of
      // O(la·window) and no per-pair boolean-array allocation. Longer
      // ASCII falls back to the scalar loop below.
      if (ab.length <= 64 && bb.length <= 64) scoreBits(ab, bb)
      else scoreBytes(ab, bb)
    } else scoreChars(aS.toString, bS.toString)
  }

  // per-thread byte→positions-of-byte-in-b masks; entries used by a pair
  // are zeroed on exit so the table is clean for the next pair (O(lb),
  // vs O(128) to clear the whole table)
  private val posMaskTL = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](128)
  }

  /** Bit-parallel Jaro-Winkler for ASCII inputs of length ≤ 64.
    * Match step: the scalar algorithm assigns each a-position i the
    * LOWEST unmatched j in its window with b(j) == a(i); here that is
    * `lowestOneBit(positionsOf(a(i)) & windowMask & ~matched)` — the
    * identical assignment, one word op instead of a window scan.
    * Transposition walk and all arithmetic are verbatim from
    * [[scoreBytes]], so the two paths return identical bits
    * (pinned by OperatorsSpec's cross-path fuzz).
    */
  private def scoreBits(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val posMask = posMaskTL.get()
    var j = 0
    while (j < lb) { posMask(b(j)) |= 1L << j; j += 1 }
    var aMatched = 0L
    var bMatched = 0L
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      if (lo <= hi) {
        val width = hi - lo + 1
        val wm = if (width == 64) -1L else ((1L << width) - 1L) << lo
        val cand = posMask(a(i)) & wm & ~bMatched
        if (cand != 0L) {
          bMatched |= java.lang.Long.lowestOneBit(cand)
          aMatched |= 1L << i
          m += 1
        }
      }
      i += 1
    }
    j = 0
    while (j < lb) { posMask(b(j)) = 0L; j += 1 }
    if (m == 0) return 0.0
    var t = 0
    var am = aMatched
    var bm = bMatched
    while (am != 0L) {
      if (a(java.lang.Long.numberOfTrailingZeros(am)) !=
        b(java.lang.Long.numberOfTrailingZeros(bm))) t += 1
      am &= am - 1
      bm &= bm - 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb
      + (m - t / 2).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  private def allAscii(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) { if (b(i) < 0) return false; i += 1 }
    true
  }

  private def scoreBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    // either side empty → 0, INCLUDING both-empty (the oracle engine's
    // convention, pinned by spec — some libraries return 1 there)
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a(i) == b(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb
      + (m - t / 2).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  private def scoreChars(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb
      + (m - t / 2).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

object GraftFunctions {
  def strip_ansi(c: Column): Column =
    Shims.column(StripAnsi(Shims.expression(c)))

  def vec_dot(a: Column, b: Column): Column =
    Shims.column(VecDot(Shims.expression(a), Shims.expression(b)))

  def vec_hamming(a: Column, b: Column): Column =
    Shims.column(VecHamming(Shims.expression(a), Shims.expression(b)))

  def jaro_winkler(a: Column, b: Column): Column =
    Shims.column(JaroWinkler(Shims.expression(a), Shims.expression(b)))

  def sign_lsh_buckets(emb: Column, tables: Int, bits: Int): Column =
    Shims.column(SignLshBuckets(Shims.expression(emb), tables, bits))

  def min_hash_sketch(h0: Column, numHashes: Int): Column =
    Shims.column(
      MinHashSketch(Shims.expression(h0), numHashes).toAggregateExpression())

  def top_k_by(score: Column, id: Column, k: Int): Column =
    Shims.column(
      BoundedTopK(Shims.expression(score), Shims.expression(id), k)
        .toAggregateExpression())

  def top_k_by_str(score: Column, id: Column, k: Int): Column =
    Shims.column(
      BoundedTopKStr(Shims.expression(score), Shims.expression(id), k)
        .toAggregateExpression())

  def mg_candidates(key: Column, k: Int): Column =
    Shims.column(
      MisraGries(Shims.expression(key), k).toAggregateExpression())

  def rolling_hash(c: Column): Column =
    Shims.column(RollingHash(Shims.expression(c)))

  def bloom_contains_all(positions: Column, words: Array[Long]): Column =
    Shims.column(BloomContainsAll(Shims.expression(positions), words))

  def z_order_key(a: Column, b: Column): Column =
    Shims.column(BitInterleave(Shims.expression(a), Shims.expression(b)))

  /** Register SQL-callable forms (`SELECT strip_ansi(content) ...`). */
  def register(spark: SparkSession): Unit = {
    Shims.registerFunction(spark, "strip_ansi", exprs => StripAnsi(exprs.head))
    Shims.registerFunction(spark, "rolling_hash", exprs => RollingHash(exprs.head))
    Shims.registerFunction(spark, "vec_dot", exprs => VecDot(exprs(0), exprs(1)))
    Shims.registerFunction(spark, "jaro_winkler", exprs =>
      JaroWinkler(exprs(0), exprs(1)))
    Shims.registerFunction(spark, "vec_hamming", exprs =>
      VecHamming(exprs(0), exprs(1)))
    Shims.registerFunction(spark, "sign_lsh_buckets", exprs =>
      SignLshBuckets(exprs(0),
        graft.GraftExtensions.intLiteral(exprs(1), "tables"),
        graft.GraftExtensions.intLiteral(exprs(2), "bits")))
    Shims.registerFunction(spark, "min_hash_sketch", exprs =>
      MinHashSketch(exprs(0),
        graft.GraftExtensions.intLiteral(exprs(1), "numHashes")))
    Shims.registerFunction(spark, "top_k_by", exprs =>
      BoundedTopK(exprs(0), exprs(1),
        graft.GraftExtensions.intLiteral(exprs(2), "k")))
    Shims.registerFunction(spark, "top_k_by_str", exprs =>
      BoundedTopKStr(exprs(0), exprs(1),
        graft.GraftExtensions.intLiteral(exprs(2), "k")))
    Shims.registerFunction(spark, "z_order_key", exprs =>
      BitInterleave(exprs(0), exprs(1)))
    Shims.registerFunction(spark, "mg_candidates", exprs =>
      MisraGries(exprs(0),
        graft.GraftExtensions.intLiteral(exprs(1), "k")))
  }
}
