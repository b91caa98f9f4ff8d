package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BloomContainsAll, GraftFunctions}
import graft.operators.{Dedup, Sketches}

/** Property specs for the fixed-memory sketch family (Sketches.scala):
  * Bloom no-false-negatives + measured FP share, CMS over-count-only,
  * HLL error bound at its calibrated range, and the codegen'd
  * BloomContainsAll probe against an independent Scala evaluation.
  */
class SketchesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val mBits = 1 << 14
  private val k = 5

  private def keysDf(prefix: String, n: Int) =
    (0 until n).map(i => s"$prefix-$i").toDF("key")

  test("bloom: no false negatives — every inserted key probes positive") {
    val seen = keysDf("seen", 500)
    val words = Sketches.buildBloomWords(seen, col("key"), mBits, k)
    val misses = seen.withColumn("hit",
        GraftFunctions.bloom_contains_all(
          Sketches.bloomPositions(col("key"), mBits, k), words))
      .filter(!col("hit")).count()
    assert(misses == 0L)
  }

  test("bloom: false-positive share on a disjoint corpus is near theory") {
    val seen = keysDf("seen", 1000)
    val words = Sketches.buildBloomWords(seen, col("key"), mBits, k)
    val probes = 2000
    val fp = keysDf("other", probes).withColumn("hit",
        GraftFunctions.bloom_contains_all(
          Sketches.bloomPositions(col("key"), mBits, k), words))
      .filter(col("hit")).count()
    // (1 - e^{-kn/m})^k at n=1000, m=16384, k=5 ≈ 0.0022 — allow 5x slack
    assert(fp.toDouble / probes < 0.011, s"fp rate ${fp.toDouble / probes}")
  }

  test("incremental dedup: exact verdict equals a plain anti-join; bloom-negative implies new") {
    // overlap: keys 300..699 of incoming are also in seen
    val seen = (300 until 1000).map(i => s"k-$i").toDF("key")
    val incoming = (0 until 700).map(i => s"k-$i").toDF("key")
    val out = Sketches.incrementalDedup(incoming, seen, "key", mBits, k).cache()
    val gotNew = out.filter(col("is_new")).select("key").as[String].collect().toSet
    val wantNew = (0 until 300).map(i => s"k-$i").toSet
    assert(gotNew == wantNew)
    assert(out.count() == 700)
    // no false negatives: a bloom-negative row is never actually seen
    assert(out.filter(!col("maybe_seen") && !col("is_new")).count() == 0)
    out.unpersist()
  }

  test("cms: estimates only ever over-count, exact on a collision-free width") {
    val items = Seq.tabulate(600)(i => s"tok-${i % 30}").toDF("item")
    val truth = items.groupBy("item").agg(count(lit(1)).as("truth"))
    val cms = Sketches.cmsTable(items, "item", depth = 4, width = 1 << 12)
    val est = Sketches.cmsEstimate(cms, truth.select("item"), "item", 4, 1 << 12)
    val rows = est.join(truth, "item").select("item", "est_count", "truth").collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), s"${r.getString(0)} under-counted")
    }
    // 30 distinct items in 4x4096 counters: collisions are possible but the
    // MIN over 4 independent rows colliding on ALL of them is (30/4096)^4-
    // unlikely; the min must equal truth here
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }

  test("cms: xxhash64 in-engine family keeps the sketch contract") {
    val items = Seq.tabulate(600)(i => s"tok-${i % 30}").toDF("item")
    val truth = items.groupBy("item").agg(count(lit(1)).as("truth"))
    val cms = Sketches.cmsTable(items, "item", depth = 4, width = 1 << 12,
      portable = false)
    val est = Sketches.cmsEstimate(cms, truth.select("item"), "item", 4, 1 << 12,
      portable = false)
    val rows = est.join(truth, "item").select("item", "est_count", "truth").collect()
    assert(rows.length == 30)
    // same over-count-only + collision-free-width exactness as the
    // portable family (the index bits differ; the contract must not)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"${r.getString(0)}"))
  }

  test("bloom/incremental dedup: xxhash64 in-engine family keeps the exact contract") {
    val seen = (300 until 1000).map(i => s"k-$i").toDF("key")
    val incoming = (0 until 700).map(i => s"k-$i").toDF("key")
    val out = Sketches.incrementalDedup(incoming, seen, "key", mBits, k,
      portable = false).cache()
    // exact verdicts are hash-family-independent; bloom-negative ⇒ new
    val gotNew = out.filter(col("is_new")).select("key").as[String].collect().toSet
    assert(gotNew == (0 until 300).map(i => s"k-$i").toSet)
    assert(out.filter(!col("maybe_seen") && !col("is_new")).count() == 0)
    out.unpersist()
  }

  test("hll: xxhash64 in-engine family stays inside the same error bound (p=10)") {
    val p = 10
    val n = 3 * (1 << p)
    val items = (0 until n).map(i => s"item-$i").toDF("item")
    val row = Sketches.hllDistinct(items, "item", p, portable = false).collect().head
    val est = row.getAs[Double]("est_distinct")
    val err = math.abs(est - n) / n
    assert(err < 0.10, s"est $est vs $n (err $err)")
  }

  test("hll: relative error within theory bounds at the calibrated range (p=10)") {
    val p = 10
    // cardinality 3·2^p — inside the raw-estimate calibration (≳ 2.5·2^p,
    // Sketches.hllDistinct doc: no linear-counting branch, p must be sized)
    val n = 3 * (1 << p)
    val items = (0 until n).map(i => s"item-$i").toDF("item")
    val row = Sketches.hllDistinct(items, "item", p).collect().head
    val est = row.getAs[Double]("est_distinct")
    val err = math.abs(est - n) / n
    // theoretical sigma = 1.04/sqrt(2^p) ≈ 3.25%; allow 3 sigma
    assert(err < 0.10, s"est $est vs $n (err $err)")
  }

  test("hll: empty input yields the all-empty-registers estimate, not NULL") {
    val empty = Seq.empty[String].toDF("item")
    val row = Sketches.hllDistinct(empty, "item", p = 10).collect().head
    assert(row.getLong(0) == 0L)                       // n_registers_used
    assert(row.getLong(1) == 1024L * (1L << 51))       // s_fixed = m·2^(61-p)
    assert(!row.isNullAt(2) && row.getAs[Double]("est_distinct") > 0.0)
  }

  test("bloom_contains_all codegen probe == independent scala bit math") {
    val rnd = new scala.util.Random(17)
    val words = Array.fill(mBits / 64)(rnd.nextLong())
    val df = (0 until 200).map(i => s"probe-$i").toDF("key")
    val got = df.select(col("key"),
        GraftFunctions.bloom_contains_all(
          Sketches.bloomPositions(col("key"), mBits, k), words).as("hit"),
        Sketches.bloomPositions(col("key"), mBits, k).as("pos"))
      .collect()
    got.foreach { r =>
      val want = r.getSeq[Long](2).forall(p =>
        ((words((p >>> 6).toInt) >>> (p & 63L).toInt) & 1L) == 1L)
      assert(r.getBoolean(1) == want, s"key ${r.getString(0)}")
    }
  }

  test("hll merge: per-index max of shard registers == registers of the union") {
    import spark.implicits._
    val a = (1L to 4000L).map(i => s"key-$i").toDF("k")
    val b = (3000L to 7000L).map(i => s"key-$i").toDF("k")
    val merged = Sketches.hllMerge(Seq(
        Sketches.hllRegisters(a, "k", p = 10),
        Sketches.hllRegisters(b, "k", p = 10)), p = 10)
      .orderBy("idx").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val whole = Sketches.hllRegisters(a.union(b), "k", p = 10)
      .orderBy("idx").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    // EXACT table equality, not estimate-closeness: merge is lossless
    assert(merged == whole && merged.nonEmpty)
    // and the merged estimate is within theory bounds of the true union
    val est = Sketches.hllFinalize(
      Sketches.hllMerge(Seq(Sketches.hllRegisters(a, "k", 10),
        Sketches.hllRegisters(b, "k", 10)), 10), 10)
      .head.getDouble(2)
    assert(math.abs(est - 7000.0) / 7000.0 < 0.1, s"est $est vs 7000")
    // mixing a larger-p register table under a smaller declared p fails
    // loudly (out-of-range idx) instead of estimating garbage
    val e = intercept[Exception] {
      Sketches.hllMerge(Seq(Sketches.hllRegisters(a, "k", 10),
        Sketches.hllRegisters(b, "k", 14)), p = 10).collect()
    }
    assert(e.getMessage.contains("idx out of range")
      || Option(e.getCause).exists(_.getMessage.contains("idx out of range")),
      s"unexpected: $e")
  }

  test("kmv: sketch keeps exactly the k smallest distinct hashes, any partitioning") {
    val items = (0 until 400).map(i => ("g", s"item-${i % 200}")) // each item twice
      .toDF("grp", "item")
    val sk = Sketches.kmvSketch(items, "item", Seq("grp"), k = 16)
      .orderBy("rank").collect()
    assert(sk.length == 16)
    assert(sk.map(_.getAs[Int]("rank")).toSeq == (1 to 16))
    // ground truth: hash all 200 distinct items driver-side via the same hv
    val truth = items.select(Dedup.md5Token60(col("item")).as("hv"))
      .distinct().orderBy("hv").limit(16).collect().map(_.getLong(0)).toSeq
    assert(sk.map(_.getAs[Long]("hv")).toSeq == truth)
    // partitioning-independence: 1 partition and 13 partitions agree
    val sk13 = Sketches.kmvSketch(items.repartition(13), "item", Seq("grp"), k = 16)
      .orderBy("rank").collect().map(_.getAs[Long]("hv")).toSeq
    assert(sk13 == truth)
  }

  test("kmv: distinct estimate is exact below k and within 30% at 16x k") {
    val small = (0 until 10).map(i => ("s", s"x-$i")).toDF("grp", "item")
    val exact = Sketches.kmvDistinctEstimate(
      Sketches.kmvSketch(small, "item", Seq("grp"), k = 64), 64, Seq("grp"))
      .head.getDouble(1)
    assert(exact == 10.0, "below k the sketch IS the distinct set")
    val big = (0 until 4096).map(i => ("b", s"y-$i")).toDF("grp", "item")
    val est = Sketches.kmvDistinctEstimate(
      Sketches.kmvSketch(big, "item", Seq("grp"), k = 256), 256, Seq("grp"))
      .head.getDouble(1)
    assert(math.abs(est - 4096) / 4096.0 < 0.3, s"est $est vs 4096")
  }

  test("kmv: pair overlap estimates Jaccard and nails the identical/disjoint poles") {
    // a and b share 500 of 1000 items each -> true J = 500/1500 = 1/3;
    // c == a exactly -> J = 1; d is disjoint from everything -> J = 0
    val rows =
      (0 until 1000).map(i => ("a", s"i-$i")) ++
      (500 until 1500).map(i => ("b", s"i-$i")) ++
      (0 until 1000).map(i => ("c", s"i-$i")) ++
      (0 until 300).map(i => ("d", s"z-$i"))
    val sk = Sketches.kmvSketch(rows.toDF("grp", "item"), "item", Seq("grp"), k = 128)
    val out = Sketches.kmvPairOverlap(sk, "grp", k = 128)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(out(("a", "c")) == 1.0, "identical sets must estimate exactly 1")
    assert(out(("a", "d")) == 0.0 && out(("b", "d")) == 0.0 && out(("c", "d")) == 0.0)
    assert(math.abs(out(("a", "b")) - 1.0 / 3) < 0.15, s"a-b ${out(("a", "b"))}")
    // estimator soundness bound: n_both <= n_union_k everywhere
    val viol = Sketches.kmvPairOverlap(sk, "grp", k = 128)
      .filter(col("n_both") > col("n_union_k")).count()
    assert(viol == 0)
  }

  // ---- Misra–Gries heavy hitters ----------------------------------------

  /** Skewed corpus: `heavy` keys with `heavyCnt` rows each, plus `light`
    * distinct singleton keys — distinct count far above the sketch width
    * so evictions actually happen.
    */
  private def skewed(heavy: Int, heavyCnt: Int, light: Int) = {
    val rows = (0 until heavy).flatMap(h => Seq.fill(heavyCnt)(s"hot-$h")) ++
      (0 until light).map(i => s"cold-$i")
    scala.util.Random.shuffle(rows).toDF("key")
  }

  test("mg buffer: planted heavy key survives any merge tree, size stays <= k") {
    import graft.functions.MisraGries
    val k = 8
    // stream: 1 heavy key with 40% mass, 200 distinct light keys
    val stream = scala.util.Random.shuffle(
      Seq.fill(140)(7L) ++ (100L until 300L)).toArray
    // arbitrary merge tree: split into uneven chunks, fold pairwise
    val chunks = stream.grouped(37).map { part =>
      val b = new MisraGries.Buf(k)
      part.foreach(b.add(_, 1L))
      assert(b.counts.size <= k)
      b
    }.toSeq
    val merged = chunks.reduce { (a, b) => a.mergeFrom(b); a }
    assert(merged.counts.size <= k)
    // 140/340 > n/(k+1) = 340/9: the heavy key MUST hold a counter
    assert(merged.counts.contains(7L))
  }

  test("heavy hitters: exact equality with groupBy truth under adversarial repartitioning") {
    val df = skewed(heavy = 6, heavyCnt = 300, light = 3000) // n = 4800
    val truth = df.groupBy("key").count()
      .filter(col("count") >= math.ceil(0.05 * 4800).toLong)
      .select(col("key"), col("count").as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(truth.size == 6) // the 6 hot keys, 300 >= 240
    for (parts <- Seq(1, 7, 32)) {
      // minFrac 0.05, safety 2 -> k = 40 counters vs 3006 distinct keys
      val got = Sketches.heavyHitters(df.repartition(parts), "key", 0.05)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == truth, s"parts=$parts")
    }
  }

  test("heavy hitters abs: exact result, and the too-narrow sketch fails loudly") {
    val df = skewed(heavy = 3, heavyCnt = 500, light = 1500) // n = 3000
    val got = Sketches.heavyHittersAbs(df, "key", minCount = 400, k = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == (0 until 3).map(h => (s"hot-$h", 500L)).toSet)
    // minCount 400 <= n/(k+1) = 3000/5 = 600: the guarantee is void
    val ex = intercept[IllegalArgumentException] {
      Sketches.heavyHittersAbs(df, "key", minCount = 400, k = 4)
    }
    assert(ex.getMessage.contains("error budget"))
  }

  test("mg candidates: survivors are a superset of keys above the n/(k+1) budget") {
    val df = skewed(heavy = 4, heavyCnt = 250, light = 2000) // n = 3000
    val k = 30 // budget n/(k+1) ~ 96.8 < 250
    val cands = df.repartition(13)
      .agg(GraftFunctions.mg_candidates(xxhash64(col("key")), k))
      .head().getSeq[Long](0).toSet
    assert(cands.size <= k)
    val heavyHashes = df.filter(col("key").startsWith("hot-"))
      .select(xxhash64(col("key"))).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(heavyHashes.subsetOf(cands))
  }

  test("heavy hitters by group: exact per-group answer under eviction and repartitioning") {
    // 3 groups; per group: 4 hot keys of 100 rows + 600 distinct singletons
    // (k = 40 counters per group vs 604 distinct keys -> heavy eviction)
    val rows = for {
      gIdx <- 0 until 3
      row <- (0 until 4).flatMap(h => Seq.fill(100)(s"hot-$gIdx-$h")) ++
        (0 until 600).map(i => s"cold-$gIdx-$i")
    } yield (s"grp$gIdx", row)
    val df = scala.util.Random.shuffle(rows).toDF("g", "key")
    // per-group n = 1000, threshold = ceil(0.05 * 1000) = 50
    val truth = rows.groupBy(identity).map { case ((gr, key), rs) =>
      (gr, key, rs.size.toLong)
    }.filter(_._3 >= 50L).toSet
    assert(truth.size == 12)
    for (parts <- Seq(1, 32)) {
      val got = Sketches.heavyHittersBy(df.repartition(parts), "key", Seq("g"), 0.05)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == truth, s"parts=$parts")
    }
    // shuffle-join fallback (cap 0 forces it) is bit-identical
    val fallback = Sketches.heavyHittersBy(df, "key", Seq("g"), 0.05,
        broadcastCandCap = 0L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(fallback == truth)
  }

  test("heavy hitters by group: null group keys report like any group") {
    val df = (Seq.fill(30)((Some("a"), "x")) ++ Seq.fill(20)((Option.empty[String], "y")) ++
      (0 until 10).map(i => (Option.empty[String], s"z$i"))).toDF("g", "key")
    val got = Sketches.heavyHittersBy(df, "key", Seq("g"), 0.3)
      .collect().map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2))).toSet
    // null group: n = 30, threshold 9 -> y (20) qualifies, z* (1 each) don't
    assert(got == Set((Some("a"), "x", 30L), (None, "y", 20L)))
  }

  test("top-k frequent: certified exact ranking under eviction, loud failure when flat") {
    // 20 keys with distinct descending counts + 3000 singleton keys;
    // k=64 counters vs 3020 distinct forces evictions
    val rows = (0 until 20).flatMap(i => Seq.fill(200 - i * 5)(s"key-$i")) ++
      (0 until 3000).map(i => s"noise-$i")
    val df = scala.util.Random.shuffle(rows).toDF("key")
    val got = Sketches.topKFrequent(df, "key", topK = 10, k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val want = (0 until 10).map(i => (s"key-$i", (200 - i * 5).toLong, i + 1))
    assert(got.toSeq == want)
    // flat corpus: every key ties at 1 -> the k-th count is inside the
    // absence budget and the certificate must refuse
    val flat = (0 until 5000).map(i => s"u-$i").toDF("key")
    val ex = intercept[IllegalArgumentException] {
      Sketches.topKFrequent(flat, "key", topK = 10, k = 64)
    }
    assert(ex.getMessage.contains("certify") || ex.getMessage.contains("survive"))
  }

  test("top-k frequent by group: exact per-group ranking under eviction, loud per-group failure") {
    // per group: 6 keys with distinct descending counts + 500 singletons
    // (k=32 counters vs 506 distinct per group forces evictions)
    val rows = for {
      gi <- 0 until 3
      row <- (0 until 6).flatMap(h => Seq.fill(60 - h * 5)(s"g$gi-hot-$h")) ++
        (0 until 500).map(i => s"g$gi-cold-$i")
    } yield (s"grp$gi", row)
    val df = scala.util.Random.shuffle(rows).toDF("g", "key")
    val got = Sketches.topKFrequentBy(df.repartition(11), "key", Seq("g"),
        topK = 4, k = 32)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    val want = (for {
      gi <- 0 until 3; h <- 0 until 4
    } yield (s"grp$gi", s"g$gi-hot-$h", (60 - h * 5).toLong, h + 1)).toSet
    assert(got == want)
    // a flat group voids its certificate and must fail the whole call
    val flat = ((0 until 800).map(i => ("flat", s"u-$i")) ++
      rows.filter(_._1 == "grp0")).toDF("g", "key")
    val ex = intercept[IllegalArgumentException] {
      Sketches.topKFrequentBy(flat, "key", Seq("g"), topK = 4, k = 32)
    }
    assert(ex.getMessage.contains("certify"))
  }

  test("top-k frequent by group: complete-universe groups certify; vanished summaries fail") {
    // 3 distinct keys under k=32: no eviction, candidate set == universe,
    // so topK=5 legitimately returns ALL 3 ranked rows even though the
    // kth count (1) is inside the absence budget
    val smallG = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .map(("small", _)).toDF("g", "key")
    val got = Sketches.topKFrequentBy(smallG, "key", Seq("g"), topK = 5, k = 32)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got == Seq(("a", 5L, 1), ("b", 3L, 2), ("c", 1L, 3)))
    // adversarial eviction can empty a group's summary entirely (k+1
    // distinct singletons, one partition): the group must FAIL the
    // certificate, not silently vanish from the output
    val vanish = (Seq(("van", "x"), ("van", "y"), ("van", "z")) ++
      Seq.fill(9)(("ok", "hot")))
      .toDF("g", "key").coalesce(1)
    val ex = intercept[IllegalArgumentException] {
      Sketches.topKFrequentBy(vanish, "key", Seq("g"), topK = 1, k = 2)
    }
    assert(ex.getMessage.contains("certify"))
  }

  test("heavy hitters: null keys recount as SQL's null group") {
    val df = (Seq.fill(50)(Some("a")) ++ Seq.fill(40)(Option.empty[String]) ++
      (0 until 10).map(i => Some(s"x-$i"))).toDF("key")
    val got = Sketches.heavyHitters(df, "key", 0.3)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(got == Set((Some("a"), 50L), (None, 40L)))
  }

  test("heavy hitters plan: partial MG aggregate before the exchange, InSet recount probe") {
    val df = skewed(heavy = 3, heavyCnt = 200, light = 500)
    // pass 1 must partial-aggregate map-side (k-counter buffers per
    // partition, <= k rows each through the wire), not shuffle raw keys
    val p1 = df.agg(GraftFunctions.mg_candidates(xxhash64(col("key")), 40))
      .queryExecution.executedPlan.toString
    assert(p1.contains("partial_mg_candidates"), s"no partial aggregate:\n$p1")
    assert(p1.contains("ObjectHashAggregate"), s"not object-hash:\n$p1")
    // the full operator's recount must probe a compiled literal set
    // (InSet / In) at the scan, never join or window the corpus — use a
    // parquet source: a LocalRelation would constant-fold the probe away
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val p2 = Sketches.heavyHitters(ev, "event_type", 0.15)
      .queryExecution.executedPlan.toString
    assert(p2.contains("INSET") || p2.contains(" IN "), s"no in-set probe:\n$p2")
    assert(!p2.contains("Window"), s"window in recount path:\n$p2")
  }

  test("mg_candidates is SQL-callable and matches the Column form") {
    GraftFunctions.register(spark) // imperative path on the shared session
    // one partition so both forms consume the identical stream (the
    // candidate SET below the guarantee line is merge-order dependent)
    val df = skewed(heavy = 2, heavyCnt = 100, light = 50).coalesce(1)
    df.createOrReplaceTempView("mg_in")
    val viaSql = spark.sql(
      "SELECT mg_candidates(xxhash64(key), 16) FROM mg_in")
      .head().getSeq[Long](0)
    val viaCol = df.agg(GraftFunctions.mg_candidates(xxhash64(col("key")), 16))
      .head().getSeq[Long](0)
    // same single-partition stream -> identical summaries
    assert(viaSql == viaCol)
    val hot = df.filter(col("key").startsWith("hot-"))
      .select(xxhash64(col("key"))).distinct().collect().map(_.getLong(0)).toSet
    assert(hot.subsetOf(viaSql.toSet))
  }

  test("BloomContainsAll equality is value-based over the bitset") {
    val child = org.apache.spark.sql.graft.Shims.expression(Dedup.md5Token60(col("key")))
    val a = Array(1L, 2L, 3L)
    assert(BloomContainsAll(child, a) == BloomContainsAll(child, a.clone()))
    assert(BloomContainsAll(child, a).hashCode() ==
      BloomContainsAll(child, a.clone()).hashCode())
    assert(BloomContainsAll(child, a) != BloomContainsAll(child, Array(1L, 2L, 4L)))
  }
}
