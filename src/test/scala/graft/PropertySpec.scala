package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, LshIndex, Quantiles, Sampling}

/** Property-based specs (ScalaCheck): randomized structural properties
  * that example tests can't cover — random graph shapes for the two
  * connected-components implementations, random corpora for sampler
  * determinism, random distributions for the quantile error bound.
  *
  * Spark jobs are expensive relative to property iterations, so the
  * Spark-backed properties run a reduced-but-meaningful number of cases
  * (the default 100 would take minutes); pure-function properties run
  * hundreds. Graph cases are uniform random (a, b) edge draws —
  * adversarial SHAPES (deep chains, stars, bridges) are pinned by the
  * example tests in OperatorsSpec, which this suite complements rather
  * than replaces.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }

  /** Run one check per independent law CONCURRENTLY (the store-law
    * draws are ~8 serial Spark actions each, mostly driver/job latency
    * on a session that never fills the host — the guide's "overlap
    * independent jobs" applied to the test harness). Laws use disjoint
    * temp dirs; the caller releases tracked caches ONCE after the join
    * (a per-law release could drop a sibling law's in-flight blocks).
    */
  private def allLawsConcurrently[A](laws: Seq[A])(body: A => Boolean): Boolean = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val ok = laws.map(l => Future(body(l)))
      .map(Await.result(_, Duration.Inf)).forall(identity)
    graft.operators.CacheRegistry.release(spark)
    ok
  }

  /** Reference labeling: sequential union-find over the same edges. */
  private def ufLabels(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      parent(x) = r; r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  test("property: star contraction == min-label == union-find on random graphs") {
    val genCase = for {
      n <- Gen.choose(2, 40)
      nEdges <- Gen.choose(0, n * 2)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield (n.toLong, edges.filter(e => e._1 != e._2))

    check(Prop.forAll(genCase) { case (n, edges) =>
      val docs = (0L until n).map(i => (i, s"d$i")).toDF("doc_id", "text")
      val pairs = edges.toDF("doc_id_a", "doc_id_b")
      val expect = ufLabels(n, edges)
      val star = Dedup.dedupClustersStar(docs, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // maxIter above the worst-case diameter (a 40-node random graph can
      // be a path): the default 20 would silently return partial labels
      val minLabel = Dedup.dedupClusters(docs, pairs, driverThreshold = 0, maxIter = 50)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      star == expect && minLabel == expect
    }, minSuccessful = 12)
  }

  test("property: deterministic sampler families are partitioning-invariant") {
    val genCase = for {
      n <- Gen.choose(20, 300)
      parts <- Gen.choose(1, 17)
      seed <- Gen.choose(0L, 1000L)
    } yield (n, parts, seed)

    check(Prop.forAll(genCase) { case (n, parts, seed) =>
      val df = (1 to n).map(i => (i.toLong, s"s${i % 5}", s"doc $i"))
        .toDF("doc_id", "src", "text")
      def ids(d: org.apache.spark.sql.DataFrame) =
        d.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      val a = ids(Sampling.fixedSizeSample(df, "doc_id", "src", 7, seed))
      val b = ids(Sampling.fixedSizeSample(df.repartition(parts), "doc_id", "src", 7, seed))
      val c = ids(Sampling.deterministicSample(df, "doc_id", 0.4))
      val d2 = ids(Sampling.deterministicSample(df.repartition(parts), "doc_id", 0.4))
      a == b && c == d2
    }, minSuccessful = 8)
  }

  test("property: z-order key is injective and per-axis monotone (pure function)") {
    import graft.functions.BitInterleave
    val gen31 = Gen.choose(0L, 0x7FFFFFFFL)
    // injective: distinct 31-bit pairs always get distinct keys (the
    // spread is invertible bit scatter, so this is exact, not statistical)
    check(Prop.forAll(gen31, gen31, gen31, gen31) { (a, b, c, d) =>
      ((a, b) == (c, d)) == (BitInterleave.zorder(a, b) == BitInterleave.zorder(c, d))
    }, minSuccessful = 500)
    // monotone along each axis with the other fixed
    check(Prop.forAll(gen31, gen31, gen31) { (a, b, other) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      (lo == hi) || (BitInterleave.zorder(lo, other) < BitInterleave.zorder(hi, other) &&
        BitInterleave.zorder(other, lo) < BitInterleave.zorder(other, hi))
    }, minSuccessful = 500)
    // keys stay strictly non-negative over the whole 31-bit domain
    check(Prop.forAll(gen31, gen31) { (a, b) =>
      BitInterleave.zorder(a, b) >= 0L
    }, minSuccessful = 500)
  }

  test("property: rolling hash distributes and is prefix-sensitive (pure function)") {
    import graft.functions.RollingHash
    import org.apache.spark.unsafe.types.UTF8String
    def h(s: String) = RollingHash.hash(UTF8String.fromString(s))
    // equal strings hash equal; appending any char changes the hash
    check(Prop.forAll(Gen.alphaNumStr, Gen.alphaNumChar) { (s, c) =>
      h(s) == h(s) && h(s + c) != h(s)
    }, minSuccessful = 300)
    // order sensitivity: a transposition of two distinct adjacent chars
    // changes the hash (fingerprints must see order, unlike bag models)
    check(Prop.forAll(Gen.alphaNumStr, Gen.alphaNumChar, Gen.alphaNumChar) { (s, x, y) =>
      (x == y) || h(s + x.toString + y.toString) != h(s + y.toString + x.toString)
    }, minSuccessful = 300)
  }

  test("property: funnel stage counts never increase and respect order") {
    val gen = for {
      n <- Gen.choose(5, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 6L)
        t <- Gen.choose(1L, 50L)
        e <- Gen.oneOf("view", "click", "purchase", "error")
      } yield (u, t, e))
    } yield evs
    check(Prop.forAll(gen) { evs =>
      val df = evs.toDF("user_id", "ts", "event_type")
      val counts = operators.Events.funnel(df, Seq("view", "click", "purchase"))
        .orderBy("stage_idx").collect().map(_.getLong(2))
      counts.length == 3 && counts.sliding(2).forall(p => p(0) >= p(1))
    }, minSuccessful = 8)
  }

  test("property: sqrt-temperature mix bounds and monotonicity") {
    val gen = Gen.listOfN(4, Gen.choose(1, 200))
    check(Prop.forAll(gen) { sizes =>
      val rows = sizes.zipWithIndex.flatMap { case (n, s) =>
        (0 until n).map(i => (s.toLong * 1000 + i, s"s$s"))
      }
      val got = Sampling.sqrtTemperatureMix(rows.toDF("doc_id", "lang"), "lang")
        .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
      // fractions in (0,1], the rarest stratum exactly 1.0, targets <= n,
      // and bigger strata keep MORE docs but a SMALLER fraction
      val sorted = got.sortBy(_._1)
      got.forall { case (n, f, t) => f > 0 && f <= 1.0 && t <= n } &&
        sorted.head._2 == 1.0 &&
        sorted.sliding(2).forall { case Array((_, f1, t1), (_, f2, t2)) =>
          f2 <= f1 && t2 >= t1
        case _ => true }
    }, minSuccessful = 8)
  }

  test("property: BPE delimited-replace application == reference greedy fold") {
    // the delimited-string replace (what trainMerges/segmentVocab run)
    // must equal the canonical greedy left-to-right fold for ANY symbol
    // sequence and merge pair — this is the engine-portability claim the
    // oracle relies on, checked on arbitrary inputs
    def foldMerge(syms: List[String], a: String, b: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, x) =>
        acc match {
          case h :: t if h == a && x == b => (a + b) :: t
          case _ => x :: acc
        }
      }.reverse
    def replaceMerge(syms: List[String], a: String, b: String): List[String] = {
      val s = " " + syms.mkString("  ") + " "
      val out = s.replace(s" $a  $b ", s" $a$b ")
      out.substring(1, out.length - 1).split("  ").toList
    }
    val symGen = Gen.oneOf("a", "b", "c", "ab", "bc", "</w>")
    val genCase = for {
      syms <- Gen.nonEmptyListOf(symGen)
      a <- symGen
      b <- symGen
    } yield (syms, a, b)
    check(Prop.forAll(genCase) { case (syms, a, b) =>
      replaceMerge(syms, a, b) == foldMerge(syms, a, b)
    }, minSuccessful = 500)
  }

  test("property: snapshot diff/apply round trip on random snapshots") {
    val rowGen = for {
      id <- Gen.choose(0L, 15L)
      name <- Gen.oneOf("a", "b", "c", "d")
      bal <- Gen.choose(0, 5).map(_.toDouble)
    } yield (id, name, bal)
    // distinct keys per snapshot (snapshots are keyed tables)
    def snap(rows: List[(Long, String, Double)]) =
      rows.groupBy(_._1).map(_._2.head).toList
    val genCase = for {
      o <- Gen.listOf(rowGen)
      n <- Gen.listOf(rowGen)
    } yield (snap(o), snap(n))
    check(Prop.forAll(genCase) { case (o, n) =>
      val oldS = o.toDF("id", "name", "bal")
      val newS = n.toDF("id", "name", "bal")
      val ch = operators.Cdc.snapshotDiff(oldS, newS, "id")
        .withColumn("seq", col("id"))
      val replayed = operators.Cdc.applyChangelog(oldS, ch, "id", "seq")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      replayed == n.toSet
    }, minSuccessful = 12)
  }

  test("property: binned quantile error stays within one bucket width") {
    val genCase = for {
      n <- Gen.choose(50, 2000)
      scale <- Gen.choose(1.0, 1000.0)
      offset <- Gen.choose(-500.0, 500.0)
      seed <- Gen.choose(0L, 9999L)
    } yield (n, scale, offset, seed)

    check(Prop.forAll(genCase) { case (n, scale, offset, seed) =>
      val rnd = new scala.util.Random(seed)
      val vals = (1 to n).map(_ => offset + rnd.nextDouble() * scale)
      val df = vals.map(("g", _)).toDF("g", "v")
      val bins = 256
      val row = Quantiles.binnedQuantiles(df, "v", "g", bins = bins).head()
      val sorted = vals.sorted
      val width = (sorted.last - sorted.head) / bins
      def exact(p: Double) = sorted(math.ceil(p * n).toInt - 1)
      math.abs(row.getDouble(2) - exact(0.5)) <= width + 1e-9 &&
        math.abs(row.getDouble(3) - exact(0.95)) <= width + 1e-9
    }, minSuccessful = 8)
  }

  test("property: exact quantile == sorted order statistic on random mixed distributions") {
    // continuous mass + heavy duplicate plateaus + random p — the
    // refinement loop must land on the exact k-th smallest every time
    val genCase = for {
      n <- Gen.choose(200, 3000)
      dupShare <- Gen.choose(0.0, 0.9)
      p <- Gen.choose(0.01, 1.0)
      seed <- Gen.choose(0L, 99999L)
    } yield (n, dupShare, p, seed)

    check(Prop.forAll(genCase) { case (n, dupShare, p, seed) =>
      val rnd = new scala.util.Random(seed)
      val plateau = rnd.nextDouble() * 100 - 50
      val vals = (1 to n).map { _ =>
        if (rnd.nextDouble() < dupShare) plateau
        else rnd.nextDouble() * 1000 - 500
      }
      val want = vals.sorted.apply(math.max(math.ceil(p * n).toInt, 1) - 1)
      // tiny bins/cutoff force several refinement rounds per case
      Quantiles.exactQuantile(vals.toDF("v"), "v", p,
        bins = 8, cutoff = 32) == want
    }, minSuccessful = 8)
  }

  test("property: exact heavy hitters == groupBy truth on random skewed keys") {
    import graft.operators.Sketches
    val genCase = for {
      nHot <- Gen.choose(1, 8)
      hotCnt <- Gen.choose(50, 200)
      nCold <- Gen.choose(100, 2000)
      minFrac <- Gen.choose(0.02, 0.2)
      parts <- Gen.choose(1, 16)
      seed <- Gen.choose(0L, 99999L)
    } yield (nHot, hotCnt, nCold, minFrac, parts, seed)

    check(Prop.forAll(genCase) { case (nHot, hotCnt, nCold, minFrac, parts, seed) =>
      val rnd = new scala.util.Random(seed)
      val rows = rnd.shuffle(
        (0 until nHot).flatMap(h => Seq.fill(hotCnt)(s"hot-$h")) ++
          (0 until nCold).map(i => s"cold-$i-${rnd.nextInt(5)}"))
      val n = rows.size
      val threshold = math.ceil(minFrac * n).toLong
      val truth = rows.groupBy(identity).view
        .mapValues(_.size.toLong).filter(_._2 >= threshold).toMap
      val got = Sketches.heavyHitters(
          rows.toDF("key").repartition(parts), "key", minFrac)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      got == truth
    }, minSuccessful = 8)
  }

  test("property: bounded top-k aggregate == driver-side total-order sort, any partitioning") {
    // randomized twin of the fixed NaN/ties example in OperatorsSpec:
    // random scores (with deliberate tie mass and occasional NaN),
    // random k and partition count — the aggregate must reproduce the
    // (score desc NaN-first, id asc) total order's k-prefix exactly
    val genCase = for {
      n <- Gen.choose(30, 400)
      k <- Gen.choose(1, 12)
      parts <- Gen.choose(1, 16)
      seed <- Gen.choose(0L, 99999L)
    } yield (n, k, parts, seed)

    check(Prop.forAll(genCase) { case (n, k, parts, seed) =>
      val rnd = new scala.util.Random(seed)
      val rows = (0 until n).map { i =>
        val s = rnd.nextInt(10) match {
          case 0 => Double.NaN
          case j => (j % 4).toDouble / 2 // heavy ties
        }
        (i.toLong % 3, i.toLong, s) // 3 query groups
      }
      val got = operators.Similarity.aggTopK(
          rows.toDF("query_id", "vec_id", "cos_sim").repartition(parts), k)
        .collect()
        .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
      // driver truth: sort by (NaN-first desc score, id asc) per group
      def key(s: Double): Double =
        if (s.isNaN) Double.MaxValue else s // NaN outranks every double
      val want = rows.groupBy(_._1).flatMap { case (q, rs) =>
        rs.sortBy { case (_, id, s) => (-key(s), id) }.take(k).zipWithIndex
          .map { case ((_, id, _), i) => (q, i + 1) -> id }
      }
      got == want
    }, minSuccessful = 15)
  }

  test("property: LSH store seed+append == cold rebuild for ANY split") {
    // signatures and band buckets are pure per-row functions — unlike
    // the IVF index there is NO codebook-defining-seed precondition, so
    // the equality law must hold for every split, including empty seed
    // and empty batch. Random corpora of near-dup-prone short texts;
    // random split membership.
    val genCase = for {
      n <- Gen.choose(2, 24)
      words <- Gen.listOfN(n,
        Gen.listOfN(6, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
          .map(_.mkString(" ")))
      inSeed <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield (words, inSeed)
    check(Prop.forAll(genCase) { case (words, inSeed) =>
      val docs = words.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val store = java.nio.file.Files
        .createTempDirectory("prop-lsh").toString + "/s"
      val seedIds = inSeed.zipWithIndex.collect { case (true, i) => i.toLong }
      val seed = docs.filter(col("doc_id").isin(seedIds: _*))
      val batch = docs.filter(!col("doc_id").isin(seedIds: _*))
      LshIndex.write(seed, store, numHashes = 8, bands = 2, shingleSize = 2,
        nShards = 4)
      val probed = LshIndex.probe(spark, batch, store, threshold = 0.25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val old = LshIndex.lshPairs(spark, store, threshold = 0.25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      LshIndex.append(spark, batch, store)
      val after = LshIndex.lshPairs(spark, store, threshold = 0.25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val cold = Dedup.minHashNearDupPortable(docs, numHashes = 8, bands = 2,
          shingleSize = 2, threshold = 0.25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      graft.operators.CacheRegistry.release(spark)
      after == cold && (old ++ probed) == cold
    }, minSuccessful = 8)
  }

  test("property: the persisted stores (incl. bloom-sidecar span) obey seed+appends == cold, replay/compact invariance, for ANY split") {
    import graft.operators.{HllStore, SketchStore, SpanStore}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val events = Tables.loadEvents(spark, "/root/testdata/sf0.001")
    val probeDocs = docs.filter(col("doc_id") < 10)
    val (jan1, feb1) = (1704067200000L, 1706745600000L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet

    // one law, four algebras (the span store drawn twice — bare and
    // through its Bloom sidecar): a store built from ANY hash-split of the
    // input (seed + appends, optionally one REPLAYED append where the
    // store's merge absorbs duplicates, then a compaction) must serve
    // exactly what a cold build over the whole input serves. SketchStore
    // is the deliberate exception on replay — its counts ADD, which is
    // WHY its streaming ingest carries a commit fence — so its draw
    // skips the replay leg and pins the other two laws.
    final case class StoreLaw(
      name: String,
      data: org.apache.spark.sql.DataFrame,
      keyCol: String,
      build: (org.apache.spark.sql.DataFrame, String) => Unit,
      appendFn: (org.apache.spark.sql.DataFrame, String) => Unit,
      replayInvisible: Boolean,
      serve: String => Set[Seq[Any]],
      compactFn: (String, String) => Unit)
    val laws = Seq(
      StoreLaw("span", docs, "doc_id",
        (d, dir) => SpanStore.write(d, dir, minTokens = 8),
        (d, dir) => SpanStore.append(spark, d, dir),
        replayInvisible = true,
        dir => rows(SpanStore.probe(spark, probeDocs, dir)),
        (s, t) => SpanStore.compactStore(spark, s, t)),
      // same algebra THROUGH the Bloom sidecar: seed built with
      // writeBloom, appends ride their word generations, compaction
      // OR-folds — while the cold side has no sidecar at all, so the
      // law pins bloom-path serving ≡ bloomless serving for ANY split
      StoreLaw("span+bloom", docs, "doc_id",
        (d, dir) => { SpanStore.write(d, dir, minTokens = 8)
          if (dir.endsWith("/s")) SpanStore.writeBloom(spark, dir) },
        (d, dir) => SpanStore.append(spark, d, dir),
        replayInvisible = true,
        dir => rows(SpanStore.probe(spark, probeDocs, dir)),
        (s, t) => SpanStore.compactStore(spark, s, t)),
      StoreLaw("lsh", docs, "doc_id",
        (d, dir) => LshIndex.write(d, dir),
        (d, dir) => LshIndex.append(spark, d, dir, dedupeIds = true),
        replayInvisible = true, // behind the dedupeIds producer guard
        dir => rows(LshIndex.lshPairs(spark, dir)),
        (s, t) => LshIndex.compactLsh(spark, s, t)),
      StoreLaw("hll", events, "event_id",
        (d, dir) => HllStore.write(d, dir),
        (d, dir) => { HllStore.append(spark, d, dir); () },
        replayInvisible = true,
        dir => rows(HllStore.distinct(spark, dir, jan1, feb1)) ++
          rows(HllStore.windowDistinct(spark, dir, jan1, feb1)),
        (s, t) => HllStore.compactStore(spark, s, t)),
      StoreLaw("sketch", events, "event_id",
        (d, dir) => SketchStore.write(d, dir),
        (d, dir) => { SketchStore.append(spark, d, dir); () },
        replayInvisible = false,
        dir => rows(SketchStore.quantiles(spark, dir, jan1, feb1)),
        (s, t) => SketchStore.compactStore(spark, s, t)))

    val genCase = for {
      nb <- Gen.choose(2, 3)
      salt <- Gen.choose(0L, 1000L)
      replayIdx <- Gen.choose(0, 2)
    } yield (nb, salt, replayIdx)
    check(Prop.forAll(genCase) { case (nb, salt, replayIdx) =>
      allLawsConcurrently(laws) { law =>
        val base = java.nio.file.Files
          .createTempDirectory(s"prop-store-${law.name}").toString
        val part = pmod(xxhash64(col(law.keyCol) + lit(salt)), lit(nb))
        def batch(i: Int) = law.data.filter(part === i)
        law.build(law.data, s"$base/cold")
        val cold = law.serve(s"$base/cold")
        law.build(batch(0), s"$base/s")
        (1 until nb).foreach(i => law.appendFn(batch(i), s"$base/s"))
        val incr = law.serve(s"$base/s")
        val afterReplay =
          if (!law.replayInvisible) incr
          else {
            law.appendFn(batch(replayIdx % nb), s"$base/s")
            law.serve(s"$base/s")
          }
        law.compactFn(s"$base/s", s"$base/c")
        val compacted = law.serve(s"$base/c")
        val ok = cold.nonEmpty && incr == cold &&
          afterReplay == cold && compacted == cold
        if (!ok) println(s"[prop] store law broke: ${law.name} nb=$nb " +
          s"salt=$salt replay=$replayIdx (cold=${cold.size} " +
          s"incr=${incr.size} replayed=${afterReplay.size} " +
          s"compacted=${compacted.size})")
        ok
      }
      // 2 draws x 4 stores x ~8 lifecycle actions each: a full property
      // budget here would cost many minutes of pure Spark job latency;
      // the example specs already pin adversarial splits per store, this
      // draw covers the CROSS-store law on fresh random splits per run
    }, minSuccessful = 2)
  }

  test("property: forget then compact == cold-rebuild-without for the content stores, for ANY forget set") {
    import graft.operators.{LshIndex, Similarity, SpanStore, Tombstones}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val probeDocs = docs.filter(col("doc_id") < 10)
    val queries = emb.filter(col("vec_id") < 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet

    // one takedown law, three content stores: for ANY forgettable id
    // set, (a) LIVE serving after forget already equals a cold build
    // without those docs (the tombstone anti-join), (b) compaction
    // applies the tombstones physically and does NOT carry the sidecar
    // forward, and the compacted store still serves the cold-without
    // answer. The IVFADC draw restricts the forgettable universe to
    // non-codebook-defining ids (vec_id >= max(numCentroids, ksub)):
    // forget hides CODES, never re-trains the frozen geometry, so
    // cold-rebuild equality needs the two builds to draw identical
    // codebooks — the same precondition the seed+append law carries.
    final case class ForgetLaw(
      name: String,
      data: org.apache.spark.sql.DataFrame,
      idCol: String,
      forgettable: org.apache.spark.sql.Column,
      build: (org.apache.spark.sql.DataFrame, String) => Unit,
      forgetFn: (org.apache.spark.sql.DataFrame, String) => Unit,
      serve: String => Set[Seq[Any]],
      compactFn: (String, String) => Unit)
    val laws = Seq(
      ForgetLaw("span", docs, "doc_id", lit(true),
        (d, dir) => SpanStore.write(d, dir, minTokens = 8),
        (ids, dir) => SpanStore.forget(spark, ids, dir),
        dir => rows(SpanStore.probe(spark, probeDocs, dir)),
        (s, t) => SpanStore.compactStore(spark, s, t)),
      ForgetLaw("lsh", docs, "doc_id", lit(true),
        (d, dir) => LshIndex.write(d, dir),
        (ids, dir) => LshIndex.forget(spark, ids, dir),
        dir => rows(LshIndex.lshPairs(spark, dir)),
        (s, t) => LshIndex.compactLsh(spark, s, t)),
      ForgetLaw("ivfpq", emb, "vec_id", col("vec_id") >= 16,
        (d, dir) => Similarity.writeIvfPqIndex(d, dir, numCentroids = 8,
          m = 4, ksub = 16, dim = 64),
        (ids, dir) => Similarity.forgetIvfPq(spark, ids, dir),
        dir => rows(Similarity.ivfPqTopK(spark, dir, queries, emb,
          k = 3, nprobe = 2, rerankFactor = 4, m = 4, dim = 64)),
        (s, t) => Similarity.compactIvfPq(spark, s, t)))

    check(Prop.forAll(Gen.choose(0L, 1000L)) { salt =>
      allLawsConcurrently(laws) { law =>
        val base = java.nio.file.Files
          .createTempDirectory(s"prop-forget-${law.name}").toString
        val doomed = law.forgettable &&
          pmod(xxhash64(col(law.idCol) + lit(salt)), lit(4)) === 0
        law.build(law.data, s"$base/full")
        law.build(law.data.filter(!doomed), s"$base/cold")
        val want = law.serve(s"$base/cold")
        law.forgetFn(law.data.filter(doomed).select(law.idCol), s"$base/full")
        val live = law.serve(s"$base/full")
        law.compactFn(s"$base/full", s"$base/c")
        val compacted = law.serve(s"$base/c")
        val ok = want.nonEmpty && live == want && compacted == want &&
          Tombstones.exists(s"$base/full") && !Tombstones.exists(s"$base/c")
        if (!ok) println(s"[prop] forget law broke: ${law.name} salt=$salt " +
          s"(cold=${want.size} live=${live.size} compacted=${compacted.size})")
        ok
      }
      // 2 draws x 3 stores x ~6 lifecycle actions each — the same
      // budget rationale as the seed+append law above
    }, minSuccessful = 2)
  }

  test("property: post-compaction bloom == freshly-built bloom on the compacted store, for ANY forget set") {
    import graft.operators.{SpanStore, StoreMeta}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    check(Prop.forAll(Gen.choose(0L, 1000L)) { salt =>
      val base = java.nio.file.Files
        .createTempDirectory("prop-bloomfold").toString
      val dir = s"$base/store"
      SpanStore.write(docs.filter(col("doc_id") % 3 =!= 2), dir,
        minTokens = 8, shardChars = 1, withBloom = true)
      SpanStore.append(spark, docs.filter(col("doc_id") % 3 === 2), dir)
      val doomed = pmod(xxhash64(col("doc_id") + lit(salt)), lit(4)) === 0
      SpanStore.forget(spark, docs.filter(doomed).select("doc_id"), dir)
      SpanStore.compactStore(spark, dir, s"$base/c")
      // the law (r18 verdict task 5): the compacted sidecar is row-
      // identical to a fresh build over the compacted store's own
      // prints at the frozen geometry — forgotten/folded-away prints'
      // bits are SHED, not ratcheted, and no surviving bit is lost
      val (mBits, kh) = SpanStore.readBloomGeometry(s"$base/c")
      val (mBits0, kh0) = SpanStore.readBloomGeometry(dir)
      val got = SpanStore.readBloom(spark, s"$base/c")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val want = SpanStore.bloomRows(
          spark.read.schema(
            "doc_id BIGINT, p BIGINT, span_md5 STRING, shard STRING")
            .parquet(s"$base/c").select("shard", "span_md5"), mBits, kh)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(0))).toSet
      graft.operators.CacheRegistry.release(spark)
      val ok = (mBits, kh) == (mBits0, kh0) && got.nonEmpty && got == want
      if (!ok) println(s"[prop] bloom rebuild law broke: salt=$salt " +
        s"geom=($mBits,$kh) vs ($mBits0,$kh0) got=${got.size} want=${want.size}")
      ok
    }, minSuccessful = 2)
  }

  test("property: forgetPublished == original assignment minus forgotten, untouched shards byte-stable, for ANY forget set") {
    import graft.operators.{Layout, StoreMeta}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val shardSchema = "doc_id BIGINT, text STRING, n_tokens BIGINT, shard_id INT"
    def readBack(dir: String) =
      spark.read.schema(shardSchema).parquet(dir)
    // per-shard file bytes: (shard dir -> sorted (name, md5) list) — the
    // loader-checksum contract is BYTE equality, not row equality
    def shardBytes(dir: String): Map[String, Seq[(String, String)]] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(f => f.isDirectory &&
          f.getName.startsWith("shard_id=")).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map { f =>
            val md = java.security.MessageDigest.getInstance("MD5")
              .digest(java.nio.file.Files.readAllBytes(f.toPath))
              .map("%02x".format(_)).mkString
            (f.getName, md)
          }.sortBy(_._1).toSeq
      }.toMap
    }
    check(Prop.forAll(Gen.choose(0L, 1000L)) { salt =>
      val base = java.nio.file.Files
        .createTempDirectory("prop-pubforget").toString
      val dir = s"$base/shards"
      Layout.publishInit(spark, docs, dir, nShards = 8)
      val orig = readBack(dir).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
      val bytesBefore = shardBytes(dir)
      val doomed = pmod(xxhash64(col("doc_id") + lit(salt)), lit(5)) === 0
      val forgottenIds = docs.filter(doomed).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      Layout.forgetPublished(spark, docs.filter(doomed).select("doc_id"), dir)
      val after = readBack(dir).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
      // the law: original assignment minus the forgotten docs — shard
      // ids NEVER re-flow
      val want = orig.filterNot(r => forgottenIds(r._1))
      val touched = orig.filter(r => forgottenIds(r._1))
        .map(r => s"shard_id=${r._3}")
      val bytesAfter = shardBytes(dir)
      val untouchedStable = bytesBefore.keySet.filterNot(touched).forall(k =>
        bytesAfter.get(k).contains(bytesBefore(k)))
      val genBumped = StoreMeta.read(dir).get("forget_gen").contains("1")
      val ok = after == want && untouchedStable && genBumped
      if (!ok) println(s"[prop] publish-forget law broke: salt=$salt " +
        s"forgotten=${forgottenIds.size} rows(after=${after.size} " +
        s"want=${want.size}) untouchedStable=$untouchedStable gen=$genBumped")
      ok
    }, minSuccessful = 2)
  }

  test("property: publishShards partitions the corpus, balances tokens, and the manifest replays, for ANY corpus and nShards") {
    import graft.operators.Layout
    // driver-side truth mirrors: whitespace tokens (TextAnalysis.tokens)
    // and the 56-bit md5-half digest basis (Layout.shardManifest)
    def toks(t: String): Long =
      t.trim.split("\\s+").count(_.nonEmpty).toLong
    def md5Half(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(14), 16)
    }
    val genCase = for {
      n <- Gen.choose(1, 40)
      words <- Gen.listOfN(n, Gen.frequency(
        // empty/whitespace docs pin the zero-token clamp (advisor r17:
        // exclusive offset == total at the doc_id tail)
        1 -> Gen.const(""),
        1 -> Gen.const("   "),
        8 -> Gen.choose(1, 12).flatMap(k => Gen.listOfN(k,
          Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta"))
          .map(_.mkString(" ")))))
      nShards <- Gen.choose(1, 6)
    } yield (words, nShards)
    check(Prop.forAll(genCase) { case (words, nShards) =>
      val docsSeq = words.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val total = docsSeq.map(d => toks(d._2)).sum
      if (total == 0) true // publishShards requires >= 1 token; draw skipped
      else {
        val assigned = Layout.publishShards(
          docsSeq.toDF("doc_id", "text"), nShards)
        val rows = assigned.select("doc_id", "text", "n_tokens", "shard_id")
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
        val manifest = Layout.shardManifest(assigned)
          .collect()
          .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
          .toMap
        val budget = (total + nShards - 1) / nShards
        val maxDoc = docsSeq.map(d => toks(d._2)).max
        // (1) shards PARTITION the corpus: every doc once, tokens exact
        val partitionOk = rows.map(_._1).sorted.toSeq ==
          docsSeq.map(_._1).sorted &&
          rows.forall { case (id, t, n, _) =>
            n == toks(docsSeq(id.toInt)._2) && t == docsSeq(id.toInt)._2 }
        // (2) shard range honors the documented [0, nShards) clamp and
        // ids are CONTIGUOUS doc_id ranges (sorted by doc_id, shard ids
        // never decrease)
        val ordered = rows.sortBy(_._1).map(_._4).toSeq
        val rangeOk = ordered.forall(s => s >= 0 && s < nShards) &&
          ordered.zip(ordered.drop(1)).forall { case (a, b) => a <= b }
        // (3) token balance: a shard overshoots only by its straddling
        // doc — mass < budget + maxDoc; and every non-final shard that
        // exists covers its full budget window (mass > budget - maxDoc)
        val masses = rows.groupBy(_._4).view.mapValues(_.map(_._3).sum).toMap
        val lastShard = ordered.last
        val balanceOk = masses.forall { case (s, mass) =>
          mass < budget + maxDoc &&
            (s == lastShard || mass >= budget - maxDoc) }
        // (4) the manifest replays from the assignment: doc counts,
        // masses, and the order-invariant xor digest
        val manifestOk = manifest.keySet == masses.keySet &&
          rows.groupBy(_._4).forall { case (s, rs) =>
            manifest(s) == ((rs.length.toLong, rs.map(_._3).sum,
              rs.map(r => md5Half(r._2)).reduce(_ ^ _))) }
        val ok = partitionOk && rangeOk && balanceOk && manifestOk
        if (!ok) println(s"[prop] publish law broke: n=${words.size} " +
          s"nShards=$nShards (partition=$partitionOk range=$rangeOk " +
          s"balance=$balanceOk manifest=$manifestOk masses=$masses)")
        ok
      }
    }, minSuccessful = 12)
  }
}
