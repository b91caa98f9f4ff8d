package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingHash
import graft.operators._

/** Oracles-in-ScalaTest for the operators the DuckDB gate can't express
  * (custom 64-bit hashing, LSH, IVF, the multimodal stub).
  */
class OperatorsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val docsPath = "/root/testdata/sf0.001/documents.parquet"
  private lazy val docs = spark.read.parquet(docsPath).cache()

  test("exact dedup keeps min doc_id per normalized text") {
    val df = Seq(
      (1L, "Hello  World"),
      (2L, "hello world"),
      (3L, "  HELLO WORLD  "),
      (4L, "something else"),
    ).toDF("doc_id", "text")
    val got = Dedup.exactDedup(df).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 3L), (4L, 1L)))
  }

  test("ngram jaccard is exact: agrees with a hand-computed pair") {
    val df = Seq(
      (1L, "a b c d e f"),   // shingles: {a b c, b c d, c d e, d e f}
      (2L, "a b c d e g"),   // shingles: {a b c, b c d, c d e, d e g}
      (3L, "x y z w q r"),
    ).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairs(df, shingleSize = 3, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // intersection 3, union 5 -> 0.6
    assert(got.toSeq == Seq((1L, 2L, 0.6)))
  }

  test("ngram jaccard: inline and join-based pair generation agree") {
    // pairListCutoff=1 forces every shingle id-list through the distributed
    // self-join path; the default routes them through inline expansion —
    // identical output either way (advisor finding, round 1: a hot shingle
    // must not materialize its n²/2 pairs inside one row)
    val hot = (1L to 40L).map(i => (i, s"common shingle text unique$i"))
    val df = (hot :+ ((99L, "completely different content here"))).toDF("doc_id", "text")
    val viaJoin = Dedup.ngramJaccardPairs(df, threshold = 0.3, pairListCutoff = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaInline = Dedup.ngramJaccardPairs(df, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaJoin == viaInline)
    // every doc pair shares {common shingle text, shingle text unique*}:
    // jaccard = 1/3 — all C(40,2) pairs qualify at 0.3
    assert(viaInline.size == 40 * 39 / 2)
  }

  test("prefix-filtered jaccard == scala brute force on random corpora") {
    val rnd = new scala.util.Random(42)
    def bruteShingles(s: String): Set[String] = {
      val toks = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    for (trial <- 1 to 3) {
      val vocab = Seq("a", "b", "c", "d", "e", "f", "g", "h")
      val docsSeq = (1L to 30L).map { i =>
        val n = 1 + rnd.nextInt(12)
        (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val df = docsSeq.toDF("doc_id", "text")
      val sets = docsSeq.map { case (id, s) => id -> bruteShingles(s) }.toMap
      for (t <- Seq(0.35, 0.8)) {
        val got = Dedup.ngramJaccardPairs(df, threshold = t).collect()
          .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
        val want = (for {
          a <- docsSeq.map(_._1); b <- docsSeq.map(_._1) if a < b
          inter = (sets(a) intersect sets(b)).size
          j = inter.toDouble / (sets(a).size + sets(b).size - inter)
          jr = BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          if jr >= t
        } yield ((a, b), jr)).toMap
        assert(got == want,
          s"trial $trial t=$t missing=${want.keySet.diff(got.keySet)} extra=${got.keySet.diff(want.keySet)}")
      }
    }
  }

  test("ngram jaccard: hash-order prefix equals rare-first ordering") {
    // the AllPairs prefix filter is lossless under any consistent global
    // shingle order — both orders must yield identical verified pairs
    def pairs(hashOrder: Boolean) =
      Dedup.ngramJaccardPairs(docs, threshold = 0.6, hashOrderPrefix = hashOrder)
        .orderBy("doc_id_a", "doc_id_b").collect().toSeq
    assert(pairs(hashOrder = false) == pairs(hashOrder = true))
  }

  test("ngram jaccard prefix filter loses nothing vs threshold-0 exhaustive") {
    // exhaustive ground truth at threshold 0 has an empty prefix-filter
    // effect (prefix = whole set); re-running at 0.6 must return exactly
    // the >=0.6 subset — the prefix-filter lemma in practice
    val all = Dedup.ngramJaccardPairs(docs, threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val filtered = Dedup.ngramJaccardPairs(docs, threshold = 0.6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(filtered == all.filter(_._2 >= 0.6))
  }

  test("dedup clusters: transitive chains collapse to the min doc_id (both paths)") {
    val docsDf = (1L to 7L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // chain 1~2~3 (1 and 3 never directly paired), pair 5~6, singletons 4,7
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_id_a", "doc_id_b")
    val expect = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L)
    // driver-side union-find path (default threshold)
    val viaDriver = Dedup.dedupClusters(docsDf, pairs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaDriver.toSeq == expect)
    // distributed min-label propagation path (threshold forced to 0)
    val viaLoop = Dedup.dedupClusters(docsDf, pairs, driverThreshold = 0)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaLoop.toSeq == expect)
  }

  test("dedup clusters: long chain survives checkpointed multi-round propagation") {
    // a 16-node path graph needs ~15 min-label rounds — well past the
    // checkpointEvery=3 cut points, so the loop crosses several lineage
    // truncations (localCheckpoint) and must still converge exactly
    val n = 16L
    val docsDf = (0L until n).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_id_a", "doc_id_b")
    val got = Dedup.dedupClusters(docsDf, chain,
        driverThreshold = 0, checkpointEvery = 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == (0L until n).map(i => (i, 0L)))
  }

  test("column profile: exact counts/min/max, HLL ndv within bounds") {
    val df = (1L to 5000L).map(i =>
        (i, if (i % 10 == 0) None else Some(s"cat${i % 7}"), i % 100))
      .toDF("id", "cat", "bucket")
    val got = operators.Stats.columnProfile(df, Seq("id", "cat", "bucket"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4), r.getDouble(6)))).toMap
    // the linear-counting branch makes small/mid cardinalities tight
    // (the raw harmonic estimator alone was ~20% high at n ≈ 1.2·m)
    val (idTot, idNN, idMin, idMax, idEst) = got("id")
    assert((idTot, idNN, idMin, idMax) == ((5000L, 5000L, "1", "5000")))
    assert(math.abs(idEst - 5000.0) / 5000.0 < 0.05, s"id ndv $idEst")
    val (catTot, catNN, catMin, catMax, catEst) = got("cat")
    assert((catTot, catNN, catMin, catMax) == ((5000L, 4500L, "cat0", "cat6")))
    assert(catEst > 6 && catEst < 8, s"cat ndv $catEst") // 7 true
    val (_, _, bMin, bMax, bEst) = got("bucket")
    assert(bMin == "0" && bMax == "99" && math.abs(bEst - 100.0) < 5.0)
  }

  test("fixed-size sample: exact counts, partitioning-independent, seed-sensitive") {
    val df = (1L to 300L).map(i => (i, s"s${i % 3}", s"doc $i"))
      .toDF("doc_id", "src", "text")
    val got = Sampling.fixedSizeSample(df, "doc_id", "src", n = 20, seed = 1L)
    val counts = got.groupBy("src").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts == Map("s0" -> 20L, "s1" -> 20L, "s2" -> 20L))
    // short stratum: take all of it
    val tiny = Sampling.fixedSizeSample(
      df.filter($"doc_id" <= 5), "doc_id", "src", n = 20, seed = 1L)
    assert(tiny.count() == 5L)
    // same rows whatever the physical partitioning
    val a = got.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.fixedSizeSample(df.repartition(13), "doc_id", "src", 20, 1L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    // a different seed draws a different set
    val c = Sampling.fixedSizeSample(df, "doc_id", "src", 20, 2L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a != c)
  }

  test("lm score: hand-computed bigram conditionals; short docs report 0") {
    val df = Seq((1L, "a b"), (2L, "a c"), (3L, "a b"), (4L, "x"))
      .toDF("doc_id", "text")
    // B(a,b)=2, B(a,c)=1, U(a)=3 -> p(a,b)=0.666667, p(a,c)=0.333333
    val got = TextAnalysis.lmScore(df).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 1L, 0.6667), (2L, 1L, 0.3333),
      (3L, 1L, 0.6667), (4L, 0L, 0.0)))
  }

  test("lm score: repeated fluent bigrams outrank a shuffled doc") {
    val fluent = "the cat sat on the mat"
    val shuffled = "mat the on sat cat the"
    val df = (1L to 9L).map(i => (i, fluent)).toDF("doc_id", "text")
      .union(Seq((10L, shuffled)).toDF("doc_id", "text"))
    val scores = TextAnalysis.lmScore(df).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(scores(1L) > scores(10L),
      s"fluent ${scores(1L)} should outrank shuffled ${scores(10L)}")
  }

  test("positional postings and phrase search: hand-computed fixture") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat the cat sat"),
      (3L, "cat sat elsewhere entirely today"),
      (4L, "sat cat")).toDF("doc_id", "text")
    val postings = Index.positionalPostings(df)
    val catRows = postings.filter($"term" === "cat").orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getSeq[Int](3)))
    assert(catRows.toSeq == Seq((1L, 1L, Seq(1)), (2L, 2L, Seq(1, 3)),
      (3L, 1L, Seq(0)), (4L, 1L, Seq(1))))

    val stats = Index.termStats(df).filter($"term" === "the")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // "the": doc1 ×2, doc2 ×2 -> df=2, total=4, span [1,2]
    assert(stats.toSeq == Seq((2L, 4L, 1L, 2L)))

    val hits = Index.phraseSearch(df, Seq("cat", "sat"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // "cat sat": doc1 once (1,2), doc2 once (3,4), doc3 once (0,1); doc4
    // has the words only in the wrong order
    assert(hits.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L)))

    // three-word phrase crosses two position joins
    val three = Index.phraseSearch(df, Seq("the", "cat", "sat"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(three.toSeq == Seq((1L, 1L), (2L, 1L)))
  }

  test("z-order key: hand-computed Morton codes and per-axis monotonicity") {
    import graft.functions.BitInterleave
    // a=3 (bits 0,1 -> odd positions 1,3), b=5 (bits 0,2 -> even 0,4):
    // 0b11011 = 27
    assert(BitInterleave.zorder(3L, 5L) == 27L)
    assert(BitInterleave.zorder(0L, 0L) == 0L)
    assert(BitInterleave.zorder(1L, 0L) == 2L)
    assert(BitInterleave.zorder(0L, 1L) == 1L)
    // interleave is monotone per axis with the other fixed
    for (v <- Seq(0L, 1L, 7L, 100L, 65535L, 0x7FFFFFFEL))
      assert(BitInterleave.zorder(v, 9L) < BitInterleave.zorder(v + 1, 9L))
    // 31-bit inputs produce strictly positive 62-bit keys (no sign wrap)
    assert(BitInterleave.zorder(0x7FFFFFFFL, 0x7FFFFFFFL) > 0L)
    // engine expression == the scala bit math, through codegen
    val df = Seq((3L, 5L), (123456L, 654321L), (0x7FFFFFFFL, 0L))
      .toDF("a", "b")
    val got = df.select(graft.functions.GraftFunctions.z_order_key($"a", $"b"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(BitInterleave.zorder(3L, 5L),
      BitInterleave.zorder(123456L, 654321L), BitInterleave.zorder(0x7FFFFFFFL, 0L)))
  }

  test("z-ordered layout: per-file spans tighten in BOTH dimensions") {
    val rnd = new scala.util.Random(7)
    val n = 20000
    val grid = (1 to n).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    try {
      val files = 16
      Layout.writeZOrdered(grid, "x", "y", s"$base/z", numFiles = files)
      grid.repartition(files).write.parquet(s"$base/plain")
      def meanSpanFrac(path: String): (Double, Double) = {
        val rows = Layout.fileSpans(spark, path, "x", "y").collect()
        val fx = rows.map(r => (r.getLong(3) - r.getLong(2)).toDouble / 1000.0)
        val fy = rows.map(r => (r.getLong(5) - r.getLong(4)).toDouble / 1000.0)
        (fx.sum / fx.length, fy.sum / fy.length)
      }
      val (zx, zy) = meanSpanFrac(s"$base/z")
      val (px, py) = meanSpanFrac(s"$base/plain")
      // round-robin files span ~the full domain on both axes; z-order
      // must cut the mean span substantially in BOTH
      assert(zx < px * 0.6, s"x span: z=$zx plain=$px")
      assert(zy < py * 0.6, s"y span: z=$zy plain=$py")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("publish shards: token balance, partition-invariance, manifest survives the write round-trip") {
    val rnd = new scala.util.Random(11)
    val docs = (0 until 500).map { i =>
      (i.toLong, (1 to (1 + rnd.nextInt(40))).map(j => s"w$i-$j").mkString(" "))
    }.toDF("doc_id", "text")
    val n = 8
    val assigned = Layout.publishShards(docs, nShards = n)
    val total = assigned.agg(sum("n_tokens")).head().getLong(0)
    val budget = (total + n - 1) / n
    val perShard = assigned.groupBy("shard_id")
      .agg(sum("n_tokens").as("tok"), max("n_tokens").as("mx"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // contiguity bound: a shard's token mass can overshoot the budget by
    // at most one document (the doc straddling its boundary)
    perShard.foreach { case (sid, (tok, mx)) =>
      assert(tok <= budget + mx, s"shard $sid: $tok > $budget + $mx") }
    assert(perShard.keySet.max <= n - 1 && perShard.keySet.min >= 0)
    // shards partition the corpus exactly
    assert(assigned.count() == 500L)
    // assignment is a pure function of the corpus, not its partitioning
    val re = Layout.publishShards(docs.repartition(17), nShards = n)
    assert(re.select("doc_id", "shard_id").except(
      assigned.select("doc_id", "shard_id")).count() == 0L)
    // the written shards serve back the exact manifest of the plan
    val base = java.nio.file.Files.createTempDirectory("publish").toString
    try {
      val fromDisk = Layout.writeShards(spark, assigned, s"$base/shards")
        .orderBy("shard_id").collect().map(_.toSeq).toSeq
      val planned = Layout.shardManifest(assigned)
        .orderBy("shard_id").collect().map(_.toSeq).toSeq
      assert(fromDisk == planned, "read-back manifest drifted from the plan")
      // digest is order-invariant: reversing row order inside the shard
      // frame must not move it
      val reversed = Layout.shardManifest(assigned.orderBy(col("doc_id").desc))
        .orderBy("shard_id").collect().map(_.toSeq).toSeq
      assert(reversed == planned)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("bm25: hand-computed scores on a four-doc corpus, both idf variants, partition-invariant") {
    val docs = Seq(
      (0L, "apple banana banana"),
      (1L, "apple cherry"),
      (2L, "banana banana banana durian"),
      (3L, "cherry durian apple")).toDF("doc_id", "text")
    // N = 4 token-bearing docs, avgdl = 12/4 = 3.0
    // query = doc 0, terms {apple, banana}; df(apple)=3, df(banana)=2
    def sat(tf: Double, dlen: Double): Double =
      (tf * 2.25) / (tf + (0.3125 + 0.9375 * (dlen / 3.0)))
    def contrib(idf: Double, tf: Double, dlen: Double): Double =
      BigDecimal(idf * sat(tf, dlen))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def score(terms: Seq[(Double, Double, Double)]): Double = // (idf, tf, dl)
      BigDecimal(terms.map { case (i, t, d) => contrib(i, t, d) }.sum)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def idfLog(df: Double) = math.log(1.0 + ((4.0 - df) + 0.5) / (df + 0.5))
    def idfRat(df: Double) = ((4.0 - df) + 0.5) / (df + 0.5)
    for ((variant, idf) <- Seq(
        (true, idfLog _), (false, idfRat _))) {
      val got = Retrieval.bm25TopK(docs, queryMaxId = 1, k = 10,
          logIdf = variant)
        .orderBy("rank").collect()
        .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
      val exp = Seq(
        1L -> score(Seq((idf(3.0), 1.0, 2.0))),              // apple
        2L -> score(Seq((idf(2.0), 3.0, 4.0))),              // banana x3
        3L -> score(Seq((idf(3.0), 1.0, 3.0))))              // apple
        .sortBy { case (id, s) => (-s, id) }
        .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1) }
      assert(got.toSeq == exp, s"logIdf=$variant: ${got.toSeq} vs $exp")
    }
    // partitioning must not move scores (order-free decimal sums)
    val a = Retrieval.bm25TopK(docs.repartition(7), queryMaxId = 1, k = 10)
      .collect().map(_.toSeq).toSet
    val c = Retrieval.bm25TopK(docs.coalesce(1), queryMaxId = 1, k = 10)
      .collect().map(_.toSeq).toSet
    assert(a == c)
    // df-capped generation: a cap covering every term changes nothing
    val capped = Retrieval.bm25TopK(docs, queryMaxId = 1, k = 10,
      genDfCap = Some(100L)).collect().map(_.toSeq).toSet
    assert(capped == a, "cap above max df must be a no-op")
    // corpus where "common" appears everywhere and "rare" in one doc:
    // under cap=1 only the rare term generates, yet the admitted doc's
    // score still includes its common-term contribution — while the
    // docs sharing ONLY the common term drop out of the candidate set
    val sw = Seq(
      (0L, "rare common common"),
      (1L, "rare common filler1"),
      (2L, "common filler2 filler3"),
      (3L, "common filler4 filler5")).toDF("doc_id", "text")
    val full = Retrieval.bm25TopK(sw, queryMaxId = 1, k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val pruned = Retrieval.bm25TopK(sw, queryMaxId = 1, k = 10,
        genDfCap = Some(2L)) // df(rare)=2 <= 2, df(common)=4 > 2
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(pruned.keySet == Set(1L), pruned)
    assert(pruned(1L) == full(1L),
      "admitted candidate must carry its EXACT full score incl. common terms")
  }

  test("bm25 RM3 feedback: expansion reaches docs sharing NO original query term") {
    // query doc 0 = {alpha, beta}; doc 1 shares both and carries gamma;
    // doc 2 shares ONLY gamma (invisible to single-pass BM25); doc 3 is
    // unrelated filler. fbDocs=1 → feedback set = {doc 1}; its new
    // terms rank gamma first → pass 2 scores doc 2 via gamma·0.5.
    val docs = Seq(
      (0L, "alpha beta"),
      (1L, "alpha beta gamma"),
      (2L, "gamma delta epsilon"),
      (3L, "zeta eta theta")).toDF("doc_id", "text")
    val pass1 = Retrieval.bm25TopK(docs, queryMaxId = 1, k = 10)
      .collect().map(_.getLong(1)).toSet
    assert(pass1 == Set(1L), s"single-pass reach should be doc 1 only: $pass1")
    val prf = Retrieval.bm25PrfTopK(docs, queryMaxId = 1, k = 10,
        fbDocs = 1, fbTerms = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(prf.map(_._1).toSet == Set(1L, 2L),
      s"expansion must admit doc 2 (shares only the feedback term): ${prf.toSeq}")
    // the original-term doc still outranks the expansion-only doc
    // (original weight 1.0 over two matched terms vs one 0.5 term)
    assert(prf.head._1 == 1L && prf.head._3 == 1)
    // expansion-only score = 0.5 · gamma's plain BM25 contribution for
    // doc 2 (idf over N=4, df(gamma)=2; tf=1, dl=3, avgdl = 11/4)
    val idf = math.log(1.0 + ((4.0 - 2.0) + 0.5) / (2.0 + 0.5))
    val sat = (1.0 * 2.25) / (1.0 + (0.3125 + 0.9375 * (3.0 / 2.75)))
    val want = BigDecimal(BigDecimal(idf * sat * 0.5)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(prf.find(_._1 == 2L).map(_._2).contains(want),
      s"doc 2 score ${prf.find(_._1 == 2L)} != hand-computed $want")
    // partition invariance (order-free sums survive the second pass)
    val a = Retrieval.bm25PrfTopK(docs.repartition(7), queryMaxId = 1,
      k = 10, fbDocs = 1, fbTerms = 2).collect().map(_.toSeq).toSet
    assert(a == prf.map(p => Seq[Any](0L, p._1, p._2, p._3)).toSet)
  }

  test("tokenizer fertility: hand-computed ratios per stratum") {
    val docs = Seq(
      (1L, "en", "hello world"), // bpe "hello"," world" = 2; 11 chars; 2 words
      (2L, "en", "a b"),         // bpe 2; 3 chars; 2 words
      (3L, "de", "übermäßig gut")) // \p{L} spans umlauts: bpe 2; 13 chars; 2 words
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.tokenizerFertility(docs, "lang")
      .orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == Seq(
      ("de", 1L, 2L, 13L, 2L, 0.1538, 1.0),
      ("en", 2L, 4L, 14L, 4L, 0.2857, 1.0)), got)
  }

  test("tfidf: hand-computed weights on a three-doc corpus") {
    val df = Seq((1L, "a a b"), (2L, "a c"), (3L, "c c c")).toDF("doc_id", "text")
    val got = Tfidf.tfidfVectors(df).orderBy("doc_id", "term")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // N=3; df(a)=2, df(b)=1, df(c)=2; idf = (N+1)/(df+1)
    assert(got.toSeq == Seq(
      (1L, "a", 2.0 * 4.0 / 3.0), (1L, "b", 2.0),
      (2L, "a", 4.0 / 3.0), (2L, "c", 4.0 / 3.0),
      (3L, "c", 4.0)).map(t => (t._1, t._2, math.rint(t._3 * 1e4) / 1e4)))
  }

  test("sparse cosine: identical docs hit 1.0, disjoint docs never pair") {
    val df = Seq((1L, "x y z"), (2L, "x y z"), (3L, "p q r")).toDF("doc_id", "text")
    val got = Tfidf.sparseCosinePairs(Tfidf.tfidfVectors(df), threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("sparse cosine: df cap drops stop-term pair-gen but keeps exact dots") {
    // "the" is in every doc (df=4 > cap); docs 1,2 also share rare "alpha"
    // so they still pair — and their dot must INCLUDE the "the" component
    val df = Seq((1L, "the alpha"), (2L, "the alpha"),
      (3L, "the beta"), (4L, "the gamma")).toDF("doc_id", "text")
    val capped = Tfidf.sparseCosinePairs(Tfidf.tfidfVectors(df),
        threshold = 0.0, maxDfFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(capped.toSeq == Seq((1L, 2L, 1.0)),
      s"expected only the rare-term pair at cos 1.0, got ${capped.toSeq}")
  }

  test("sparse cosine: absolute maxDf caps pair-gen even when the frac cap admits") {
    // "zeta" has df=3: a 100% frac cap admits it (3 pairs), but the
    // absolute maxDf=2 blocks it from generation — only the rare "alpha"
    // pair survives, and its dot still INCLUDES the zeta component
    val df = Seq((1L, "zeta alpha"), (2L, "zeta alpha"),
      (3L, "zeta beta"), (4L, "delta gamma")).toDF("doc_id", "text")
    val uncapped = Tfidf.sparseCosinePairs(Tfidf.tfidfVectors(df), threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(uncapped.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val capped = Tfidf.sparseCosinePairs(Tfidf.tfidfVectors(df),
        threshold = 0.0, maxDfFrac = 1.0, maxDf = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(capped.toSeq == Seq((1L, 2L, 1.0)),
      s"expected only the rare-term pair at cos 1.0, got ${capped.toSeq}")
  }

  test("binned quantiles: within one bucket width of the exact quantile") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 2000).map(_ => ("g1", rnd.nextDouble() * 100.0)) ++
      (1 to 500).map(_ => ("g2", 50.0 + rnd.nextGaussian() * 5.0))
    val df = rows.toDF("g", "v")
    val got = Quantiles.binnedQuantiles(df, "v", "g", bins = 1024)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    for ((g, vals) <- rows.groupBy(_._1)) {
      val sorted = vals.map(_._2).sorted
      val width = (sorted.last - sorted.head) / 1024.0
      val (n, p50, p95) = got(g)
      assert(n == vals.size)
      def exact(p: Double) = sorted(math.ceil(p * sorted.size).toInt - 1)
      assert(math.abs(p50 - exact(0.5)) <= width + 1e-9, s"$g p50 $p50 vs ${exact(0.5)}")
      assert(math.abs(p95 - exact(0.95)) <= width + 1e-9, s"$g p95 $p95 vs ${exact(0.95)}")
    }
  }

  test("binned quantiles: constant-valued group reports the constant") {
    val df = Seq(("a", 7.5), ("a", 7.5), ("a", 7.5), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    val got = Quantiles.binnedQuantiles(df, "v", "g", bins = 4)
      .orderBy("g").collect()
    assert(got(0).getDouble(2) == 7.5 && got(0).getDouble(3) == 7.5)
    assert(got(0).getLong(1) == 3L)
  }

  test("binned quantiles: null GROUP keys report like any group") {
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0), (None, 5.0), (None, 7.0))
      .toDF("g", "v")
    val got = Quantiles.binnedQuantiles(df, "v", "g", bins = 4)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    assert(got == Map(Some("a") -> 2L, None -> 2L),
      s"null group must not vanish: $got")
  }

  test("binned quantiles: above the broadcast cap the shuffle-join path is identical") {
    // 50 groups of 20 values each; cap 10 forces the sort-merge fallback
    val rows = for (g <- 0 until 50; i <- 0 until 20) yield (s"g$g", i.toDouble)
    val df = rows.toDF("g", "v")
    val bc = Quantiles.binnedQuantiles(df, "v", "g", bins = 16)
      .orderBy("g").collect().toSeq
    val sm = Quantiles.binnedQuantiles(df, "v", "g", bins = 16,
        broadcastGroupCap = 10)
      .orderBy("g").collect().toSeq
    assert(bc == sm, "broadcast and shuffle-join paths must agree exactly")
    assert(bc.length == 50)
  }

  test("binned quantiles: null values are excluded, not binned") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("a", None), ("a", None))
      .toDF("g", "v")
    val got = Quantiles.binnedQuantiles(df, "v", "g", bins = 4).collect()
    assert(got.length == 1 && got(0).getLong(1) == 2L) // n counts non-null only
  }

  test("log-histogram quantiles: relative-error bound on signed heavy-tailed input") {
    val rnd = new scala.util.Random(11)
    // log-skew magnitudes over ~6 decades, both signs, plus zeros — the
    // shape equal-width bins cannot bound
    val rows = (1 to 4000).map { _ =>
      val sign = if (rnd.nextBoolean()) 1 else -1
      ("g1", sign * math.exp(rnd.nextGaussian() * 4))
    } ++ (1 to 500).map(_ => ("g2", 0.0)) ++
      (1 to 500).map(_ => ("g2", rnd.nextDouble() * 10.0))
    val df = rows.toDF("g", "v")
    val mBits = 6
    val scale = 100.0
    val got = Quantiles.logHistQuantiles(df, "v", Seq("g"), mBits = mBits,
        ps = Seq(0.05, 0.5, 0.95), quantScale = scale)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    for ((g, vals) <- rows.groupBy(_._1)) {
      val sorted = vals.map(_._2).sorted
      val (n, e5, e50, e95) = got(g)
      assert(n == vals.size)
      for ((p, est) <- Seq(0.05 -> e5, 0.5 -> e50, 0.95 -> e95)) {
        val exact = sorted(math.ceil(p * sorted.size).toInt - 1)
        // est is the lower edge of the exact value's magnitude bucket:
        // never above it, and within one bucket width + one quantization
        // step below it (width ≤ max(1, 2^(1-mBits)·|quantized|))
        val slack = (1.0 +
          math.max(1.0, math.pow(2, 1 - mBits) * (math.abs(exact) * scale + 1))) / scale
        assert(est <= exact + 1e-9, s"$g p$p est $est above exact $exact")
        assert(exact - est <= slack + 1e-9,
          s"$g p$p est $est more than $slack below exact $exact")
      }
    }
  }

  test("log-histogram sketch: partials merge by addition under any split") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 3000).map(i =>
      (s"g${i % 3}", (rnd.nextGaussian() * math.pow(10, i % 5)): Double))
    val df = rows.toDF("g", "v")
    val whole = Quantiles.logHistBuckets(df, "v", "g")
      .orderBy("g", "bucket_lo").collect().toSeq
    // split on an arbitrary predicate, sketch each side independently,
    // merge by count addition — the mergeable-summaries contract that
    // makes the sketch micro-batch- and shard-safe
    val h1 = Quantiles.logHistBuckets(df.filter(col("v") >= 0.5), "v", "g")
    val h2 = Quantiles.logHistBuckets(df.filter(col("v") < 0.5), "v", "g")
    val merged = h1.unionByName(h2)
      .groupBy("g", "bucket_lo")
      .agg(sum(col("c")).as("c"), max(col("mx")).as("mx"))
      .orderBy("g", "bucket_lo").collect().toSeq
    assert(merged == whole && whole.nonEmpty)
    // partitioning invariance of the full estimate
    val a = Quantiles.logHistQuantiles(df, "v", "g").orderBy("g").collect().toSeq
    val b = Quantiles.logHistQuantiles(df.repartition(7), "v", "g")
      .orderBy("g").collect().toSeq
    assert(a == b)
  }

  test("log-histogram quantiles: weight w means the row repeated w times") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 300).map(i =>
      (s"g${i % 2}", rnd.nextDouble() * 1000.0, 1L + rnd.nextInt(5)))
    val df = rows.toDF("g", "v", "wt")
    val weighted = Quantiles.logHistQuantiles(df, "v", Seq("g"),
        weightCol = Some("wt"))
      .orderBy("g").collect().toSeq
    // the semantic ground truth: physically replicate each row wt times
    // and sketch unweighted
    val exploded = rows.flatMap { case (g, v, w) =>
      Seq.fill(w.toInt)((g, v)) }.toDF("g", "v")
    val replicated = Quantiles.logHistQuantiles(exploded, "v", "g")
      .orderBy("g").collect().toSeq
    assert(weighted == replicated && weighted.nonEmpty)
    // a negative weight must fail loudly, not walk a non-monotone cum
    val bad = Seq(("g", 1.0, -2L)).toDF("g", "v", "wt")
    val ex = intercept[Exception] {
      Quantiles.logHistQuantiles(bad, "v", Seq("g"), weightCol = Some("wt"))
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("log-histogram quantiles: zeros own a bucket, nulls excluded, null group kept") {
    val df = Seq((Some("a"), Some(-5.0)), (Some("a"), Some(0.0)),
      (Some("a"), Some(0.0)), (Some("a"), Some(3.0)), (Some("a"), None),
      (None, Some(2.0)), (None, Some(4.0)))
      .toDF("g", "v")
    val rows = Quantiles.logHistQuantiles(df, "v", Seq("g"), ps = Seq(0.5, 1.0))
      .collect()
      .map(r => (Option(r.getString(0)), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // group "a": 4 non-null values (-5, 0, 0, 3); p50 rank 2 → 0 (its own
    // bucket, exact); p100 rank 4 → 3.0's bucket lower edge (= 3.0, since
    // |nq|=300 < 2^mBits... no: 300 ≥ 2^6, edge = floor(300/8)*8 = 296 → 2.96)
    val (nA, a50, a100) = rows(Some("a"))
    assert(nA == 4 && a50 == 0.0 && a100 == 2.96)
    // null group key reports like any group: values 2.0, 4.0 → n = 2
    val (nN, _, n100) = rows(None)
    assert(nN == 2 && n100 <= 4.0 && n100 > 3.8)
  }

  test("log-histogram cdf: width recovery partitions the signed line; bracket certifies") {
    // quantScale = 1 makes nq = floor(v): every integer in [-4100, 4100]
    // hits its own quantized point across ~12 exponents on both signs —
    // the edge-only width recovery (positive: bitlength(lo); negative:
    // bitlength(|lo|-1), the 2^e corner fold) must place EVERY value
    // inside its own bucket's recovered [first, last], at mBits = 2
    // where widths vary fastest
    val vals = (-4100 to 4100).map(_.toDouble)
    val df = vals.map(("g", _)).toDF("g", "v")
    val mBits = 2
    val buckets = Quantiles.logHistBuckets(df, "v", Seq("g"),
      mBits = mBits, quantScale = 1.0)
    for (x <- Seq(-4100.0, -257.0, -1.0, 0.0, 1.0, 63.0, 64.0, 255.0,
        256.0, 2049.0, 4100.0)) {
      val r = Quantiles.logHistCdf(buckets, Seq("g"), Seq(x),
        mBits = mBits, quantScale = 1.0).head()
      val exact = vals.count(_ <= x).toDouble / vals.size
      val (lo, hi) = (r.getDouble(2), r.getDouble(3))
      assert(lo <= exact + 1e-12 && exact <= hi + 1e-12,
        s"x=$x: exact $exact outside [$lo, $hi]")
      // the bracket is exactly the straddling bucket's mass — at
      // mBits=2 that is < 2^(1-mBits) = 50% of |x|'s neighborhood,
      // which on this uniform line is a vanishing fraction
      assert(hi - lo <= (math.max(math.abs(x), 4.0) * 0.5 + 2) / vals.size,
        s"x=$x: bracket ${hi - lo} wider than the straddler bound")
    }
    // thresholds beyond both ends pin the degenerate brackets
    val ends = Quantiles.logHistCdf(buckets, Seq("g"),
      Seq(-999999.0, 999999.0), mBits = mBits, quantScale = 1.0).head()
    assert(ends.getDouble(2) == 0.0 && ends.getDouble(3) == 0.0)
    assert(ends.getDouble(4) == 1.0 && ends.getDouble(5) == 1.0)
  }

  test("exact quantile: matches the sorted order statistic across distributions") {
    val rnd = new scala.util.Random(7)
    val shapes: Seq[(String, Seq[Double])] = Seq(
      "uniform" -> (1 to 5000).map(_ => rnd.nextDouble() * 1000.0),
      "heavy-dup" -> ((1 to 3000).map(_ => 42.0) ++
        (1 to 2000).map(_ => rnd.nextDouble() * 10.0)),
      "two-valued" -> ((1 to 2500).map(_ => -1.0) ++ (1 to 2500).map(_ => 1.0)),
      "log-skew" -> (1 to 4000).map(_ => math.exp(rnd.nextGaussian() * 3)))
    for ((name, vals) <- shapes; p <- Seq(0.001, 0.25, 0.5, 0.95, 1.0)) {
      val sorted = vals.sorted
      val want = sorted(math.max(math.ceil(p * vals.size).toInt, 1) - 1)
      // bins=16/cutoff=64 force several real refinement rounds
      val got = Quantiles.exactQuantile(vals.toDF("v"), "v", p,
        bins = 16, cutoff = 64)
      assert(got == want, s"$name p=$p: got $got want $want")
    }
  }

  test("exact quantile: all-equal input and the sub-ulp heavy-duplicate regime") {
    // all equal: converges immediately to lo == hi
    assert(Quantiles.exactQuantile(
      Seq.fill(500)(3.25).toDF("v"), "v", 0.5, bins = 8, cutoff = 16) == 3.25)
    // two subnormal-adjacent values: (hi-lo)/bins underflows to 0.0, so
    // the equal-width histogram can't split — the distinct-value walk
    // must finish exactly. 2000 low rows, 2000 high: p=0.4 lands in the
    // low value, p=0.9 in the high one.
    val lo = 0.0
    val hi = java.lang.Double.MIN_VALUE * 100
    val df = (Seq.fill(2000)(lo) ++ Seq.fill(2000)(hi)).toDF("v")
    assert(Quantiles.exactQuantile(df, "v", 0.4, bins = 4096, cutoff = 16) == lo)
    assert(Quantiles.exactQuantile(df, "v", 0.9, bins = 4096, cutoff = 16) == hi)
  }

  test("exact quantile: non-finite values resolve by rank, huge ranges don't stall") {
    // 10 x -Inf, 30 finite (1..30), 5 x +Inf, 5 x NaN; order is
    // -Inf < finite < +Inf < NaN in both engines. n = 50.
    val vals = Seq.fill(10)(Double.NegativeInfinity) ++
      (1 to 30).map(_.toDouble) ++ Seq.fill(5)(Double.PositiveInfinity) ++
      Seq.fill(5)(Double.NaN)
    val df = scala.util.Random.shuffle(vals).toDF("v")
    def q(p: Double) = Quantiles.exactQuantile(df, "v", p, bins = 4, cutoff = 8)
    assert(q(0.1) == Double.NegativeInfinity) // rank 5
    assert(q(0.5) == 15.0)                    // rank 25 -> finite 15th
    assert(q(0.85) == Double.PositiveInfinity) // rank 43
    assert(q(0.99).isNaN)                     // rank 50
    // a range spanning most of the double line: hi - lo overflows to
    // Inf; the hi/bins - lo/bins width must keep the descent moving
    val wide = (Seq(-1.6e308, 1.6e308) ++ (1 to 500).map(_.toDouble)).toDF("v")
    // n = 502, p = 0.5 -> rank 251 -> 250.0
    assert(Quantiles.exactQuantile(wide, "v", 0.5, bins = 16, cutoff = 32) == 250.0)
  }

  test("exact quantiles: the shared multi-p descent equals per-p runs") {
    val rnd = new scala.util.Random(23)
    val vals = (1 to 4000).map(_ => rnd.nextGaussian() * 100) ++
      Seq.fill(800)(42.0) ++ Seq(Double.PositiveInfinity, Double.NaN)
    val df = vals.toDF("v")
    val ps = Seq(0.01, 0.4, 0.5, 0.9, 0.999, 1.0)
    val together = Quantiles.exactQuantiles(df, "v", ps, bins = 16, cutoff = 64)
    val separate = ps.map(p =>
      Quantiles.exactQuantile(df, "v", p, bins = 16, cutoff = 64))
    assert(together.length == ps.length)
    together.zip(separate).zipWithIndex.foreach { case ((t, s), i) =>
      assert(t == s || (t.isNaN && s.isNaN), s"p=${ps(i)}: $t != $s")
    }
  }

  test("grouped exact quantile: every group matches its sorted order statistic in parallel") {
    val rnd = new scala.util.Random(11)
    // group shapes chosen to diverge: size, duplication, skew, sign,
    // plus a null GROUP KEY (must report like any group) and a group
    // with non-finite values (rank arithmetic per group)
    val groups: Seq[(Option[String], Seq[Double])] = Seq(
      Some("uniform") -> (1 to 4000).map(_ => rnd.nextDouble() * 1000.0),
      Some("heavy-dup") -> ((1 to 2500).map(_ => 42.0) ++
        (1 to 1500).map(_ => rnd.nextDouble() * 10.0)),
      Some("tiny") -> Seq(5.0),
      Some("negatives") -> (1 to 800).map(_ => -rnd.nextDouble() * 50),
      None -> (1 to 1200).map(_ => math.exp(rnd.nextGaussian() * 2)),
      Some("nonfinite") -> (Seq.fill(100)(Double.NegativeInfinity) ++
        (1 to 300).map(_.toDouble) ++ Seq.fill(40)(Double.PositiveInfinity) ++
        Seq.fill(20)(Double.NaN)))
    val rows = groups.flatMap { case (g, vs) => vs.map(v => (g, Some(v))) } ++
      Seq((Some("uniform"), Option.empty[Double])) // null value: excluded from n
    val df = scala.util.Random.shuffle(rows).toDF("g", "v")
    for (p <- Seq(0.05, 0.5, 0.95, 1.0)) {
      // bins=16/cutoff=64: the big groups run several real rounds while
      // "tiny" exits in pass 0 — mixed progress must coexist in state
      val got = Quantiles.exactQuantileBy(df, Seq("g"), "v", p,
          bins = 16, cutoff = 64)
        .collect()
        .map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      assert(got.size == groups.size)
      for ((g, vs) <- groups) {
        // expected: k-th smallest under -Inf < finite < +Inf < NaN
        val sorted = vs.sortWith((a, b) =>
          if (a.isNaN) false else if (b.isNaN) true else a < b)
        val want = sorted(math.max(math.ceil(p * vs.size).toInt, 1) - 1)
        val (n, q) = got(g)
        assert(n == vs.size, s"group $g n")
        assert(q == want || (q.isNaN && want.isNaN),
          s"group $g p=$p: got $q want $want")
      }
    }
  }

  test("grouped exact quantile: sub-ulp duplicate regime per group, no corpus-sized window") {
    // one group stuck in a sub-ulp range (equal-width bucketing cannot
    // split), one normal — the finisher must resolve both from the
    // distinct-value walk
    val lo = 0.0
    val hi = java.lang.Double.MIN_VALUE * 100
    val rows = (Seq.fill(2000)(("subulp", lo)) ++ Seq.fill(2000)(("subulp", hi)) ++
      (1 to 1000).map(i => ("plain", i.toDouble)))
    val df = rows.toDF("g", "v")
    val got = Quantiles.exactQuantileBy(df, Seq("g"), "v", 0.9,
        bins = 4096, cutoff = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("subulp") == hi)
    assert(got("plain") == 900.0)
    // plan sanity on a parquet-backed input: no window may partition by
    // anything other than the group columns (i.e. never corpus-rows)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val out = Quantiles.exactQuantileBy(li, Seq("l_returnflag"),
      "l_extendedprice", 0.95, bins = 16, cutoff = 64)
    // correctness at a realistic table
    val want = li.filter($"l_extendedprice".isNotNull)
      .select($"l_returnflag", $"l_extendedprice")
      .collect().groupBy(_.getString(0))
      .map { case (g, rs) =>
        val vs = rs.map(_.getDouble(1)).sorted
        g -> vs(math.max(math.ceil(0.95 * vs.length).toInt, 1) - 1)
      }
    val gotLi = out.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(gotLi == want)
  }

  test("exact quantile: nulls excluded, empty input fails loudly") {
    val df = Seq(Some(1.0), None, Some(2.0), Some(3.0), None).toDF("v")
    // n = 3 non-null, ceil(0.5*3) = 2 -> 2.0
    assert(Quantiles.exactQuantile(df, "v", 0.5) == 2.0)
    val ex = intercept[IllegalArgumentException] {
      Quantiles.exactQuantile(Seq(Option.empty[Double]).toDF("v"), "v", 0.5)
    }
    assert(ex.getMessage.contains("no non-null"))
  }

  test("sqrt-temperature mix keeps the rarest stratum whole, sizes others by sqrt") {
    val df = (Seq.fill(100)("big") ++ Seq.fill(25)("mid") ++ Seq.fill(4)("rare"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "lang")
    val got = Sampling.sqrtTemperatureMix(df, "lang")
      .orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("big", 100L, 0.2, 20L),    // sqrt(4/100) = 0.2 -> 20 docs = sqrt(4*100)
      ("mid", 25L, 0.4, 10L),     // sqrt(4/25)  = 0.4 -> 10 docs = sqrt(4*25)
      ("rare", 4L, 1.0, 4L)))     // rarest kept whole
  }

  test("funnel: stages count only when strictly ordered per user") {
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"), // full funnel
      (2L, 10L, "click"), (2L, 20L, "view"),                        // click BEFORE view: view only
      (3L, 10L, "view"), (3L, 20L, "purchase"),                     // purchase without click: view only
      (4L, 10L, "view"), (4L, 20L, "click"),                        // view+click
    ).toDF("user_id", "ts", "event_type")
    val got = Events.funnel(ev, Seq("view", "click", "purchase"))
      .orderBy("stage_idx").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(4L, 2L, 1L))
    assert(got.map(_.getDouble(3)).toSeq == Seq(1.0, 0.5, 0.5))   // conv_from_prev
    assert(got.map(_.getDouble(4)).toSeq == Seq(1.0, 0.5, 0.25))  // conv_from_first
  }

  test("dedupRepresentatives keeps the cleanest cluster member, not the lowest id") {
    // doc 1 is the NOISY copy (digits drop alpha_ratio), doc 2 the clean
    // one; near-dup pair (1,2) => cluster canonical_id 1, rep must be 2.
    // doc 9 is a singleton: its own rep.
    val df = Seq(
      (1L, "quick brown foxes jump over lazy dogs 111 222 333"),
      (2L, "quick brown foxes jump over lazy dogs again today"),
      (9L, "entirely unrelated content lives here"),
    ).toDF("doc_id", "text")
    val pairsDf = Seq((1L, 2L)).toDF("doc_id_a", "doc_id_b")
    val got = Dedup.dedupRepresentatives(df, pairsDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(got == Set(
      (1L, 1L, 2L, false),
      (2L, 1L, 2L, true),
      (9L, 9L, 9L, true)), s"got $got")
  }

  test("lshRecall: perfect banding on exact duplicates; vacuous 1.0 on a clean corpus") {
    // 3 exact-dup pairs: jaccard 1.0, every band collides -> recall 1.0,
    // and nothing else shares a shingle -> precision 1.0
    val dups = Seq(
      (1L, "alpha beta gamma delta epsilon"), (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four five six"), (4L, "one two three four five six"),
      (5L, "red green blue cyan magenta"), (6L, "red green blue cyan magenta"),
    ).toDF("doc_id", "text")
    val r = Dedup.lshRecall(dups, threshold = 0.5).head()
    assert(r.getLong(0) == 3L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
    // disjoint docs: zero exact pairs, zero flagged -> vacuous 1.0, not NaN
    val clean = Seq(
      (1L, "aa bb cc dd ee"), (2L, "ff gg hh ii jj"), (3L, "kk ll mm nn oo"),
    ).toDF("doc_id", "text")
    val c = Dedup.lshRecall(clean, threshold = 0.5).head()
    assert(c.getLong(0) == 0L && c.getDouble(3) == 1.0 && c.getDouble(4) == 1.0)
  }

  test("dedupClusters auto-switches to star contraction on deep components") {
    // a 64-node chain needs 63 min-label rounds (one hop per round);
    // maxIter = 12 would leave a pure min-label run with WRONG partial
    // labels — the default starSwitchAfter must hand off to star
    // contraction, which converges in O(log^2 n) rounds
    val n = 64L
    val docsDf = (1L to n).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairsDf = (1L until n).map(i => (i, i + 1)).toDF("doc_id_a", "doc_id_b")
    val got = Dedup.dedupClusters(docsDf, pairsDf, maxIter = 12, driverThreshold = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to n).forall(i => got(i) == 1L),
      s"chain must collapse to root 1 inside 12 rounds: $got")
  }

  test("star contraction == union-find labels on chain, star, and merged shapes") {
    val docsDf = (1L to 12L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // chain 1-2-3-4 (depth the large-star hook must collapse), star around
    // 6, two components merged through a bridge (9-10, 11-12, 10-11),
    // singletons 5
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L), (6L, 8L),
      (9L, 10L), (11L, 12L), (10L, 11L)).toDF("doc_id_a", "doc_id_b")
    val expect = Dedup.dedupClusters(docsDf, pairs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = Dedup.dedupClustersStar(docsDf, pairs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
    assert(expect.take(4).map(_._2) == Seq(1L, 1L, 1L, 1L))
    assert(expect.drop(8).map(_._2) == Seq(9L, 9L, 9L, 9L))
  }

  test("star contraction: deep chain converges in far fewer rounds than diameter") {
    // a 24-node path needs 23 min-label rounds; star contraction must
    // finish inside 10 alternations (O(log² n)) — maxIter enforces it
    val n = 24L
    val docsDf = (0L until n).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_id_a", "doc_id_b")
    val got = Dedup.dedupClustersStar(docsDf, chain, maxIter = 10, checkpointEvery = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == (0L until n).map(i => (i, 0L)))
  }

  test("star contraction: maxIter exit keeps one row per doc (consistent partial labels)") {
    val n = 32L
    val docsDf = (0L until n).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_id_a", "doc_id_b")
    // 1 round cannot converge a 32-node chain — the safety net must still
    // return exactly one labeling row per doc, not a fanned-out join
    val got = Dedup.dedupClustersStar(docsDf, chain, maxIter = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == n.toInt)
    assert(got.map(_._1).distinct.length == n.toInt)
    // labels point DOWNHILL (never above the doc itself) even mid-way
    assert(got.forall { case (d, c) => c <= d })
  }

  test("star contraction: empty pair set labels every doc by itself") {
    val docsDf = (1L to 5L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val none = Seq.empty[(Long, Long)].toDF("doc_id_a", "doc_id_b")
    val got = Dedup.dedupClustersStar(docsDf, none)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == (1L to 5L).map(i => (i, i)))
  }

  test("vec_dot: float and double arrays accepted, int/mixed rejected at analysis time") {
    // array<double> is a first-class input since the residual-IVFADC
    // path (subtractions in double); the typed accessor dispatches
    val dd = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(graft.functions.GraftFunctions.vec_dot($"a", $"b"))
      .head().getDouble(0)
    assert(dd == 11.0)
    // int arrays: still an analysis-time failure, never silent garbage
    val ints = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    val e = intercept[Exception] {
      ints.select(graft.functions.GraftFunctions.vec_dot($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("vec_dot") || e.getMessage.contains("DATATYPE"),
      s"expected analysis-time type failure, got: ${e.getMessage}")
    // mixed float/double: rejected — the element accessor must agree
    val mixed = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0))).toDF("a", "b")
    val e2 = intercept[Exception] {
      mixed.select(graft.functions.GraftFunctions.vec_dot($"a", $"b")).collect()
    }
    assert(e2.getMessage.contains("vec_dot") || e2.getMessage.contains("DATATYPE"))
    // vec_hamming: packed sign words are bigint arrays, nothing else —
    // a float array would popcount garbage bits
    val fl = Seq((Array(1.0f), Array(2.0f))).toDF("a", "b")
    val e3 = intercept[Exception] {
      fl.select(graft.functions.GraftFunctions.vec_hamming($"a", $"b")).collect()
    }
    assert(e3.getMessage.contains("vec_hamming") || e3.getMessage.contains("DATATYPE"))
  }

  test("fused min_hash_sketch aggregate == declarative per-permutation mins") {
    for (n <- Seq(16, 128)) {
      val declarative = Dedup.minHashSignatures(docs, n, 3).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      val fused = Dedup.minHashSignatures(docs, n, 3, fused = true).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      assert(declarative.toSeq == fused.toSeq, s"numHashes=$n")
    }
  }

  test("minhash LSH recalls the planted near-dups found by exact jaccard") {
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.9)
      .select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    val lsh = Dedup.minHashNearDup(docs, threshold = 0.5)
      .select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // jaccard ≈ 0.99 pairs collide in some band with near-certainty
    assert(exact.subsetOf(lsh),
      s"missing pairs: ${exact.diff(lsh)}")
    // and LSH estimates stay honest: no wildly-false positives at est>=0.5
    val falsePos = lsh.diff(exact)
    assert(falsePos.size <= lsh.size / 2, s"too many false positives: $falsePos")
  }

  test("portable minhash LSH recalls the planted near-dups too") {
    // same contract as the xxhash64 family: the md5 a+p*b banding must not
    // lose the jaccard≈0.99 planted pairs
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.9)
      .select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    val lsh = Dedup.minHashNearDupPortable(docs, threshold = 0.5)
      .select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(lsh), s"missing pairs: ${exact.diff(lsh)}")
  }

  test("pipeline curate: keyed chunks, valid splits, survivors only") {
    val out = Pipeline.curate(docs).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // (doc_id, chunk_id) is a key, chunk ids start at 0 per doc
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (d, rs) =>
      val ids = rs.map(_.getInt(2)).sorted
      assert(ids.toSeq == (0 until rs.length), s"doc $d chunk ids: ${ids.toSeq}")
    }
    assert(rows.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
    // near-dup survivors only: every emitted doc is its own cluster canonical
    val keepers = Dedup.dedupClusters(docs,
        Dedup.ngramJaccardPairs(docs, threshold = 0.8))
      .filter(col("doc_id") === col("canonical_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(byDoc.keySet.subsetOf(keepers))
    out.unpersist()
  }

  test("repetition stats: hand-computed fractions, empty doc zeros") {
    val df = Seq(
      (1L, "a a a b"),  // 4 tokens, 2 distinct; bigrams: "a a"x2, "a b" -> 2/3
      (2L, ""),
      (3L, "x"),        // one token: no bigrams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 4L, 0.5, 0.6667),
      (2L, 0L, 0.0, 0.0),
      (3L, 1L, 0.0, 0.0)))
  }

  test("pii redaction: emails, phones, ips replaced and counted") {
    val df = Seq(
      (1L, "mail a.b@x.io or call 555-123-4567 from 10.0.0.1 now"),
      (2L, "clean text without identifiers"),
    ).toDF("doc_id", "text")
    val got = Pii.redact(df).orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got(0) == ("mail <EMAIL> or call <PHONE> from <IP> now", 1L, 1L, 1L))
    assert(got(1) == ("clean text without identifiers", 0L, 0L, 0L))
  }

  test("stratified sample: per-stratum fractions, keep-all and drop-all") {
    val df = docs // has lang column
    val all = Sampling.stratifiedSample(df, "doc_id", "lang", Seq(), default = 1.0)
    assert(all.count() == df.count())
    val none = Sampling.stratifiedSample(df, "doc_id", "lang", Seq(), default = 0.0)
    assert(none.count() == 0)
    // a stratum's members are exactly the plain deterministic sample of it
    val en = Sampling.stratifiedSample(df, "doc_id", "lang",
        Seq("en" -> 0.5), default = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val direct = Sampling.deterministicSample(
        df.filter(col("lang") === "en"), "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(en == direct)
  }

  test("sequence packing: two-level scan == naive global cumsum") {
    import org.apache.spark.sql.expressions.Window
    val chunks = TextAnalysis.chunkDocuments(docs, 16, 4)
    val got = Packing.packSequences(chunks, budget = 64, docBucket = 8)
      .select("doc_id", "chunk_id", "global_offset", "seq_id")
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val w = Window.orderBy("doc_id", "chunk_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = chunks.withColumn("global_offset",
        coalesce(sum(col("n_chunk_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("global_offset") / 64).cast("long"))
      .select("doc_id", "chunk_id", "global_offset", "seq_id")
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == naive.toSeq)
  }

  test("k-means training: deterministic, total assignment, pluggable codebook") {
    val emb = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val run1 = Similarity.trainCodebook(emb, k = 4, iters = 2)
      .orderBy("centroid_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2)))
    CacheRegistry.release(TestSpark.spark)
    val run2 = Similarity.trainCodebook(emb, k = 4, iters = 2)
      .orderBy("centroid_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2)))
    // bit-deterministic across runs (fixed-point means, no float-sum order)
    assert(run1.toSeq == run2.toSeq)
    // every vector assigned exactly once
    assert(run1.map(_._2).sum == emb.count())
    // training moved the centroids off their init vectors
    val init = emb.filter(col("vec_id") < 4).orderBy("vec_id").collect()
      .map(_.getSeq[Float](1))
    assert(run1.map(_._3).zip(init).exists { case (a, b) => a != b })
    // the trained codebook drops into the IVF probe path
    val cb = Similarity.trainCodebook(emb, k = 4, iters = 1)
      .select(col("centroid_id").as("vec_id"), col("embedding"))
    val topk = Similarity.ivfTopKWith(emb, emb.filter(col("vec_id") < 2), 3, cb)
    assert(topk.groupBy("query_id").count().collect().forall(_.getLong(1) == 3))
    emb.unpersist()
    CacheRegistry.release(TestSpark.spark)
  }

  test("semantic dedup: planted near-identical vector dropped, originals kept") {
    val rnd = new scala.util.Random(23)
    val base = (0 until 24).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    // vec 100 ≈ vec 3 (tiny perturbation → cosine ~1); vec 101 ≈ vec 7
    def near(src: Int, id: Long) =
      (id, base(src)._2.map(x => x + 0.001f * rnd.nextGaussian().toFloat))
    val df = (base ++ Seq(near(3, 100L), near(7, 101L)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(df, k = 4, iters = 2, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.size == 26)
    // the planted copies have a smaller-id near-dup (their source) → dropped
    assert(!out(100L)._2 && !out(101L)._2)
    assert(out(3L)._2 && out(7L)._2)
    // a copy lands in its source's cluster (cosine ~1 → same argmax)
    assert(out(100L)._1 == out(3L)._1)
    assert(out(101L)._1 == out(7L)._1)
    // random gaussians in 16-d are near-orthogonal — nothing else drops
    assert(out.count(!_._2._2) == 2)
  }

  test("int8 quantization: round-trip error bounded by half a step") {
    val emb = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val got = Similarity.quantizeInt8(emb).orderBy("vec_id").collect()
    val raw = emb.orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    got.foreach { r =>
      val (id, scale) = (r.getLong(0), r.getDouble(1))
      val xs = raw(id).map(_.toDouble)
      assert(scale > 0)
      // re-derive the codes and check (a) the emitted summary matches and
      // (b) every code reconstructs within half a quantization step
      val codes = xs.map(x => math.max(-127L, math.min(127L,
        math.floor(x / scale + 0.5).toLong)))
      assert(r.getLong(2) == codes.sum, s"q_sum vec $id")
      assert(r.getLong(3) == codes(0) && r.getLong(4) == codes(1))
      codes.zip(xs).foreach { case (q, x) =>
        assert(math.abs(x - q * scale) <= scale * 0.5 + 1e-12,
          s"vec $id reconstruction error")
      }
    }
    emb.unpersist()
  }

  test("edit-distance neardup: small edits found, distance exact") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, base),
      (2L, base.replace("tok7", "tokX")),   // 1 char substitution
      (3L, "entirely different content with no shared trigrams at all ok"),
    ).toDF("doc_id", "text")
    val got = Dedup.editDistanceNearDup(df, maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 1L)))
  }

  test("duplicate spans: shared window found, unique text silent") {
    val shared = (1 to 8).map(i => s"common$i").mkString(" ") // 8-token run
    val df = Seq(
      (1L, s"alpha $shared beta"),
      (2L, s"gamma delta $shared"),
      (3L, "totally unrelated words here making up a sentence of its own"),
    ).toDF("doc_id", "text")
    // span 4, stride 1: the shared run yields identical 4-token windows in
    // docs 1 and 2 (at different offsets); doc 3 must not appear
    val got = Dedup.duplicateSpans(df, spanTokens = 4, stride = 1)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
    // all-unique corpus -> empty report
    assert(Dedup.duplicateSpans(
      df.filter(col("doc_id") === 3L), 4, 1).count() == 0)
    // fraction signal: every doc reports (short docs 0.0), dup docs > 0
    val frac = Dedup.spanDupFraction(df, 4, 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(frac.keySet == Set(1L, 2L, 3L))
    assert(frac(1L) > 0.0 && frac(2L) > 0.0 && frac(3L) == 0.0)
  }

  test("exact duplicate spans: planted boundaries recovered, islands merge, unique silent") {
    // doc 1: 5 unique + 10 shared + 5 unique; doc 2 carries the same
    // 10-token run at a different offset; doc 3 is all-unique
    val shared = (1 to 10).map(i => s"common$i").mkString(" ")
    val df = Seq(
      (1L, s"u11 u12 u13 u14 u15 $shared v11 v12 v13 v14 v15"),
      (2L, s"w21 w22 $shared x21 x22 x23"),
      (3L, "totally unrelated words making a sentence of their own here now"),
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpansExact(df, minTokens = 4)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exact boundaries: doc 1 tokens [5, 15), doc 2 tokens [2, 12) — one
    // merged span each (7 stride-1 windows of 4 tokens), doc 3 absent
    assert(got.toSeq == Seq((1L, 5L, 15L, 10L), (2L, 2L, 12L, 10L)), got.toSeq)
    // two disjoint shared runs in one doc must stay two islands
    val two = Seq(
      (1L, s"$shared a1 a2 a3 a4 a5 $shared"),
      (2L, s"b1 $shared b2"), (3L, s"c1 c2 c3 $shared")).toDF("doc_id", "text")
    val spans1 = Dedup.duplicateSpansExact(two, minTokens = 4)
      .filter(col("doc_id") === 1L).orderBy("span_start").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(spans1.toSeq == Seq((0L, 10L), (15L, 25L)), spans1.toSeq)
    // all-unique corpus -> empty
    assert(Dedup.duplicateSpansExact(
      df.filter(col("doc_id") === 3L), 4).count() == 0)
    // intra-doc-only repetition is NOT reported (cross-doc contract)
    val self = Seq((1L, s"$shared and then $shared"),
      (2L, "nothing shared with the first document at all in any way"))
      .toDF("doc_id", "text")
    assert(Dedup.duplicateSpansExact(self, 4).count() == 0)
  }

  test("self-repetition spans: intra-doc repeats found exactly, cross-doc ignored") {
    val run = (1 to 6).map(i => s"rep$i").mkString(" ")
    val df = Seq(
      // doc 1: 6-token run at positions [2, 8) and again at [11, 17)
      (1L, s"a1 a2 $run b1 b2 b3 $run c1"),
      // doc 2 shares the run CROSS-doc but only once internally -> silent
      (2L, s"d1 $run d2 d3 d4 d5 d6 d7"),
      (3L, "no repeats in this document at all just unique words here"),
    ).toDF("doc_id", "text")
    val got = Dedup.selfRepetitionSpans(df, minTokens = 4)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    // doc 1: both occurrences covered — [2, 8) and [11, 17), each window
    // repeated exactly twice; docs 2 and 3 silent
    assert(got.toSeq == Seq((1L, 2L, 8L, 2L), (1L, 11L, 17L, 2L)), got.toSeq)
    // adjacent self-repeat (x x) merges into one island
    val adj = Seq((1L, s"$run $run tail1 tail2 tail3 tail4"),
      (2L, "entirely different words making up this second document"))
      .toDF("doc_id", "text")
    val spans = Dedup.selfRepetitionSpans(adj, minTokens = 4)
      .filter(col("doc_id") === 1L).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.toSeq == Seq((0L, 12L)), spans.toSeq)
  }

  test("decontaminate drops exactly the flagged docs and keeps the audit trail") {
    val leak = (1 to 6).map(i => s"bench$i").mkString(" ")
    val df = Seq(
      (1L, s"probe text holding the $leak sequence"),        // the probe
      (2L, s"training doc that copied $leak verbatim"),      // contaminated
      (3L, "a clean training document with its own words"),
      (4L, s"another copier of $leak right here")).toDF("doc_id", "text")
    val out = operators.Contamination.decontaminate(df,
        df.filter(col("doc_id") === 1L), minShared = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("dropped"),
        r.getAs[Long]("n_probes_hit")))
    assert(out.toSeq == Seq((1L, false, 0L), (2L, true, 1L),
      (3L, false, 0L), (4L, true, 1L)), out.toSeq)
    // the clean corpus is one filter away, and the report is the same frame
    assert(operators.Contamination.decontaminate(df,
      df.filter(col("doc_id") === 1L), minShared = 2)
      .filter(!col("dropped")).count() == 2L)
  }

  test("SpanStore: seed+append == cold rebuild, replay invisible, pruned probe, compaction invariant") {
    val shared = (1 to 10).map(i => s"common$i").mkString(" ")
    def doc(id: Long, pre: String): (Long, String) =
      id -> s"$pre${(1 to 8).map(i => s"u$id$i").mkString(" ")} $shared"
    val all = (Seq(doc(1L, ""), doc(2L, ""), doc(3L, ""), doc(4L, "")) :+
      (9L -> "entirely unique words with no shared run anywhere at all ok here"))
      .toDF("doc_id", "text")
    val probeDocs = all.filter(col("doc_id") <= 2L)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "p").collect().map(_.toSeq).toSeq

    val t1 = java.nio.file.Files.createTempDirectory("spanstore").toString
    SpanStore.write(all.filter(col("doc_id") % 2 === 0), t1 + "/s", minTokens = 4)
    SpanStore.append(spark, all.filter(col("doc_id") % 2 === 1), t1 + "/s")
    val incr = SpanStore.probe(spark, probeDocs, t1 + "/s")
    // cold rebuild over everything at once
    SpanStore.write(all, t1 + "/cold", minTokens = 4)
    val cold = SpanStore.probe(spark, probeDocs, t1 + "/cold")
    assert(sorted(incr) == sorted(cold), "seed+append must equal cold")
    assert(sorted(incr).nonEmpty, "shared run must hit")
    // replayed append repeats rows but cannot move answers
    SpanStore.append(spark, all.filter(col("doc_id") % 2 === 1), t1 + "/s")
    assert(sorted(SpanStore.probe(spark, probeDocs, t1 + "/s")) == sorted(cold))
    // probe scan must carry a static shard IN-list (PartitionFilters)
    val plan = SpanStore.probe(spark, probeDocs, t1 + "/s")
      .queryExecution.executedPlan.toString
    // Spark prints small IN-lists as "IN (…)" and larger ones as "INSET …"
    assert(plan.contains("PartitionFilters: [shard#") &&
      (plan.contains(" IN (") || plan.contains(" INSET ")),
      plan.split("\n").filter(_.contains("PartitionFilters")).mkString("\n"))
    // …and the batch print set must SEMI-JOIN into the store scan as a
    // broadcast BEFORE any aggregate (r16 task 1): a SortMergeJoin here
    // means store rows shuffle — the store-proportional probe regression
    assert(plan.contains("LeftSemi") &&
      plan.toLowerCase.contains("broadcast"),
      s"probe must broadcast-semi-join the batch prints into the store scan:\n$plan")
    // compaction folds the replayed rows back and keeps answers
    SpanStore.compactStore(spark, t1 + "/s", t1 + "/c")
    assert(spark.read.parquet(t1 + "/c").count() <
      spark.read.parquet(t1 + "/s").count(), "compaction must drop rows")
    assert(sorted(SpanStore.probe(spark, probeDocs, t1 + "/c")) == sorted(cold))
  }

  test("SpanStore bloom sidecar: no false negatives, probe unchanged, appends ride along, compaction carries it") {
    val shared = (1 to 10).map(i => s"common$i").mkString(" ")
    def doc(id: Long, pre: String): (Long, String) =
      id -> s"$pre${(1 to 8).map(i => s"u$id$i").mkString(" ")} $shared"
    val all = (Seq(doc(1L, ""), doc(2L, ""), doc(3L, ""), doc(4L, "")) :+
      (9L -> "entirely unique words with no shared run anywhere at all ok here"))
      .toDF("doc_id", "text")
    val probeDocs = all.filter(col("doc_id") <= 2L)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "p").collect().map(_.toSeq).toSeq

    val t = java.nio.file.Files.createTempDirectory("spanbloom").toString
    SpanStore.write(all.filter(col("doc_id") % 2 === 0), t + "/s", minTokens = 4)
    assert(!SpanStore.hasBloom(t + "/s"))
    SpanStore.writeBloom(spark, t + "/s")
    assert(SpanStore.hasBloom(t + "/s"))
    // append updates the sidecar by default (frozen bit geometry)
    SpanStore.append(spark, all.filter(col("doc_id") % 2 === 1), t + "/s")
    // bloom-path probe ≡ bloomless probe ≡ cold rebuild
    SpanStore.write(all, t + "/cold", minTokens = 4)
    val cold = sorted(SpanStore.probe(spark, probeDocs, t + "/cold"))
    assert(sorted(SpanStore.probe(spark, probeDocs, t + "/s")) == cold,
      "bloom-path probe must equal the cold answer")
    assert(sorted(SpanStore.probe(spark, probeDocs, t + "/s",
      useBloom = false)) == cold, "bloomless probe must equal too")
    // no false negatives: every exact store hit survives the bloom
    val pr = SpanStore.printsOf(spark, probeDocs, t + "/s")
      .select("shard", "span_md5").distinct()
    val maybe = SpanStore.bloomMaybe(spark, pr, t + "/s")
    val exactHits = SpanStore.probe(spark, probeDocs, t + "/s", useBloom = false)
      .select("span_md5").distinct()
    assert(exactHits.join(maybe.select("span_md5"), Seq("span_md5"),
      "left_anti").count() == 0L,
      "a store print the bloom rejects is a false negative")
    // a fully-novel batch is cleared without any store hit
    val novel = Seq(7L -> "totally fresh words nowhere else xq1 xq2 xq3 xq4 xq5")
      .toDF("doc_id", "text")
    assert(SpanStore.probe(spark, novel, t + "/s").count() == 0L)
    assert(SpanStore.bloomMaybe(spark,
      SpanStore.printsOf(spark, novel, t + "/s")
        .select("shard", "span_md5").distinct(), t + "/s").count() == 0L,
      "novel prints must be cleared sidecar-side (no store planning at all)")
    // replayed append repeats sidecar generations; OR folding hides it
    SpanStore.append(spark, all.filter(col("doc_id") % 2 === 1), t + "/s")
    assert(sorted(SpanStore.probe(spark, probeDocs, t + "/s")) == cold)
    // compaction rewrites the sidecar alongside the store
    SpanStore.compactStore(spark, t + "/s", t + "/c")
    assert(SpanStore.hasBloom(t + "/c"), "compaction must carry the sidecar")
    assert(spark.read.parquet(t + "/c_bloom").count() <
      spark.read.parquet(t + "/s_bloom").count(),
      "compaction must OR-fold sidecar generations")
    assert(sorted(SpanStore.probe(spark, probeDocs, t + "/c")) == cold)
    // fused build (write withBloom) == write-then-writeBloom: identical
    // frozen geometry and identical word rows
    SpanStore.write(all.filter(col("doc_id") % 2 === 0), t + "/f",
      minTokens = 4, withBloom = true)
    assert(SpanStore.hasBloom(t + "/f"))
    def bloomRowsOf(dir: String) = spark.read
      .schema("w BIGINT, word BIGINT, shard STRING").parquet(dir + "_bloom")
      .collect().map(_.toSeq).toSet
    SpanStore.write(all.filter(col("doc_id") % 2 === 0), t + "/f2", minTokens = 4)
    SpanStore.writeBloom(spark, t + "/f2")
    assert(bloomRowsOf(t + "/f") == bloomRowsOf(t + "/f2"),
      "fused sidecar build must equal the standalone build")
  }

  test("SpanStore.ingestCurate: trims corpus spans, drops mostly-dup docs, appends only survivors") {
    val shared = (1 to 10).map(i => s"common$i").mkString(" ")
    val seed = Seq(
      1L -> s"seed one unique words here $shared",
      2L -> s"seed two other unique words $shared").toDF("doc_id", "text")
    val batch = Seq(
      // mostly corpus text -> kept frac < 0.5 -> dropped
      10L -> s"tiny bit $shared",
      // half fresh -> trimmed but kept
      11L -> s"fresh alpha beta gamma delta epsilon zeta eta theta iota $shared",
      // no overlap -> untouched
      12L -> "wholly novel content with no shared run anywhere in it at all")
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("curate").toString + "/s"
    SpanStore.write(seed, dir, minTokens = 4)
    val audit = SpanStore.ingestCurate(spark, batch, dir, minKeptFrac = 0.5)
      .orderBy("doc_id").collect()
    val byId = audit.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(10L).getAs[Boolean]("dropped"),
      "mostly-duplicate doc must drop")
    assert(!byId(11L).getAs[Boolean]("dropped"))
    assert(byId(11L).getAs[Long]("n_tokens_kept") == 10L,
      s"doc 11 must keep its 10 fresh tokens: ${byId(11L)}")
    assert(!byId(11L).getAs[String]("text").contains("common1"),
      "the shared run must be trimmed out of the kept text")
    assert(byId(12L).getAs[Long]("n_tokens_kept")
      == byId(12L).getAs[Long]("n_tokens_before"), "clean doc untouched")
    // survivors' prints entered the store; the dropped doc's did not
    val storeIds = spark.read.parquet(dir).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(storeIds == Set(1L, 2L, 11L, 12L), storeIds)
    // anchorsToSpans merges overlapping anchors into one maximal span
    val spans = SpanStore.anchorsToSpans(
      Seq((7L, 0L, 1L), (7L, 1L, 1L), (7L, 2L, 2L), (7L, 20L, 1L))
        .toDF("doc_id", "p", "n_store_docs"), 4)
      .orderBy("span_start").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(spans.toSeq == Seq((0L, 6L, 3L, 2L), (20L, 24L, 1L, 1L)), spans.toSeq)
  }

  test("kCenterSample equals the naive farthest-point greedy; radius non-increasing") {
    val vecs: Seq[(Long, Array[Float])] = Seq(
      0L -> Array(1f, 0f, 0f, 0f), 1L -> Array(0.99f, 0.14f, 0f, 0f),
      10L -> Array(0f, 1f, 0f, 0f), 11L -> Array(0.14f, 0.99f, 0f, 0f),
      20L -> Array(0f, 0f, 1f, 0f), 21L -> Array(0f, 0.14f, 0.99f, 0f),
      30L -> Array(0.5f, 0.5f, 0.5f, 0.5f))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      d / (na * nb)
    }
    def dist(a: Array[Float], b: Array[Float]): Double =
      1.0 - math.round(cos(a, b) * 1e6) / 1e6
    // naive greedy, replicating the operator's exact arithmetic
    val byId = vecs.toMap
    var sel = List(vecs.map(_._1).min)
    var expect = List[(Long, Option[Double])]((sel.head, None))
    (2 to 4).foreach { _ =>
      val cand = vecs.map(_._1).filterNot(sel.contains).map { id =>
        id -> sel.map(s => dist(byId(id), byId(s))).min
      }
      val best = cand.minBy { case (id, d) => (-d, id) }
      sel = best._1 :: sel
      expect = (best._1, Some(best._2)) :: expect
    }
    val got = Similarity.kCenterSample(
        vecs.toDF("vec_id", "embedding"), k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == expect.reverse, s"${got.toSeq} vs ${expect.reverse}")
    // picks must hit all three clusters plus the diagonal outlier: one
    // of {0,1}, one of {10,11}, one of {20,21}, and 30
    val ids = got.map(_._1).toSet
    assert(ids.contains(30L) && Seq(Set(0L, 1L), Set(10L, 11L), Set(20L, 21L))
      .forall(c => ids.intersect(c).size == 1), ids.toString)
    // selection distances never increase
    val ds = got.flatMap(_._2)
    assert(ds.zip(ds.tail).forall { case (a, b) => b <= a }, ds.toSeq)
  }

  test("neighborhoodFunction registers equal the exact h-hop closure's registers") {
    // path 1-2-3-4-5 plus triangle 10-11-12: reach sets are known; the
    // HLL register STATE after h hops must bit-equal the registers of
    // the exact closure (the estimate is approximate, the algebra is
    // not — max-merge over propagated single-item registers IS the
    // union's register table)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val adj = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L,
      10L -> 11L, 11L -> 12L, 12L -> 10L)
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet
    def reach(n: Long, h: Int): Set[Long] = {
      var s = Set(n)
      (1 to h).foreach(_ => s = s ++ s.flatMap(adj.getOrElse(_, Set.empty)))
      s
    }
    val got = Graph.neighborhoodFunction(edges, maxHops = 3, p = 8)
      .orderBy("h", "node").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    for (h <- 1 to 3) {
      val pairs = nodes.toSeq.flatMap(n => reach(n, h).map(m => (n, m.toString)))
      val want = Sketches.hllFinalizeBy(
          Sketches.hllRegistersBy(pairs.toDF("node", "__item"),
            "__item", 8, Seq("node")), 8, Seq("node"))
        .collect().map(r =>
          (h, r.getLong(0)) -> (r.getLong(1), r.getLong(2))).toMap
      want.foreach { case (k, v) =>
        assert(got(k) == v, s"register state at $k: got ${got(k)}, want $v")
      }
    }
    // est includes the node itself and saturates once the component is
    // fully reached: path end node 1 reaches all 5 at h >= 4 == h = 3+1
    assert(got((3, 10L))._1 == got((2, 10L))._1,
      "triangle saturates by h=2; h=3 must be a no-op on its registers")
  }

  test("trimSpans cuts exactly the covered ranges; no-span docs pass whole") {
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7"),
      (2L, "u0 u1 u2 u3"),
    ).toDF("doc_id", "text")
    val spans = Seq((1L, 2L, 4L), (1L, 6L, 8L))
      .toDF("doc_id", "span_start", "span_end")
    val got = Dedup.trimSpans(docs, spans).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "t0 t1 t4 t5", 8L, 4L),
      (2L, "u0 u1 u2 u3", 4L, 4L)), got.toSeq)
    // full coverage -> empty text, zero kept
    val all = Dedup.trimSpans(docs.filter(col("doc_id") === 2L),
        Seq((2L, 0L, 4L)).toDF("doc_id", "span_start", "span_end"))
      .head()
    assert(all.getString(1) == "" && all.getLong(3) == 0L)
    // round-trip: trimming duplicateSpansExact's own report leaves no
    // cross-doc duplicated window behind
    val shared = (1 to 10).map(i => s"common$i").mkString(" ")
    val dup = Seq((1L, s"a1 a2 $shared a3"), (2L, s"b1 $shared"),
      (3L, "untouched unique words in every position here")).toDF("doc_id", "text")
    val trimmed = Dedup.trimSpans(dup, Dedup.duplicateSpansExact(dup, 4))
    assert(Dedup.duplicateSpansExact(trimmed, 4).count() == 0L)
  }

  test("weighted sample: prob 0 drops, prob 1 keeps, column prob == literal cut") {
    assert(Sampling.weightedSample(docs, "doc_id", lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(docs, "doc_id", lit(1.0)).count() == docs.count())
    // a constant column probability must equal the plain sample at the
    // same fraction (same id-hash membership)
    val viaW = Sampling.weightedSample(docs, "doc_id", lit(0.37))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaS = Sampling.deterministicSample(docs, "doc_id", 0.37)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaW == viaS)
  }

  test("mixture plan: binding stratum keeps all, mix ratios hold") {
    val plan = Sampling.mixturePlan(docs, "lang",
        Seq("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.1))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // exactly one listed stratum is binding (keep_frac 1.0); zh unlisted -> 0
    assert(plan.count { case (_, (_, w, f)) => w > 0 && f == 1.0 } == 1)
    assert(plan("zh")._3 == 0.0)
    // achieved mix matches target: kept_s / total_kept == w_s (±rounding)
    val kept = plan.collect { case (s, (n, w, f)) if w > 0 => s -> (n * f, w) }
    val total = kept.values.map(_._1).sum
    kept.foreach { case (s, (k, w)) =>
      assert(math.abs(k / total - w) < 1e-4, s"stratum $s off-target")
    }
  }

  test("keyword scores: absent term zero, more occurrences score higher") {
    val df = Seq(
      (1L, "spark spark spark on a cluster"),
      (2L, "spark appears once here today"),
      (3L, "no relevant words at all present"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.keywordScores(df, Seq("spark"))
      .orderBy("doc_id").collect().map(_.getDouble(1))
    assert(got(0) > got(1), "tf saturation should still rank 3x above 1x")
    assert(got(1) > 0.0 && got(2) == 0.0)
  }

  test("corpus stats: totals agree with tokenCount") {
    val viaStats = TextAnalysis.corpusStats(docs, "lang")
      .agg(sum(col("total_tokens"))).head.getLong(0)
    val direct = TextAnalysis.tokenCount(docs)
      .agg(sum(col("n_tokens"))).head.getLong(0)
    assert(viaStats == direct)
  }

  test("sequence packing: randomized corpora match the naive cumsum") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      // sparse doc ids (bucket-boundary stress), ragged chunk counts,
      // zero-token chunks included
      val rows = (0 until 200).flatMap { _ =>
        val d = rnd.nextInt(100000).toLong
        (0 until (1 + rnd.nextInt(4))).map(c => (d, c, rnd.nextInt(80).toLong))
      }.distinctBy(r => (r._1, r._2)) // (doc, chunk) must be a key: order
                                      // ties would make prefix sums ambiguous
      val chunks = rows.toDF("doc_id", "chunk_id", "n_chunk_tokens")
      val budget = 1 + rnd.nextInt(300)
      val got = Packing.packSequences(chunks, budget, docBucket = 1 + rnd.nextInt(5000))
        .select("doc_id", "chunk_id", "global_offset", "seq_id")
        .orderBy("doc_id", "chunk_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      val w = Window.orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val naive = chunks.withColumn("global_offset",
          coalesce(sum(col("n_chunk_tokens")).over(w), lit(0L)))
        .withColumn("seq_id", floor(col("global_offset") / budget).cast("long"))
        .select("doc_id", "chunk_id", "global_offset", "seq_id")
        .orderBy("doc_id", "chunk_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq == naive.toSeq, s"trial $trial budget $budget")
    }
  }

  test("contamination: shared-shingle counts on a hand case") {
    val corpus = Seq(
      (10L, "a b c d e"),       // shingles: {abc, bcd, cde}
      (11L, "a b c d x"),       // shares {abc, bcd} with 10
      (12L, "p q r s t"),
    ).toDF("doc_id", "text")
    val probes = Seq((1L, "a b c d q")).toDF("doc_id", "text") // {abc, bcd, cdq}
    val got = Contamination.overlapReport(corpus, probes, minShared = 2)
      .orderBy("probe_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 10L, 2L), (1L, 11L, 2L)))
  }

  test("simhash: identical texts equal, near-identical close, distinct far") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different words nothing shared whatsoever here at all"),
    ).toDF("doc_id", "text")
    val h = Dedup.simHashTable(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(hamming(h(1L), h(3L)) < 16, s"near-dup hamming ${hamming(h(1L), h(3L))}")
    assert(hamming(h(1L), h(4L)) > hamming(h(1L), h(3L)))
  }

  test("rolling-hash fingerprint matches direct computation; normalization collapses whitespace/case") {
    val df = Seq((1L, "Spark  Query Engine"), (2L, "spark query engine")).toDF("doc_id", "text")
    val rows = TextAnalysis.fingerprint(df).orderBy("doc_id").collect()
    val direct = RollingHash.hashBytes("Spark  Query Engine".getBytes("UTF-8"))
    assert(rows(0).getLong(1) == direct)
    assert(rows(0).getLong(2) == rows(1).getLong(2), "normalized fingerprints must collapse")
    assert(rows(0).getLong(1) != rows(1).getLong(1), "raw fingerprints must differ")
  }

  test("cosine similarity computes the exact value") {
    val df = Seq(
      (1L, Array(1f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f), 0),
      (3L, Array(3f, 4f, 0f), 0),
    ).toDF("vec_id", "embedding", "label")
    val sim = df.filter($"vec_id" === 1).as("a")
      .crossJoin(df.filter($"vec_id" === 3).as("b"))
      .select(Similarity.cosine($"a.embedding", $"b.embedding").as("c"))
      .head().getDouble(0)
    assert(math.abs(sim - 0.6) < 1e-12)
  }

  test("brute-force top-k: correct neighbors, ranked, k per query") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val res = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 3), k = 5)
      .collect()
    assert(res.length == 15)
    val byQuery = res.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.toSeq == sims.sortBy(-_).toSeq, "ranked descending")
    }
    // spot-check rank-1 of query 0 against a driver-side exact scan
    val all = emb.collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray))
    val q = all.find(_._1 == 0L).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val expectTop = all.filter(_._1 != 0L)
      .map { case (id, v) => (id, BigDecimal(cos(q, v)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, s) => (-s, id) }.head
    val gotTop = res.filter(r => r.getAs[Long]("query_id") == 0L && r.getAs[Int]("rank") == 1)
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).head
    assert(gotTop == expectTop)
  }

  test("sign_lsh_buckets native expression matches the HOF formulation bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 50).map(i => (i.toLong, Array.fill(48)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val tables = 8; val bits = 8
    // the original Column-HOF formulation, kept here as the executable spec
    // of the native expression's hash/sign/projection semantics
    def hofBucket(emb: org.apache.spark.sql.Column, table: Int): org.apache.spark.sql.Column =
      aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, k) => {
        val proj = aggregate(
          zip_with(emb, sequence(lit(0), size(emb) - 1), (x, d) =>
            when(pmod(xxhash64(lit(table), k, d), lit(2)) === 0, x.cast("double"))
              .otherwise(-x.cast("double"))),
          lit(0.0), (a, v) => a + v)
        acc + when(proj > 0, call_function("shiftleft", lit(1L), k)).otherwise(lit(0L))
      })
    val got = df.select($"vec_id",
      graft.functions.GraftFunctions.sign_lsh_buckets($"embedding", tables, bits).as("nb"),
      array((0 until tables).map(t => hofBucket($"embedding", t)): _*).as("hb")).collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"vec ${r.getLong(0)}")
    }
  }

  test("sign-LSH finds planted high-similarity vector pairs") {
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(32)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]): Array[Float] = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val base = (0 until 20).map(_ => vec())
    // ids 0..19 random, ids 100..119 near-duplicates of them
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      base.zipWithIndex.map { case (v, i) => (100L + i, jitter(v)) }
    val df = rows.toDF("vec_id", "embedding")
    val found = Similarity.lshNearDup(df, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 20).map(i => (i.toLong, 100L + i)).toSet
    // sign-LSH at 8 tables x 8 bits: cos≈0.999 pairs collide with
    // overwhelming probability; require near-total recall
    assert(expected.diff(found).size <= 1, s"missed: ${expected.diff(found)}")
  }

  test("IVF top-k returns k hits per query from the probed cluster") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val res = Similarity.ivfTopK(emb, emb.filter($"vec_id" < 3), k = 3)
    val n = res.groupBy("query_id").count().collect()
    assert(n.length == 3 && n.forall(_.getLong(1) == 3L))
  }

  test("IVF with all clusters probed == exact brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 3)
    val nCentroids = 32
    val ivf = Similarity.ivfTopK(emb, queries, k = 3,
        numCentroids = nCentroids, nprobe = nCentroids)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2))).toSet
    val brute = Similarity.bruteForceTopK(emb, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2))).toSet
    assert(ivf == brute)
  }

  test("IVF recall telemetry: monotone in nprobe, 1.0 at full probe depth") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 3)
    val rep = Similarity.ivfRecall(emb, queries, k = 3,
        numCentroids = 32, nprobes = Seq(1, 4, 32))
      .orderBy("nprobe").collect()
    assert(rep.map(_.getInt(0)).toSeq == Seq(1, 4, 32))
    assert(rep.forall(_.getLong(1) == 9L), "exact_pairs = k * |queries|")
    val recalls = rep.map(_.getDouble(4))
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)), "recall monotone in nprobe")
    // nprobe = numCentroids degenerates to brute force -> recall exactly 1.0
    assert(recalls.last == 1.0)
  }

  test("quantized IVF with a full rerank pool == full-precision IVF") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 3)
    // rerank pool covers every probed candidate -> the exact-cosine final
    // ranking must coincide with the full-precision operator's output
    val qz = Similarity.ivfTopKQuantized(emb, queries, k = 3,
        numCentroids = 32, nprobe = 2, rerankFactor = 100000)
      .select("query_id", "vec_id", "cos_sim", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val fp = Similarity.ivfTopK(emb, queries, k = 3, numCentroids = 32, nprobe = 2)
      .select("query_id", "vec_id", "cos_sim", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(qz == fp)
  }

  test("IVF centroid count is fixed, independent of corpus size") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert(Similarity.pseudoCentroids(emb, 8).count() == 8)
    // 2x the corpus, same codebook size — assignment work scales O(n·k), not O(n²)
    assert(Similarity.pseudoCentroids(emb.union(emb.withColumn("vec_id", $"vec_id" + 1000)), 8)
      .count() == 8)
  }

  test("IVF accepts an offline codebook (ivfTopKWith)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 3)
    // a hand-picked codebook: every 100th vector
    val codebook = emb.filter($"vec_id" % 100 === 0).select("vec_id", "embedding")
    val res = Similarity.ivfTopKWith(emb, queries, k = 3, codebook)
    val n = res.groupBy("query_id").count().collect()
    assert(n.length == 3 && n.forall(_.getLong(1) == 3L))
  }

  test("deterministic shuffle: total 0-based rank, partition-independent, seed-sensitive") {
    val base = docs.select("doc_id")
    val r1 = Sampling.deterministicShuffle(base, seed = 7L)
    val ranks = r1.select("shuffle_rank").as[Long].collect().sorted
    assert(ranks.toSeq == (0L until 500L))   // a permutation, contiguous
    // the two-level rank equals a flat global row_number over the key order
    val flat = r1.withColumn("__flat",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("shuffle_key"), col("doc_id"))).cast("long") - 1)
      .filter(col("shuffle_rank") =!= col("__flat")).count()
    assert(flat == 0)
    // partitioning must not change the order
    val r8 = Sampling.deterministicShuffle(base.repartition(8), seed = 7L)
      .select("doc_id", "shuffle_rank").as[(Long, Long)].collect().toMap
    val r1m = r1.select("doc_id", "shuffle_rank").as[(Long, Long)].collect().toMap
    assert(r8 == r1m)
    // a different seed is a different epoch order
    val r2 = Sampling.deterministicShuffle(base, seed = 8L)
      .select("doc_id", "shuffle_rank").as[(Long, Long)].collect().toMap
    assert(r2 != r1m)
  }

  test("token budget sample: equals a driver-side greedy walk of the shuffle order") {
    val budget = 5000L
    val got = Sampling.tokenBudgetSample(docs, budget, seed = 5L)
      .select("doc_id", "token_offset", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._2)
    // independent replay: shuffle order from the operator's own key, greedy cumsum
    val order = Sampling.deterministicShuffle(docs.select("doc_id", "text"), seed = 5L)
      .withColumn("__nt", size(TextAnalysis.tokens(col("text"))).cast("long"))
      .select("doc_id", "shuffle_rank", "__nt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._2)
    var cum = 0L
    val want = order.flatMap { case (id, _, nt) =>
      val keep = if (cum < budget) Some((id, cum, nt)) else None
      cum += nt
      keep
    }
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty && got.length < 500) // strict non-trivial subset
  }

  test("deterministic split: stable, partition-independent, ~fractional") {
    val split = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(math.abs(counts("train") / n - 0.8) < 0.05, counts.toString)
    // same ids -> same assignment, regardless of partitioning
    val again = Sampling.deterministicSplit(docs.repartition(7), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    split.select("doc_id", "split").collect()
      .foreach(r => assert(again(r.getLong(0)) == r.getString(1)))
    // sample(f) is exactly the bucket-prefix subset
    val s = Sampling.deterministicSample(docs, "doc_id", 0.3)
    assert(math.abs(s.count() / n - 0.3) < 0.05)
  }

  test("ngram jaccard: loose frequency cap equals the exact branch") {
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = key(Dedup.ngramJaccardPairs(docs, threshold = 0.8).collect())
    // a cap no shingle reaches must not change anything (pins the
    // capped branch's recomputed per-doc counts after the r4 rework)
    val capped = key(Dedup.ngramJaccardPairs(docs, threshold = 0.8,
      maxShingleFreq = Some(1 << 20)).collect())
    assert(exact == capped)
    assert(exact.nonEmpty)
  }

  test("chunking: sliding windows cover every token, short docs intact") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "one two"),
      (3L, "")
    ).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(df, chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
    // stride 3: starts 0,3,6 cover tokens 1..10 with 1-token overlap
    assert(chunks.toSeq == Seq(
      (1L, 0, "t1 t2 t3 t4"),
      (1L, 1, "t4 t5 t6 t7"),
      (1L, 2, "t7 t8 t9 t10"),
      (2L, 0, "one two"),
      (3L, 0, "")))
  }

  test("vocabTopK: frequency-ordered with deterministic tie cut") {
    val v = TextAnalysis.vocabTopK(docs, 20).collect()
    assert(v.length == 20)
    val occ = v.map(_.getLong(1))
    assert(occ.sameElements(occ.sortBy(-_)), "descending by occurrences")
    v.foreach(r => assert(r.getLong(2) <= r.getLong(1),
      "doc_freq cannot exceed occurrences"))
  }

  test("as-of join: inclusive latest-at-or-before per key, null when none") {
    val left = Seq(
      (1L, 10L, 100L), // k=10: before any right row -> no match
      (2L, 10L, 200L), // matches right ts=200 (inclusive tie)
      (3L, 10L, 350L), // matches right ts=300 (carry-forward past 200)
      (4L, 20L, 500L)  // other key: only k=20 rights considered
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (90L, 10L, 200L, 2.0),
      (91L, 10L, 300L, 3.0),
      (92L, 20L, 400L, 4.0),
      (93L, 30L, 100L, 9.9) // unrelated key
    ).toDF("event_id", "user_id", "ts", "value")
    val res = AsOf.asOfJoin(left, right, "user_id", "ts", Seq("event_id", "value"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4)))
    assert(res.toSeq == Seq(
      (1L, -1L, -1.0), (2L, 90L, 2.0), (3L, 91L, 3.0), (4L, 92L, 4.0)))
  }

  test("range join: bucketed equi-join equals direct containment") {
    val points = Seq(
      (1L, 10L, 150L), (2L, 10L, 100L), (3L, 10L, 301L), (4L, 20L, 150L)
    ).toDF("event_id", "user_id", "ts")
    val intervals = Seq(
      (90L, 10L, 100L, 300L), // matches 1 (inside), 2 (start-inclusive); not 3
      (91L, 20L, 140L, 160L), // other key; crosses no bucket boundary
      (92L, 10L, 250L, 500L)  // spans buckets; matches 3 and 1? 150<250 no; 301 yes
    ).toDF("err_id", "user_id", "win_start", "win_end")
    val res = RangeJoin.pointInInterval(points, intervals,
        "user_id", "ts", "win_start", "win_end", bucketWidth = 100L)
      .select("event_id", "err_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res == Set((1L, 90L), (2L, 90L), (3L, 92L), (4L, 91L)))
    // brute-force equivalence on the same data
    val brute = points.as("l").join(intervals.as("r"),
        col("l.user_id") === col("r.user_id") &&
          col("l.ts") >= col("r.win_start") && col("l.ts") <= col("r.win_end"))
      .select(col("l.event_id"), col("r.err_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res == brute)
  }

  test("interval overlap join: exactly-once pairs equal to brute force") {
    val left = Seq(
      (1L, 10L, 100L, 350L),  // spans buckets 1-3 at width 100
      (2L, 10L, 400L, 420L),
      (3L, 20L, 100L, 350L),  // other key
      (4L, 10L, 500L, 900L)   // long interval, many shared buckets
    ).toDF("left_id", "user_id", "l_start", "l_end")
    val right = Seq(
      (90L, 10L, 300L, 600L), // overlaps 1 (multi-bucket overlap), 2, 4
      (91L, 10L, 840L, 1000L),// overlaps 4 only
      (92L, 20L, 351L, 400L), // adjacent but NOT overlapping 3 (351 > 350)
      (93L, 20L, 350L, 400L)  // touches 3 at a point — inclusive ends match
    ).toDF("right_id", "user_id", "r_start", "r_end")
    val res = RangeJoin.intervalOverlap(left, right, "user_id",
        "l_start", "l_end", "r_start", "r_end", bucketWidth = 100L)
      .select("left_id", "right_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // exactly-once: no pair appears twice even when overlap spans buckets
    assert(res.length == res.toSet.size, s"duplicated pairs in ${res.toSeq}")
    val brute = left.as("l").join(right.as("r"),
        col("l.user_id") === col("r.user_id") &&
          col("l.l_start") <= col("r.r_end") && col("r.r_start") <= col("l.l_end"))
      .select(col("l.left_id"), col("r.right_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res.toSet == brute)
    assert(brute == Set((1L, 90L), (2L, 90L), (4L, 90L), (4L, 91L), (3L, 93L)))
  }

  test("operator explodes stay free of InferFiltersFromGenerate blowup") {
    // plain explode(computedArray) would re-inline the array pipeline into
    // a pushed-down size()>0 filter (measured 8.5s vs 0.6s at sf0.1); the
    // operators use explode_outer + isNotNull so no such filter may appear
    for (df <- Seq(
        Dedup.minHashSignatures(docs, 4, 3),
        Dedup.minHashSignaturesPortable(docs, 4, 3),
        Dedup.simHashTable(docs))) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("size(array_distinct") && !plan.contains("size(transform(")
        && !plan.contains("size(filter(split"),
        s"inferred generate filter re-evaluates the array pipeline:\n${plan.take(2000)}")
    }
  }

  test("sequence packing plan: bucketed window + broadcast offsets, no global sort of rows") {
    val plan = Packing.packSequences(
        TextAnalysis.chunkDocuments(docs, 64, 16), budget = 256, docBucket = 64)
      .queryExecution.executedPlan.toString
    // the row-scale window must be partitioned by the bucket key
    assert(plan.contains("windowspecdefinition(__b#"),
      s"expected a bucket-partitioned window:\n${plan.take(2000)}")
    // bucket offsets come back via broadcast, not a row-scale shuffle join
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast offsets join:\n${plan.take(2000)}")
    // the only SinglePartition exchange feeds the per-bucket offsets
    // aggregate (one row per bucket), never the chunk rows: it must sit
    // above a HashAggregate on __b in the plan tree's offsets branch
    val single = plan.linesIterator.filter(_.contains("Exchange SinglePartition")).size
    assert(single == 1, s"expected exactly one tiny SinglePartition exchange, got $single")
  }

  test("portable md5 simhash: token hash matches the cross-engine value") {
    // 0x5d41402abc4b2a7 = first 15 hex chars of md5("hello"); pinned
    // against DuckDB's CAST(concat('0x', substr(md5(tok),1,15)) AS BIGINT)
    val v = Seq("hello").toDF("t")
      .select(Dedup.md5Token60($"t")).head.getLong(0)
    assert(v == 419982666956583591L)
    val sh = Dedup.simHashTablePortable(docs)
    assert(sh.count() == docs.count())
    // 60-bit signatures are always non-negative
    assert(sh.filter($"simhash" < 0L).count() == 0)
  }

  test("CacheRegistry.release drops operator-persisted intermediates") {
    // earlier tests in this suite run the same operators; drop their
    // tracked caches first so the same-plan persist below isn't a no-op
    CacheRegistry.release(spark)
    docs.count() // materialize the fixture's own cache before measuring
    // Identity-based check, not cardinality: the ContextCleaner can
    // concurrently reclaim UNTRACKED caches left by earlier tests, so a
    // global size before/after comparison is racy (round-9 verdict). We
    // instead assert that NEW rdd ids appear and that exactly those ids
    // vanish on release.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.minHashNearDup(docs, threshold = 0.5).count()
    val fresh = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(fresh.nonEmpty, "operator should have persisted new intermediates")
    CacheRegistry.release(spark)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(fresh.forall(id => !after.contains(id)),
      s"release should unpersist every tracked intermediate; still cached: ${fresh & after}")
    // idempotent and safe when nothing is tracked
    CacheRegistry.release(spark)
  }

  test("Lineage.release frees a localCheckpoint cut's storage blocks") {
    // the test session has a reliable checkpoint dir (TestSpark), so
    // Lineage.cut would take the reliable path here; build the
    // localCheckpoint-backed shape (what cut returns when no dir is
    // set — plain library sessions) directly
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cutDf = spark.range(100).toDF("n").withColumn("sq", $"n" * $"n")
      .localCheckpoint(true)
    assert(cutDf.count() == 100)
    val fresh = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(fresh.nonEmpty, "cut should persist a checkpointed RDD")
    graft.operators.Lineage.release(cutDf)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(fresh.forall(id => !after.contains(id)),
      s"release should drop the checkpoint blocks; still cached: ${fresh & after}")
    // a derived (non-cut) frame is a safe no-op: top-level match only
    graft.operators.Lineage.release(spark.range(5).toDF("n"))
  }

  test("Lineage.release(deleteFiles) deletes a dead reliable cut's checkpoint files") {
    // the reliable path stores a cut as FILES under the checkpoint dir;
    // rdd.unpersist frees nothing there (advisor r10) — deleteFiles must
    // remove the directory itself
    val df = spark.range(50).toDF("n").withColumn("sq", $"n" * $"n")
    df.persist()
    val cp = df.checkpoint(true)
    df.unpersist()
    val lr = cp.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    val dir = lr.rdd.getCheckpointFile
    assert(dir.isDefined, "reliable checkpoint should record its file dir")
    val p = new org.apache.hadoop.fs.Path(dir.get)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(p))
    graft.operators.Lineage.release(cp, deleteFiles = true)
    assert(!fs.exists(p), "release(deleteFiles) should remove the dead cut's files")
  }

  test("star-contraction loop releases dead per-round cut storage") {
    // a 24-node chain forces several contraction rounds, each cutting
    // lineage; the loop must free every dead round's blocks as it goes
    // (r10 verdict #1). Upper-bound identity check (anti-flake: the
    // ContextCleaner can only REMOVE persisted ids, never add): of the
    // RDD ids the call leaves behind, at most the final tracked edges
    // cut should remain — a broken release leaks one id per round.
    CacheRegistry.release(spark)
    val n = 24L
    val docsDf = (0L until n).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_id_a", "doc_id_b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val labels = Dedup.dedupClustersStar(docsDf, chain, maxIter = 10, checkpointEvery = 3)
    assert(labels.count() == n)
    val fresh = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(fresh.size <= 2,
      s"star loop should free dead round cuts as it goes; leaked ids: $fresh")
    CacheRegistry.release(spark)
  }

  test("multimodal: PPM decoder parses a hand-built fixture with header comments") {
    // 2x2 image, comment between tokens, known pixel bytes
    val header = "P6 # a comment\n# another\n2\n2\n255\n"
    val px = Array[Byte](
      10, 20, 30,  40, 50, 60,     // row 0: (10,20,30) (40,50,60)
      70, 80, 90,  100, 110, 120)  // row 1
    val img = Multimodal.decodePpm(header.getBytes("US-ASCII") ++ px)
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == px.toSeq)
  }

  test("multimodal: BMP decoder handles row padding, bottom-up order, BGR") {
    // hand-build a 3x2 24bpp BMP: rowSize = 12 (9 data + 3 pad), bottom-up
    import java.nio.{ByteBuffer, ByteOrder}
    val rowSize = 12
    val buf = ByteBuffer.allocate(54 + rowSize * 2).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * 2).putInt(0).putInt(54)
    buf.putInt(40).putInt(3).putInt(2).putShort(1).putShort(24)
    buf.putInt(0).putInt(rowSize * 2).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // file row 0 = image BOTTOM row (y=1), stored BGR
    buf.put(Array[Byte](3, 2, 1,  6, 5, 4,  9, 8, 7,  0, 0, 0))       // y=1: RGB (1,2,3)(4,5,6)(7,8,9)
    buf.put(Array[Byte](13, 12, 11,  16, 15, 14,  19, 18, 17,  0, 0, 0)) // y=0: RGB (11,12,13)...
    val img = Multimodal.decodeBmp(buf.array())
    assert(img.width == 3 && img.height == 2)
    assert(img.rgb.toSeq == Seq[Byte](
      11, 12, 13, 14, 15, 16, 17, 18, 19, // top row y=0
      1, 2, 3, 4, 5, 6, 7, 8, 9))         // bottom row y=1
  }

  test("multimodal: BMP decoder honors top-down row order (negative height)") {
    import java.nio.{ByteBuffer, ByteOrder}
    val rowSize = 12 // 3px * 3B + 3 pad
    val buf = ByteBuffer.allocate(54 + rowSize * 2).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * 2).putInt(0).putInt(54)
    buf.putInt(40).putInt(3).putInt(-2).putShort(1).putShort(24) // height -2 => top-down
    buf.putInt(0).putInt(rowSize * 2).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // file row 0 IS image row y=0 in top-down order
    buf.put(Array[Byte](13, 12, 11,  16, 15, 14,  19, 18, 17,  0, 0, 0)) // y=0
    buf.put(Array[Byte](3, 2, 1,  6, 5, 4,  9, 8, 7,  0, 0, 0))          // y=1
    val img = Multimodal.decodeBmp(buf.array())
    assert(img.width == 3 && img.height == 2)
    assert(img.rgb.toSeq == Seq[Byte](
      11, 12, 13, 14, 15, 16, 17, 18, 19,
      1, 2, 3, 4, 5, 6, 7, 8, 9))
  }

  test("multimodal: WAV decoder walks chunks, skipping unknown ones") {
    import java.nio.{ByteBuffer, ByteOrder}
    val samples = Array[Short](100, -200, 300)
    // RIFF with a LIST chunk of odd size (tests the RIFF pad byte) before data
    val listBody = Array[Byte](1, 2, 3) // odd size -> 1 pad byte
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(12 + 24 + (8 + 4) + 8 + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(buf.capacity - 8); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1).putShort(2).putInt(44100).putInt(44100 * 4).putShort(4).putShort(16)
    buf.put("LIST".getBytes); buf.putInt(3); buf.put(listBody); buf.put(0.toByte)
    buf.put("data".getBytes); buf.putInt(dataSize)
    samples.foreach(buf.putShort)
    val a = Multimodal.decodeWav(buf.array())
    assert(a.sampleRate == 44100 && a.channels == 2)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("multimodal: codecs round-trip exactly at awkward sizes") {
    for (w <- Seq(1, 3, 5, 17); h <- Seq(1, 2, 7)) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + w + h) % 256).toByte)
      val img = Multimodal.ImageData(w, h, rgb)
      assert(Multimodal.decodePpm(Multimodal.encodePpm(img)).rgb.toSeq == rgb.toSeq,
        s"ppm $w x $h")
      val back = Multimodal.decodeBmp(Multimodal.encodeBmp(img))
      assert(back.width == w && back.height == h && back.rgb.toSeq == rgb.toSeq,
        s"bmp $w x $h")
    }
    for (n <- Seq(0, 1, 2, 255)) {
      val s = Array.tabulate(n)(i => ((i * 991) % 65536 - 32768).toShort)
      val a = Multimodal.decodeWav(Multimodal.encodeWav(Multimodal.AudioData(8000, 1, s)))
      assert(a.samples.toSeq == s.toSeq && a.sampleRate == 8000, s"wav n=$n")
    }
  }

  test("multimodal: aHash hand case, format independence, audio skipped") {
    // 2×2 image, row 0 dark / row 1 bright: the 8×8 thumbnail maps rows
    // 0-3 to source row 0 and 4-7 to row 1, so the above-mean test sets
    // exactly the bottom 32 bits
    val rgb = Array[Byte](10, 10, 10, 10, 10, 10, 100, 100, 100, 100, 100, 100)
    val img = Multimodal.ImageData(2, 2, rgb)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(0L, Multimodal.encodePpm(img)),
        org.apache.spark.sql.Row(1L, Multimodal.encodeBmp(img)),
        org.apache.spark.sql.Row(2L, Multimodal.encodeWav(
          Multimodal.AudioData(8000, 1, Array.tabulate(16)(_.toShort)))))),
      Multimodal.mediaSchema)
    val hashes = Multimodal.imageAHash(spark, media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // audio row drops; ppm and bmp of the SAME pixels hash identically
    assert(hashes.keySet == Set(0L, 1L))
    assert(hashes(0L) == 0x00000000FFFFFFFFL && hashes(1L) == hashes(0L))
  }

  test("multimodal: aHash banded pairs — pigeonhole, band miss, bucket cap") {
    def hdf(rows: (Long, Long)*) = rows.toDF("doc_id", "phash")
    // hamming 3 inside one band: pigeonhole guarantees the pair
    val close = Multimodal.aHashPairs(hdf(1L -> 0L, 2L -> 7L)).collect()
    assert(close.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((1L, 2L, 3)))
    // hamming 4 spread over all four bands: no band collides AND the
    // verify threshold excludes it — absent either way
    val spread = 0x0001000100010001L
    assert(Multimodal.aHashPairs(hdf(1L -> 0L, 2L -> spread)).count() == 0)
    // 70 identical hashes: cap 64 drops the bucket entirely, cap 128
    // yields all C(70,2) pairs at hamming 0
    val many = hdf((1L to 70L).map(i => i -> 42L): _*)
    assert(Multimodal.aHashPairs(many, maxBucket = 64).count() == 0)
    assert(Multimodal.aHashPairs(many, maxBucket = 128).count() == 70L * 69 / 2)
    // exactness guard: maxHamming >= bands is refused, not silently lossy
    intercept[IllegalArgumentException] {
      Multimodal.aHashPairs(hdf(1L -> 0L), maxHamming = 4, bands = 4)
    }
  }

  test("multimodal: audio energy hash hand cases") {
    def wav(id: Long, samples: Array[Short]) =
      org.apache.spark.sql.Row(id,
        Multimodal.encodeWav(Multimodal.AudioData(8000, 1, samples)))
    val quietLoud = Array.tabulate[Short](128)(i => if (i < 64) 0 else 100)
    val flat = Array.fill[Short](256)(7)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        wav(0L, quietLoud),           // bottom 32 windows carry all energy
        wav(1L, flat),                // every window at the mean → all bits
        wav(2L, Array.fill[Short](63)(5)), // < 64 samples: skipped
        org.apache.spark.sql.Row(3L, Multimodal.encodePpm(
          Multimodal.ImageData(1, 1, Array[Byte](1, 2, 3)))))), // image: skipped
      Multimodal.mediaSchema)
    val h = Multimodal.audioEnergyHash(spark, media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h.keySet == Set(0L, 1L))
    assert(h(0L) == 0x00000000FFFFFFFFL, f"got ${h(0L)}%016x")
    assert(h(1L) == -1L)
    // the audio hashes ride the SAME banding operator
    val hashes = Multimodal.audioEnergyHash(spark, media)
    assert(Multimodal.aHashPairs(hashes, hashCol = "ehash").count() == 0)
  }

  test("multimodal: synthesize -> sniff -> decode matches the closed form end to end") {
    val df = Seq(
      (0L, "x", "en", "s", 100L),  // ppm
      (1L, "x", "en", "s", 101L),  // bmp
      (2L, "x", "en", "s", 102L),  // wav mono (even n_chars)
      (3L, "x", "en", "s", 0L),    // ppm at the minimum size
      (5L, "x", "en", "s", 103L),  // wav stereo (odd n_chars)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = Multimodal.decodeFeatures(spark, Multimodal.synthesizeMedia(spark, df))
      .orderBy("doc_id").collect()
    assert(feats.map(_.getString(1)).toSeq == Seq("ppm", "bmp", "wav", "ppm", "wav"))
    // replay the generation closed form in plain Scala
    val nCharsOf = Map(0L -> 100L, 1L -> 101L, 2L -> 102L, 3L -> 0L, 5L -> 103L)
    for (r <- feats) {
      val (id, nChars) = (r.getLong(0), nCharsOf(r.getLong(0)))
      if (id % 3 < 2) {
        val w = (16 + nChars % 48).toInt; val h = (16 + 7 * nChars % 48).toInt
        assert(r.getInt(2) == w && r.getInt(3) == h && r.getInt(4) == 3)
        assert(r.getLong(6) == w.toLong * h)
        for (c <- 0 until 3)
          assert(r.getLong(7 + c) ==
            w.toLong * (0 until h).map(y => (id + y + 85 * c) % 256).sum, s"doc $id chan $c")
      } else {
        val ch = (1 + nChars % 2).toInt
        val total = (256 + nChars % 512).toInt * ch
        assert(r.getInt(5) == 8000 && r.getInt(4) == ch && r.getLong(6) == total / ch)
        for (c <- 0 until 2)
          assert(r.getLong(7 + c) ==
            (0 until total).filter(_ % ch == math.min(c, ch - 1) && ch > c)
              .map(i => (7 * id + 13 * i) % 2048 - 1024).sum, s"doc $id chan $c")
      }
    }
  }

  test("multimodal: concatenated-P6 stream decodes frame-at-a-time, mixed sizes") {
    val f0 = Multimodal.ImageData(2, 1, Array[Byte](1, 2, 3, 4, 5, 6))
    val f1 = Multimodal.ImageData(1, 2, Array[Byte](7, 8, 9, 10, 11, 12))
    val f2 = Multimodal.ImageData(1, 1, Array[Byte](13, 14, 15))
    val back = Multimodal.decodePpmStream(Multimodal.encodePpmStream(Seq(f0, f1, f2)))
    assert(back.length == 3)
    assert(back(0).width == 2 && back(0).height == 1 && back(0).rgb.toSeq == f0.rgb.toSeq)
    assert(back(1).width == 1 && back(1).height == 2 && back(1).rgb.toSeq == f1.rgb.toSeq)
    assert(back(2).rgb.toSeq == f2.rgb.toSeq)
    // empty stream is zero frames, not an error
    assert(Multimodal.decodePpmStream(Array.empty[Byte]).isEmpty)
    // a truncated second frame must fail loudly, not return garbage
    val bytes = Multimodal.encodePpmStream(Seq(f0, f1))
    intercept[IllegalArgumentException] {
      Multimodal.decodePpmStream(bytes.dropRight(1))
    }
  }

  test("multimodal: nearest-neighbor resize samples floor(out*src/dst) exactly") {
    // 4x2 source with distinct pixels; downscale to 2x1 keeps (0,0) and (2,0)
    val rgb = Array.tabulate(4 * 2 * 3)(i => i.toByte)
    val img = Multimodal.ImageData(4, 2, rgb)
    val down = Multimodal.resizeNearest(img, 2, 1)
    assert(down.rgb.toSeq == Seq[Byte](0, 1, 2, 6, 7, 8))
    // upscale 2x replicates pixels: src x of out x' in 0..7 is x'//2
    val up = Multimodal.resizeNearest(img, 8, 2)
    for (y <- 0 until 2; x <- 0 until 8; c <- 0 until 3)
      assert(up.rgb((y * 8 + x) * 3 + c) == rgb((y * 4 + x / 2) * 3 + c), s"($x,$y,$c)")
    // identity resize is a no-op
    assert(Multimodal.resizeNearest(img, 4, 2).rgb.toSeq == rgb.toSeq)
  }

  test("multimodal: frame sampling and thumbnail paths match their closed forms") {
    val docs = Seq(
      (0L, "x", "en", "s", 40L),  // ppm image; 2 frames
      (1L, "x", "en", "s", 41L),  // bmp image; 3 frames
      (2L, "x", "en", "s", 42L),  // wav — skipped by resize
      (7L, "x", "en", "s", 43L),  // bmp image; 2+7%6=3 frames
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val nCharsOf = Map(0L -> 40L, 1L -> 41L, 2L -> 42L, 7L -> 43L)

    val frames = Multimodal.frameFeatures(
      spark, Multimodal.synthesizeFrameStreams(spark, docs), stride = 2)
      .orderBy("doc_id").collect()
    assert(frames.length == 4)
    for (r <- frames) {
      val id = r.getLong(0); val n = nCharsOf(id)
      val nf = (2 + id % 6).toInt
      val w = (16 + n % 32).toInt; val h = (16 + 3 * n % 32).toInt
      assert(r.getInt(1) == nf && r.getInt(2) == (nf + 1) / 2)
      assert(r.getInt(3) == w && r.getInt(4) == h)
      for (c <- 0 until 3) {
        val want = w.toLong * (0 until nf by 2).map { f =>
          (0 until h).map(y => (id + 31 * f + y + 85 * c) % 256).sum
        }.sum
        assert(r.getLong(5 + c) == want, s"doc $id chan $c")
      }
    }

    // empty and non-P6 payloads are SKIPPED by the frame pass (the
    // zero-frame guard), not a task-aborting NoSuchElementException /
    // decode failure — mixed corpora are the normal case
    val mixed = Seq(
      (100L, Array.emptyByteArray),
      (101L, "RIFFjunk".getBytes("ISO-8859-1")),
    ).toDF("doc_id", "payload")
    assert(Multimodal.frameFeatures(spark, mixed, stride = 2).count() == 0)

    val thumbs = Multimodal.resizeFeatures(
      spark, Multimodal.synthesizeMedia(spark, docs), outW = 8, outH = 8)
      .orderBy("doc_id").collect()
    assert(thumbs.map(_.getLong(0)).toSeq == Seq(0L, 1L, 7L), "audio doc skipped")
    for (r <- thumbs) {
      val id = r.getLong(0); val n = nCharsOf(id)
      val h = (16 + 7 * n % 48).toInt
      assert(r.getString(1) == (if (id % 3 == 0) "ppm" else "bmp"))
      assert(r.getInt(2) == 8 && r.getInt(3) == 8)
      for (c <- 0 until 3) {
        val want = 8L * (0 until 8).map(y => (id + y * h / 8 + 85 * c) % 256).sum
        assert(r.getLong(4 + c) == want, s"doc $id chan $c")
      }
    }
  }

  test("text analysis goldens on inline docs") {
    val df = Seq(
      (1L, "the cat and the dog", "en", "s", 19L),
      (2L, "der hund und das haus", "de", "s", 21L),
      (3L, "", "en", "s", 0L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tok = TextAnalysis.tokenCount(df).orderBy("doc_id").collect()
    assert(tok.map(_.getLong(2)).toSeq == Seq(5L, 5L, 0L))
    // BPE-ish pre-tokenizer: " cat"/" and" etc. are single matches here
    assert(tok.map(_.getAs[Long]("n_bpe_tokens")).toSeq == Seq(5L, 5L, 0L))
    val bpe = df.sparkSession.range(1)
      .select(TextAnalysis.bpeTokenCount(lit("it's 42 degrees, ok?")).as("n"))
      .head().getLong(0)
    // it | 's | " 42" | " degrees" | "," | " ok" | "?" = 7
    assert(bpe == 7L)
    val lid = TextAnalysis.langId(df).orderBy("doc_id").collect()
    assert(lid(0).getAs[String]("lang_pred") == "en")
    assert(lid(1).getAs[String]("lang_pred") == "de")
    assert(lid(2).getAs[String]("lang_pred") == "und")
    val q = TextAnalysis.qualityScore(df).orderBy("doc_id").collect()
    assert(q(0).getAs[Double]("stopword_ratio") == 0.6) // the, and, the of 5
    assert(q(2).getAs[Double]("avg_token_len") == 0.0)
  }

  test("bpe: hand-computed merge sequence and greedy segmentation") {
    // vocab: aaab ×2, aab ×1. Round-by-round by hand:
    //   r0 (a,a)=5 → aa; r1 (b,</w>)=3 → b</w>;
    //   r2 tie (aa,a)=2 vs (a,b</w>)=2 → 'a' < 'aa' → ab</w>;
    //   r3 (aa,ab</w>)=2 → aaab</w>
    val docs = Seq((1L, "aaab aaab aab")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, rounds = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(merges.toSeq == Seq(
      (0, "a", "a", 5L), (1, "b", "</w>", 3L),
      (2, "a", "b</w>", 2L), (3, "aa", "ab</w>", 2L)))

    val seg = Bpe.segmentVocab(docs, Bpe.trainMerges(docs, rounds = 4))
      .orderBy("word").collect()
      .map(r => (r.getString(0), r.getInt(2), r.getString(3)))
    assert(seg.toSeq == Seq(("aaab", 1, "aaab</w>"), ("aab", 2, "aa b</w>")))

    // early stop: all-distinct single-char words have every pair count 1
    // < minPairCount 2 → zero merges, not a crash
    val sparse = Seq((1L, "x y z")).toDF("doc_id", "text")
    assert(Bpe.trainMerges(sparse, rounds = 3).count() == 0)

    // fully-merged word: "ab"×3 collapses to the single symbol ab</w>
    // after 2 rounds; round 3's pair pass over a size-1 symbol array
    // must yield NO pairs (the ANSI sequence(1,0) guard) and stop —
    // not throw INVALID_ARRAY_INDEX or emit null-interpolated merges
    val tiny = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val tinyMerges = Bpe.trainMerges(tiny, rounds = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(tinyMerges.toSeq == Seq((0, "a", "b", 3L), (1, "ab", "</w>", 3L)))

    // corpus tokenization under the trained vocab: aaab→1 subword,
    // aab→2 → doc = 3 words, 4 subwords; empty doc reports 0/0
    val docs2 = Seq((1L, "aaab aaab aab"), (2L, "   ")).toDF("doc_id", "text")
    val tok = Bpe.tokenizeCorpus(docs2, Bpe.trainMerges(docs, rounds = 4))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tok.toSeq == Seq((1L, 3L, 4L), (2L, 0L, 0L)))
  }

  test("dsir resampling: disjoint-vocabulary domains separate sharply") {
    // domain A (ids 0-9) and domain B (ids 10-19) share NO tokens; with
    // target = A, every B bigram is unseen in the target LM → lm_target
    // 0 → weight 0 → dropped; every A doc weights ≥ 1 → kept
    val rows = (0 until 10).map(i => (i.toLong, s"alpha beta gamma delta e$i alpha beta")) ++
      (10 until 20).map(i => (i.toLong, s"uno dos tres cuatro x$i uno dos"))
    val df = rows.toDF("doc_id", "text")
    val kept = Sampling.dsirResample(df, col("doc_id") < 10, scale = 1.0)
      .orderBy("doc_id").collect()
    assert(kept.map(_.getLong(0)).toSet == (0L until 10L).toSet)
    kept.foreach(r => assert(r.getAs[Double]("weight") >= 1.0))
  }

  test("cdc apply: latest row-image wins, deletes drop, untouched keys pass through") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal")
    val changes = Seq(
      (1L, "a1", 11.0, "U", 5L),  // stale update…
      (1L, "a2", 12.0, "U", 9L),  // …latest wins
      (2L, "b-gone", 0.0, "D", 7L), // delete key 2
      (4L, "d", 40.0, "I", 3L),   // insert new key
      (4L, "d-del", 0.0, "D", 1L) // stale delete loses to the later insert
    ).toDF("id", "name", "bal", "op", "seq")
    val got = Cdc.applyChangelog(base, changes, "id", "seq")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "a2", 12.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    // non-row-image changelog must fail loudly
    intercept[IllegalArgumentException] {
      Cdc.applyChangelog(base, changes.drop("bal"), "id", "seq")
    }
  }

  test("snapshot diff: I/U/D capture and the apply∘diff round trip") {
    val oldS = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal")
    val newS = Seq((1L, "a", 10.0), (2L, "b2", 20.0), (4L, "d", 40.0))
      .toDF("id", "name", "bal")
    val diff = Cdc.snapshotDiff(oldS, newS, "id")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    assert(diff.toSeq == Seq((2L, "b2", "U"), (3L, "c", "D"), (4L, "d", "I")))

    // round trip: applying the captured changelog reproduces newS
    val ch = Cdc.snapshotDiff(oldS, newS, "id")
      .withColumn("seq", col("id")) // any unique seq works: one op per key
    val replayed = Cdc.applyChangelog(oldS, ch, "id", "seq")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val want = newS.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(replayed.toSeq == want.toSeq)
  }

  test("scd2: validity intervals per key, deletes close but emit nothing") {
    val changes = Seq(
      (1L, "a1", "U", 5L), (1L, "a2", "U", 9L), (1L, "gone", "D", 12L),
      (4L, "d", "I", 3L)
    ).toDF("id", "name", "op", "seq")
    val got = Cdc.scd2History(changes, "id", "seq")
      .orderBy("id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Long]),
        r.getBoolean(6)))
    assert(got.toSeq == Seq(
      (1L, "a1", 5L, Some(9L), false),
      (1L, "a2", 9L, Some(12L), false), // closed by the delete
      (4L, "d", 3L, None, true)))
  }

  test("vocab growth: new-token accounting sums to the full vocabulary") {
    val docs = (0L until 40L)
      .map(i => (i, s"shared tok$i extra${i % 7}")).toDF("doc_id", "text")
    val g = TextAnalysis.vocabGrowth(docs, slices = 4).orderBy("slice").collect()
    assert(g.map(_.getLong(1)).sum == 40L) // every doc in exactly one slice
    // cumulative vocab ends at the true distinct-token count
    val trueVocab = 1 + 40 + 7 // shared + tok0..39 + extra0..6
    assert(g.last.getLong(4) == trueVocab.toLong)
    // cum_vocab is non-decreasing and equals the running sum of new_tokens
    val cums = g.map(_.getLong(4)).toSeq
    assert(cums == g.map(_.getLong(3)).scanLeft(0L)(_ + _).tail.toSeq)
  }

  test("session stats: per-session counts and durations from the sessionize assignment") {
    val ev = Seq(
      (1L, 0L, 7L, "a", 1.0), (2L, 1000L, 7L, "b", 2.0),      // session 1
      (3L, 10000000L, 7L, "a", 3.0),                          // session 2 (gap)
      (4L, 500L, 9L, "a", 4.0)                                // other user
    ).toDF("event_id", "ts_ms", "user_id", "event_type", "value")
    val s = Events.sessionStats(ev).orderBy("user_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getDouble(5)))
    assert(s.toSeq == Seq(
      (7L, 1L, 2L, 1000L, 3.0), (7L, 2L, 1L, 0L, 3.0), (9L, 1L, 1L, 0L, 4.0)))
  }

  test("collocations, gini diversity, transitions: hand-computed values") {
    // lift: "x y" always adjacent → 30·10/(10·10) = 3.0
    val docs = (1L to 5L).map(i => (i, "x y p x y q")).toDF("doc_id", "text")
    val top = TextAnalysis.collocations(docs, minCount = 5, topK = 3)
      .orderBy("rank").collect()
    val xy = top.find(r => r.getString(1) == "x" && r.getString(2) == "y").get
    assert(xy.getLong(3) == 10L && xy.getAs[Double]("lift") == 3.0)

    // gini: "a a b b" → 1 − (0.25 + 0.25) = 0.5; uniform repeat → 0; empty → 0
    val g = TextAnalysis.tokenDiversity(
        Seq((1L, "a a b b"), (2L, "a a a a"), (3L, " ")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(g.toSeq == Seq((1L, 4L, 0.5), (2L, 4L, 0.0), (3L, 0L, 0.0)))

    // transitions: one user a→b→b → (a,b) p=1.0 and (b,b) p=1.0
    val ev = Seq((1L, 100L, 7L, "a"), (2L, 200L, 7L, "b"), (3L, 300L, 7L, "b"))
      .toDF("event_id", "ts_ms", "user_id", "event_type")
    val tr = Events.transitionMatrix(ev)
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(tr.toSeq == Seq(("a", "b", 1L, 1.0), ("b", "b", 1L, 1.0)))
  }

  test("kfold: total partition into k folds, invariant to data partitioning") {
    val df = (0L until 300L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val folds = Sampling.kfoldAssign(df, "doc_id", k = 5)
      .groupBy("fold").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(folds.keySet == Set(0, 1, 2, 3, 4))
    assert(folds.values.sum == 300L)
    folds.values.foreach(n => assert(n > 30, s"fold badly unbalanced: $folds"))
    val repart = Sampling.kfoldAssign(df.repartition(7), "doc_id", k = 5)
      .select("doc_id", "fold").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val orig = Sampling.kfoldAssign(df, "doc_id", k = 5)
      .select("doc_id", "fold").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(repart == orig)
  }

  test("cluster purity: separated label-aligned clusters score 1.0") {
    val vecs = (0 until 20).map { i =>
      val label = i % 2
      val base = Array.fill(8)(0.01f * (i % 3))
      base(label) = 1.0f
      (i.toLong, base, label)
    }.toDF("vec_id", "embedding", "label")
    val rows = Similarity.clusterPurity(vecs, "label", k = 2, iters = 2)
      .orderBy("cluster_id").collect()
    assert(rows.map(_.getLong(1)).sum == 20L)
    rows.foreach { r =>
      assert(r.getAs[Double]("purity") == 1.0, s"impure cluster: $r")
    }
  }

  test("histogram drift: zero on identical corpora, total 1.0 on disjoint ranges") {
    val a = (1 to 100).map(_.toDouble).toDF("x")
    val zero = Stats.histogramDrift(a, a, "x", bins = 10).collect()
    assert(zero.nonEmpty && zero.forall(_.getAs[Double]("tvd_term") == 0.0))

    val lo = (1 to 50).map(_.toDouble).toDF("x")
    val hi = (1001 to 1050).map(_.toDouble).toDF("x")
    val total = Stats.histogramDrift(lo, hi, "x", bins = 4)
      .agg(sum(col("tvd_term"))).collect()(0).getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, s"disjoint TVD $total")
  }

  test("c-tf-idf: group-exclusive terms outrank shared ones") {
    val df = Seq(
      (1L, "g1", "alpha alpha shared"),
      (2L, "g1", "alpha shared"),
      (3L, "g2", "beta shared shared")
    ).toDF("doc_id", "grp", "text")
    val top = Tfidf.clusterTopTerms(df, "grp", topK = 2)
      .orderBy("grp", "rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(5)))
    // g1: alpha tf=3 gdf=1 w=3·(3/2)=4.5 beats shared tf=2 gdf=2 w=2·(3/3)=2
    // g2: shared tf=2 w=2 beats beta tf=1 gdf=1 w=1.5
    assert(top.toSeq == Seq(
      ("g1", "alpha", 1), ("g1", "shared", 2),
      ("g2", "shared", 1), ("g2", "beta", 2)))
  }

  test("c-tf-idf: a null group key is a first-class cluster, not dropped") {
    val df = Seq(
      (1L, Some("g1"), "alpha alpha shared"),
      (2L, None, "gamma gamma shared"),
      (3L, None, "gamma shared")
    ).toDF("doc_id", "grp", "text")
    val top = Tfidf.clusterTopTerms(df, "grp", topK = 2)
      .orderBy("grp", "rank").collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getInt(5)))
    // orderBy: nulls first under asc — the null cluster ranks gamma
    // (tf=3, gdf=1) over shared (tf=2, gdf=2); g1 ranks alpha first
    assert(top.toSeq == Seq(
      (None, "gamma", 1), (None, "shared", 2),
      (Some("g1"), "alpha", 1), (Some("g1"), "shared", 2)),
      s"null-group cluster must survive the join-back: ${top.toSeq}")
  }

  test("containment: a quoted short doc scores 1.0 where jaccard stays tiny") {
    val long = (1 to 40).map(i => s"w$i").mkString(" ")            // 38 shingles
    val short = (10 to 14).map(i => s"w$i").mkString(" ")          // 3 shingles, all in long
    val other = (100 to 140).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, long), (2L, short), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(df, k = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("containment_a"), r.getAs[Double]("containment_b")))
    assert(pairs.toSeq == Seq((1L, 2L, round4(3.0 / 38), 1.0)))
    // the symmetric operator misses it at any threshold the pair's
    // jaccard (3/38) can't reach
    assert(Dedup.ngramJaccardPairs(df, threshold = 0.5).count() == 0)
  }

  test("containment derived cap tracks corpus duplication") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cap1 = Dedup.suggestedShingleDfCap(docs, k = 3)
    assert(cap1 >= 2, "cap floor: below 2 nothing can ever link")
    // replicate 3x: every shingle's df triples, so the df quantile — and
    // the derived cap with it — must shift up with the duplication
    // instead of silently stopping matches (the fixed-cap failure the
    // containmentPairs doc warns about)
    val docs3 = (0 until 3)
      .map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionAll _)
    val cap3 = Dedup.suggestedShingleDfCap(docs3, k = 3)
    assert(cap3 > cap1, s"derived cap must grow under duplication: $cap1 -> $cap3")
    // and the pairs found under the derived cap include cross-copy
    // duplicates (copies of one base doc fully contain each other)
    val pairs = Dedup.containmentPairs(docs3.filter(col("doc_id") % 1000000L < 50),
      k = 3, threshold = 0.9, maxShingleDf = cap3)
    assert(pairs.filter(col("doc_id_a") % 1000000L === col("doc_id_b") % 1000000L)
      .count() > 0, "derived cap must keep exact cross-copy pairs matchable")
  }

  private def round4(x: Double): Double = math.round(x * 10000).toDouble / 10000

  test("salted join equals the plain join, including unmatched-key drops") {
    val fact = Seq((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 20L, 3.0),
      (4L, 99L, 4.0)).toDF("fid", "k", "v") // key 99 has no dim row
    val dim = Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("k", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", "fid", saltBuckets = 4)
      .orderBy("fid").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val plain = fact.join(dim, "k")
      .orderBy("fid").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(salted.toSeq == plain.toSeq)
    assert(salted.length == 3) // unmatched fact key dropped, dim 30 unused
  }

  test("ivf index: partition-pruned probe equals the in-memory ivf") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("ivfidx-spec").toString + "/ix"
    Similarity.writeIvfIndex(emb, idx, numCentroids = 16)
    val queries = emb.filter(col("vec_id") < 4)
    val fromIndex = Similarity.ivfTopKIndexed(spark, idx, queries, k = 3, nprobe = 2)
    val inMemory = Similarity.ivfTopK(emb, queries, k = 3,
      numCentroids = 16, nprobe = 2)
    assert(fromIndex.orderBy("query_id", "rank").collect().toSeq ==
      inMemory.orderBy("query_id", "rank").collect().toSeq)
    // the probe scan must prune partitions, not list every directory
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"expected partition-pruned index scan:\n$plan")
  }

  test("ivfDriftReport: in-distribution batch reads high cosines; shifted batch reads the drift") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("ivfdrift-spec")
      .toString + "/ix"
    val seed = emb.filter(col("vec_id") < 32 || col("vec_id") % 2 === 0)
    Similarity.writeIvfPqIndex(seed, idx, numCentroids = 32, m = 4,
      ksub = 16, dim = 64)
    val batch = emb.filter(col("vec_id") >= 32 && col("vec_id") % 2 === 1)
    def report(b: org.apache.spark.sql.DataFrame) =
      Similarity.ivfDriftReport(spark, idx, b).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val inDist = report(batch)
    // mass accounting: one row per codebook centroid, store mass = the
    // encoded seed, batch mass = the whole batch
    assert(inDist.length == 32)
    assert(inDist.map(_._2).sum == seed.count(), "n_store must sum to the seed")
    assert(inDist.map(_._3).sum == batch.count(), "n_batch must sum to the batch")
    // unhit centroids carry the -1.0 sentinel, hit ones a real cosine
    assert(inDist.forall { case (_, _, nb, mc) =>
      if (nb == 0L) mc == -1.0 else mc > -1.0 })
    // DRIFT: negate the batch — assignment cosines flip sign, so the
    // report's mean assignment quality must fall for every hit centroid
    val neg = batch.select(col("vec_id"),
      expr("transform(embedding, x -> -x)").as("embedding"))
    val shifted = report(neg)
    def meanHit(rs: Array[(Long, Long, Long, Double)]) = {
      val hit = rs.filter(_._3 > 0); hit.map(_._4).sum / hit.length
    }
    assert(meanHit(shifted) < meanHit(inDist),
      s"negated batch must read as drift: ${meanHit(shifted)} vs ${meanHit(inDist)}")
  }

  test("ivfadc index: pruned code probe equals flat-ADC restricted to the probe sets") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("ivfpq-spec").toString + "/ix"
    Similarity.writeIvfPqIndex(emb, idx, numCentroids = 16, m = 4, ksub = 16, dim = 64)
    val queries = emb.filter(col("vec_id") < 4)
    val probed = Similarity.ivfPqTopK(spark, idx, queries, emb,
      k = 3, nprobe = 16, rerankFactor = 4, m = 4, dim = 64)
    // nprobe = numCentroids degenerates to the FLAT ADC scan: every
    // partition probed, so IVFADC ≡ pqTopK row for row
    val flat = Pq.pqTopK(emb, queries, k = 3,
      m = 4, ksub = 16, dim = 64, rerankFactor = 4)
    assert(probed.orderBy("query_id", "rank").collect().toSeq ==
      flat.orderBy("query_id", "rank").collect().toSeq)
    // at nprobe < numCentroids the code scan must partition-prune,
    // and the index must hold CODES, not embeddings
    val narrow = Similarity.ivfPqTopK(spark, idx, queries, emb,
      k = 3, nprobe = 2, rerankFactor = 4, m = 4, dim = 64)
    val plan = narrow.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"expected partition-pruned code scan:\n$plan")
    // the exact re-rank fetches survivors' full vectors by BROADCAST
    // hash probe of the corpus scan — never a corpus shuffle
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast survivor re-rank:\n$plan")
    assert(!spark.read.parquet(idx).columns.contains("embedding"),
      "index must store PQ codes only")
    // recall telemetry: NOT asserted monotone in nprobe — with a fixed
    // rerank depth a DEEPER probe pool can crowd a true neighbor out of
    // the ADC survivor set (observed here: 0.92 / 1.0 / 0.83 at
    // nprobe 1/2/16), which is exactly the tuning tension the telemetry
    // exists to expose. The pinned law instead: at nprobe = numCentroids
    // the probe restriction vanishes, so IVFADC recall ≡ flat-ADC
    // ([[Pq.pqRecall]]) recall at the same rerank factor.
    val rec = Similarity.ivfPqRecall(spark, idx, queries, emb,
        k = 3, nprobes = Seq(1, 2, 16), rerankFactor = 16, m = 4, dim = 64)
      .orderBy("nprobe").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rec.map(_._1).toSeq == Seq(1, 2, 16))
    assert(rec.forall { case (_, ep, ip, hp, r5) =>
      ep > 0 && ip > 0 && hp <= ip && r5 > 0.0 && r5 <= 1.0 }, rec.toSeq.toString)
    val flatRec = Pq.pqRecall(emb, queries, k = 3,
        m = 4, ksub = 16, dim = 64, rerankFactors = Seq(16))
      .collect().map(_.getDouble(4))
    assert(rec.last._5 == flatRec.head,
      s"full-probe IVFADC recall ${rec.last._5} != flat ADC recall ${flatRec.head}")
  }

  test("ivfadc retrain: swapped index equals cold build on survivors, tombstones applied physically") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("ivfretrain").toString
    val idx = tmp + "/ix"
    Similarity.writeIvfPqIndex(emb, idx, numCentroids = 16,
      m = 4, ksub = 16, dim = 64)
    Similarity.forgetIvfPq(spark,
      emb.filter(col("vec_id") % 7 === 3).select("vec_id"), idx)
    Similarity.retrainIvfPq(spark, emb, idx)
    // tombstones applied PHYSICALLY and the sidecar cleared with them
    val storedIds = spark.read.parquet(idx).select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(storedIds.forall(_ % 7 != 3), "forgotten ids survived the retrain")
    assert(!StoreUpkeep.health(spark, idx, StoreUpkeep.IvfPqKind)
      .pendingTombstones, "retrain must clear the applied tombstone sidecar")
    // the swapped store ≡ a cold build over the survivors, codebooks
    // included (q_ivf_retrain pins the same law against DuckDB; this leg
    // pins it engine-internally at a different geometry)
    val survivors = emb.filter(col("vec_id") % 7 =!= 3)
    val coldIdx = tmp + "/cold"
    Similarity.writeIvfPqIndex(survivors, coldIdx, numCentroids = 16,
      m = 4, ksub = 16, dim = 64)
    val queries = survivors.filter(col("vec_id") < 6)
    def probe(d: String) = Similarity.ivfPqTopK(spark, d, queries, survivors,
      k = 3, nprobe = 2, rerankFactor = 4, m = 4, dim = 64)
      .orderBy("query_id", "rank").collect().toSeq
    assert(probe(idx) == probe(coldIdx))
    assert(spark.read.parquet(idx + "_codebook").count() ==
      spark.read.parquet(coldIdx + "_codebook").count())
    // no staging debris left behind the swap
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (sfx <- Seq("", "_codebook", "_pq", "_meta"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(idx + "_retraining" + sfx)) &&
        !fs.exists(new org.apache.hadoop.fs.Path(idx + sfx + "_precompact")))
  }

  test("ivfadc retrain (trained codebook): recall at fixed nprobe recovers on a drifted corpus") {
    import spark.implicits._
    // seed: 200 scattered unit-ish vectors; drift: 8 TIGHT clusters in
    // directions the seed codebook never saw (negative combinations of
    // codebook vectors) — under the frozen books each cluster sprays
    // across many cells on noise alone, so nprobe=1 recall collapses;
    // a k-means retrain moves centroids onto the clusters and recall
    // recovers. Seeded RNG: the draw is fixed, the assertion exact.
    val rnd = new scala.util.Random(42)
    val dim = 64
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val seed = (0L until 200L).map { i =>
      (i, unit(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    }
    val centers = (0 until 8).map { j =>
      unit(seed(2 * j)._2.zip(seed(2 * j + 1)._2).map { case (a, b) => -(a + b) })
    }
    val drifted = (0 until 8).flatMap { j =>
      (0 until 40).map { i =>
        (1000L + j * 100L + i,
          unit(centers(j).map(x => x + (rnd.nextGaussian() * 0.08).toFloat)))
      }
    }
    val seedDf = seed.toDF("vec_id", "embedding")
    val unionDf = (seed ++ drifted).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("ivfdriftrt").toString + "/ix"
    Similarity.writeIvfPqIndex(seedDf, idx, numCentroids = 16,
      m = 4, ksub = 16, dim = dim)
    Similarity.appendIvfPq(spark, drifted.toDF("vec_id", "embedding"), idx)
    val queries = (0 until 8).map(j => drifted(j * 40)).toDF("vec_id", "embedding")
    def recall1(): Double = Similarity.ivfPqRecall(spark, idx, queries,
        unionDf, k = 5, nprobes = Seq(1), rerankFactor = 8, m = 4, dim = dim)
      .collect().head.getDouble(4)
    val before = recall1()
    Similarity.retrainIvfPq(spark, unionDf, idx, trainIters = 4)
    val after = recall1()
    info(s"recall@5 nprobe=1: before=$before after=$after")
    // the recovery law (r18 verdict task 1): retraining on the drifted
    // corpus must not lose recall at fixed probe depth — and on this
    // construction it recovers decisively (measured: 0.4 -> 0.925)
    assert(after >= before,
      s"retrain lost recall: before=$before after=$after")
    assert(after >= before + 0.2 && after >= 0.9,
      s"retrain did not recover recall on a drifted draw: " +
        s"before=$before after=$after")
  }

  test("ivfadc retrain (generational): rebuild staged as N+1 behind the pointer flip; grace generation serves the old answers") {
    import graft.operators.{StoreGen, StoreUpkeep, Tombstones}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = java.nio.file.Files.createTempDirectory("ivfretrain-gen")
      .toString
    val idx = base + "/ix"
    Similarity.writeIvfPqIndex(emb, idx, numCentroids = 8,
      m = 4, ksub = 16, dim = 64)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // move to generation 1 first so the grace-window leg can probe a
    // pinned _g path (a plain-path reader re-resolves the pointer)
    assert(StoreUpkeep.compactNewGeneration(spark, idx,
      StoreUpkeep.IvfPqKind) == 1L)
    val queries = emb.filter(col("vec_id") < 4)
    def probe(d: String) = Similarity.ivfPqTopK(spark, d, queries, emb,
      k = 3, nprobe = 2, rerankFactor = 4, m = 4, dim = 64)
      .orderBy("query_id", "rank").collect().toSeq
    val before = probe(idx)
    assert(StoreGen.resolve(idx) == idx + "_g1")
    // the law (r19 verdict task 3): a probe that resolved BEFORE the
    // retrain flip serves the old generation's answers — generation 1
    // stays intact as the grace window while generation 2 takes over
    Similarity.retrainIvfPq(spark, emb, idx, generational = true)
    assert(StoreGen.resolve(idx) == idx + "_g2")
    assert(probe(idx + "_g1") == before,
      "in-flight read must complete on the retired generation")
    // engine-exact rebuild (trainIters = 0, no tombstones): the new
    // generation is row-identical serving — same answers
    assert(probe(idx) == before)
    // generation 0 (one-behind-grace) reclaimed, sidecars included
    for (sfx <- Seq("", "_codebook", "_pq", "_meta"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(idx + sfx)),
        s"generation 0 suffix '$sfx' must be reclaimed")
    // takedown through a generational retrain: forget a served answer,
    // retrain — the rebuild never sees the forgotten vector, the new
    // generation starts tombstone-free, the grace generation keeps its
    // pending sidecar until reclamation
    import spark.implicits._
    val doomed = before.head.getLong(1)
    Similarity.forgetIvfPq(spark, Seq(doomed).toDF("vec_id"), idx)
    assert(Tombstones.exists(idx + "_g2"))
    Similarity.retrainIvfPq(spark, emb, idx, generational = true)
    assert(StoreGen.resolve(idx) == idx + "_g3")
    assert(!Tombstones.exists(idx + "_g3"),
      "rebuild applies the tombstone physically")
    assert(Tombstones.exists(idx + "_g2"),
      "grace generation keeps its pending sidecar")
    val served = spark.read.parquet(idx + "_g3")
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!served.contains(doomed), "forgotten id survived the retrain")
    assert(probe(idx).forall(_.getLong(1) != doomed))
  }

  test("StoreUpkeep.maybeRetrain: drift policy fires exactly at the documented threshold and recovers recall; a no-drift draw never fires") {
    import graft.operators.StoreUpkeep
    import spark.implicits._
    // healthy state: 8 TIGHT clusters, k-means-trained codebook — an
    // in-distribution batch assigns at cosine ≈ 1 and spreads evenly,
    // so neither the minMeanCos nor the maxMassSkew leg trips
    val rnd = new scala.util.Random(7)
    val dim = 64
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val centers = (0 until 8).map(_ =>
      unit(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    def draw(center: Array[Float], noise: Double): Array[Float] =
      unit(center.map(x => x + (rnd.nextGaussian() * noise).toFloat))
    val corpus0 = (0 until 8).flatMap { j =>
      (0 until 40).map(i => (j * 100L + i, draw(centers(j), 0.05)))
    }
    val corpus0Df = corpus0.toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("maybe-retrain")
      .toString + "/ix"
    Similarity.writeIvfPqIndex(corpus0Df, idx, numCentroids = 16,
      m = 4, ksub = 16, dim = dim)
    Similarity.retrainIvfPq(spark, corpus0Df, idx, trainIters = 4)
    val booksBefore = spark.read.parquet(idx + "_codebook")
      .orderBy("vec_id").collect().toSeq
    val inBatch = (0 until 8).flatMap { j =>
      (0 until 5).map(i => (9000L + j * 10L + i, draw(centers(j), 0.05)))
    }.toDF("vec_id", "embedding")
    assert(!StoreUpkeep.maybeRetrain(spark, corpus0Df, inBatch, idx),
      "no-drift draw must never fire")
    assert(spark.read.parquet(idx + "_codebook").orderBy("vec_id")
      .collect().toSeq == booksBefore, "a non-firing policy must not touch " +
      "the codebook")
    // drift: 8 NEW tight clusters at the ANTIPODES of the old centers —
    // directions the trained codebook has no centroid near, so batch
    // cosines collapse and recall at fixed nprobe decays
    val drifted = (0 until 8).flatMap { j =>
      (0 until 40).map(i => (5000L + j * 100L + i, draw(centers(j).map(-_), 0.05)))
    }
    val driftedDf = drifted.toDF("vec_id", "embedding")
    Similarity.appendIvfPq(spark, driftedDf, idx)
    val corpus1Df = (corpus0 ++ drifted).toDF("vec_id", "embedding")
    val driftBatch = (0 until 8).flatMap { j =>
      (0 until 5).map(i => (9500L + j * 10L + i, draw(centers(j).map(-_), 0.05)))
    }.toDF("vec_id", "embedding")
    // the measured signal the policy gates on
    val report = Similarity.ivfDriftReport(spark, idx, driftBatch).collect()
      .filter(_.getAs[Long]("n_batch") > 0L)
    val nb = report.map(_.getAs[Long]("n_batch")).sum
    val meanCos = report.map(r =>
      r.getAs[Long]("n_batch") * r.getAs[Double]("mean_cos_batch")).sum / nb
    info(f"drift-batch weighted mean assignment cosine: $meanCos%.3f")
    assert(meanCos < 0.70, s"construction must sit below the documented " +
      s"default threshold, got $meanCos")
    // threshold exactness: the same drifted batch with the bar set BELOW
    // its measured cosine (and the skew leg disabled) must NOT fire —
    // firing is the threshold crossing, not the call
    assert(!StoreUpkeep.maybeRetrain(spark, corpus1Df, driftBatch, idx,
      minMeanCos = meanCos - 0.05, maxMassSkew = 1e9),
      "policy fired below its threshold")
    // at the defaults it fires, k-means retrains, and recall recovers
    val qdrift = (0 until 8).map(j => drifted(j * 40)).toDF("vec_id", "embedding")
    def recall1(): Double = Similarity.ivfPqRecall(spark, idx, qdrift,
        corpus1Df, k = 5, nprobes = Seq(1), rerankFactor = 8, m = 4, dim = dim)
      .collect().head.getDouble(4)
    val before = recall1()
    assert(StoreUpkeep.maybeRetrain(spark, corpus1Df, driftBatch, idx),
      "policy must fire past the documented threshold")
    val after = recall1()
    info(s"recall@5 nprobe=1: before=$before after=$after")
    assert(after >= before && after >= 0.8,
      s"firing policy did not recover recall: before=$before after=$after")
  }

  test("residual ivfadc: same surface, non-degenerate codebooks, deterministic") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 4)
    def buildAndProbe(byRes: Boolean) = {
      val idx = java.nio.file.Files
        .createTempDirectory(s"ivfpqres-$byRes").toString + "/ix"
      Similarity.writeIvfPqIndex(emb, idx, numCentroids = 16,
        m = 4, ksub = 16, dim = 64, byResidual = byRes)
      (idx, Similarity.ivfPqTopK(spark, idx, queries, emb,
        k = 3, nprobe = 4, rerankFactor = 4, m = 4, dim = 64))
    }
    val (idxRes, resTopK) = buildAndProbe(byRes = true)
    val (_, rawTopK) = buildAndProbe(byRes = false)
    // identical output surface + partition pruning in residual mode
    assert(resTopK.columns.toSeq ==
      Seq("query_id", "vec_id", "cos_sim", "approx_ip", "rank"))
    assert(resTopK.count() == 12 && rawTopK.count() == 12)
    val plan = resTopK.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"))
    // degeneracy guard (the bug this spec caught): residual codebooks
    // drawn from ids < numCentroids would be the centroids' OWN
    // residuals — identically zero, quantizing every residual to r̂ = 0.
    // The offset fix draws them from ids ≥ numCentroids; their entries
    // must carry real mass.
    val cbMass = spark.read.parquet(idxRes + "_pq")
      .select(expr("aggregate(c_sub, 0d, (a, x) -> a + abs(x))").as("mass"))
      .agg(min(col("mass"))).head().getDouble(0)
    assert(cbMass > 0.0, "residual codebook has an all-zero entry")
    // NO residual-beats-raw inequality here: on THIS corpus (synthetic,
    // unclustered) residuals x − c of near-orthogonal vectors are
    // LARGER than x, so raw codes genuinely score tighter (measured
    // 0.18 vs 0.30 MAD) — residual encoding pays off when the corpus
    // clusters around its centroids, which is a data property, not a
    // code property. Correctness is gated by the q_ivf_pq_res oracle;
    // here we pin determinism of the full build+probe chain instead.
    val again = buildAndProbe(byRes = true)._2
      .orderBy("query_id", "rank").collect().toSeq
    assert(again == resTopK.orderBy("query_id", "rank").collect().toSeq)
    // reusing the residual index through the recall sweep works too
    val rec = Similarity.ivfPqRecall(spark, idxRes, queries, emb,
        k = 3, nprobes = Seq(1, 4), rerankFactor = 4, m = 4, dim = 64)
      .collect()
    assert(rec.length == 2 && rec.forall(_.getDouble(4) > 0.0))
  }

  test("cdc plan shape: broadcast anti-join under broadcastChangedKeys, broadcast probe join in linkage") {
    val base = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val ch = base.limit(10).select(col("c_custkey"), col("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"),
      lit("U").as("op"), col("c_custkey").as("seq"))
    val plan = Cdc.applyChangelog(base, ch, "c_custkey", "seq",
        broadcastChangedKeys = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join:\n$plan")

    import Linkage.LinkRule
    val lplan = Linkage.linkPairs(base, "c_custkey", "c_nationkey",
        Seq(LinkRule("seg", 2.0, (a, b) => a("c_mktsegment") === b("c_mktsegment"))),
        matchAt = 2.0, possibleAt = 2.0, broadcastSide = true)
      .queryExecution.executedPlan.toString
    assert(lplan.contains("BroadcastHashJoin"),
      s"expected broadcast pair join:\n$lplan")
  }

  test("incremental agg maintenance equals the from-scratch aggregate") {
    val base = Seq((1L, "g1", 10.0), (2L, "g1", 20.0), (3L, "g2", 30.0))
      .toDF("id", "grp", "v")
    val changes = Seq(
      (1L, "g2", 11.0, "U", 1L), // group move g1 → g2
      (2L, "g1", 0.0, "D", 2L),  // delete
      (4L, "g3", 40.0, "I", 3L), // brand-new group
      (5L, "g4", 1.0, "I", 4L), (5L, "g4", 0.0, "D", 5L) // net no-op key
    ).toDF("id", "grp", "v", "op", "seq")
    val maintained = Cdc.incrementalAgg(base, changes, "id", "seq", "grp", "v")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val scratch = Cdc.applyChangelog(base, changes, "id", "seq")
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(28,4)")).cast("double").as("s"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(maintained.toSeq == scratch.toSeq)
    assert(maintained.toSeq == Seq(("g2", 2L, 41.0), ("g3", 1L, 40.0)))

    // chained maintenance: feed the view back via baseAggOpt with the
    // NEXT batch against the CURRENT snapshot — base agg never re-runs
    val view1 = Cdc.incrementalAgg(base, changes, "id", "seq", "grp", "v")
    val snap1 = Cdc.applyChangelog(base, changes, "id", "seq")
    val b2 = Seq((4L, "g3", 45.0, "U", 10L), (1L, "g2", 0.0, "D", 11L))
      .toDF("id", "grp", "v", "op", "seq")
    val view2 = Cdc.incrementalAgg(snap1, b2, "id", "seq", "grp", "v",
        baseAggOpt = Some(view1))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val scratch2 = Cdc.applyChangelog(snap1, b2, "id", "seq")
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(28,4)")).cast("double").as("s"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(view2.toSeq == scratch2.toSeq)
    assert(view2.toSeq == Seq(("g2", 1L, 30.0), ("g3", 1L, 45.0)))
  }

  test("linkage: rule scores, tiers, and the oversized-block guard") {
    import Linkage.LinkRule
    val recs = Seq(
      (1L, "blk1", "GOLD", 100.0),
      (2L, "blk1", "GOLD", 120.0),  // both rules agree with 1 → 4.5 match
      (3L, "blk1", "SILV", 130.0),  // close to 2 only → 2.5 (dropped < 3.0)
      (4L, "blk2", "GOLD", 500.0),  // different block: never meets 1/2/3
      (5L, "big", "GOLD", 100.0), (6L, "big", "GOLD", 100.0),
      (7L, "big", "GOLD", 100.0),
      (8L, "big", "GOLD", 100.0)    // 4-record block, capped out below
    ).toDF("id", "blk", "seg", "bal")
    val rules = Seq(
      LinkRule("same_seg", 2.0, (a, b) => a("seg") === b("seg")),
      LinkRule("close_bal", 2.5, (a, b) => abs(a("bal") - b("bal")) < lit(50.0)))
    val got = Linkage.linkPairs(recs, "id", "blk", rules,
        matchAt = 4.0, possibleAt = 3.0, maxBlockSize = 3)
      .orderBy("id_a", "id_b").collect()
    // the big block (4 > cap 3) is excluded entirely; blk1 yields one
    // match pair (1,2); (1,3)/(2,3) score 2.5 < possibleAt
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(got.head.getAs[Double]("score") == 4.5)
    assert(got.head.getAs[String]("tier") == "match")
    val over = Linkage.oversizedBlocks(recs, "blk", maxBlockSize = 3).collect()
    assert(over.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("big", 4L)))
  }

  test("fuzzy pairs: broadcast path and length prefilter are exactly lossless") {
    val rnd = new scala.util.Random(31)
    val alphabet = "abcdefghijklmnop"
    def word(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(16))).mkString
    // clusters of typo'd variants (same prefix, 1-2 char edits) plus
    // unrelated names and extreme-length rows that the length guard
    // must be allowed to drop
    val base = (0 until 40).map(_ => word(8 + rnd.nextInt(8)))
    val rows = base.zipWithIndex.flatMap { case (w, i) =>
      val variant = w.updated(rnd.nextInt(w.length), 'z')
      Seq((i * 3L, s"b${i % 3}", w), (i * 3L + 1, s"b${i % 3}", variant),
        (i * 3L + 2, s"b${i % 3}", w + word(20))) // length outlier
    }.toDF("id", "blk", "name")
    def run(bc: Boolean) =
      Linkage.fuzzyPairs(rows, "id", "blk", "name",
          threshold = 0.9, broadcastSide = bc)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val shuffled = run(bc = false)
    val broadcastGot = run(bc = true)
    assert(shuffled == broadcastGot)
    // brute-force truth WITHOUT any length guard: every same-block pair
    val truth = {
      val rs = rows.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      (for {
        (ia, ba, ta) <- rs; (ib, bb, tb) <- rs
        if ba == bb && ia < ib
      } yield {
        val jw = BigDecimal(graft.functions.JaroWinkler.score(
            org.apache.spark.unsafe.types.UTF8String.fromString(ta),
            org.apache.spark.unsafe.types.UTF8String.fromString(tb)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (ia, ib, jw)
      }).filter(_._3 >= 0.9).toSet
    }
    assert(shuffled == truth, "length prefilter must not drop a kept pair")
    assert(truth.nonEmpty)
  }

  test("fuzzy pairs: supplementary-plane text bypasses the length guard") {
    // 𝐀 (U+1D400) is 1 code point but 2 UTF-16 code units: the scorer
    // counts units, Spark length() counts points, so the ratio bound is
    // only sound on ASCII — this pair must reach the scorer and match
    val s1 = "𝐀𝐁"       // 2 cp, 4 cu
    val s2 = s1 + "xy"                         // 4 cp, 6 cu
    val jw = graft.functions.JaroWinkler.score(
      org.apache.spark.unsafe.types.UTF8String.fromString(s1),
      org.apache.spark.unsafe.types.UTF8String.fromString(s2))
    assert(jw >= 0.93, s"scenario needs a high-scoring pair, got $jw")
    val df = Seq((1L, "b", s1), (2L, "b", s2)).toDF("id", "blk", "name")
    val got = Linkage.fuzzyPairs(df, "id", "blk", "name", threshold = 0.93)
      .collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L,
      "non-ASCII pair must not be dropped by the code-point length ratio")
  }

  test("sorted-neighborhood pairs: equals the single-order truth under any partitioning") {
    val rnd = new scala.util.Random(17)
    val names = (0 until 300).map { i =>
      val stem = s"record name ${('a' + i % 20).toChar}${i % 7}"
      if (i % 3 == 0) stem + " variant" else stem + s" ${rnd.nextInt(10)}"
    }
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "name")
    val w = 5
    // truth: one in-memory sort by (name, id), score each row against
    // the w-1 that follow
    val sorted = df.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, n) => (n, id) }
    val truth = (for {
      i <- sorted.indices; j <- (i + 1) until math.min(i + w, sorted.length)
    } yield {
      val jw = BigDecimal(graft.functions.JaroWinkler.score(
          org.apache.spark.unsafe.types.UTF8String.fromString(sorted(i)._2),
          org.apache.spark.unsafe.types.UTF8String.fromString(sorted(j)._2)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (sorted(i)._1, sorted(j)._1, jw)
    }).filter(_._3 >= 0.85).toSet
    assert(truth.nonEmpty)
    for (parts <- Seq(1, 13)) {
      val got = Linkage.sortedNeighborhoodPairs(df.repartition(parts),
          "id", "name", "name", window = w, threshold = 0.85)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == truth, s"parts=$parts")
    }
  }

  test("fuzzy pairs broadcast plan: BroadcastHashJoin carries the scoring, no block-keyed exchange") {
    val rows = (0 until 200).map(i => (i.toLong, s"b${i % 3}", s"name $i"))
      .toDF("id", "blk", "name")
    val plan = Linkage.fuzzyPairs(rows, "id", "blk", "name",
        threshold = 0.9, broadcastSide = true)
      .queryExecution.executedPlan.toString
    // 3 block keys would serialize a shuffled self-join on 3 reducers;
    // the broadcast form must keep the quadratic scoring on the
    // row-partitioned scan side
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("pq: full codebook + full re-rank degenerates to exact brute force") {
    // 12 distinct vectors, dim 8, m=2: with ksub = n every subvector
    // encodes to its own centroid (d²=0), approx_ip = exact ip, and
    // rerankFactor 4 (k·4 = 12 = n) re-ranks ALL rows by exact cosine —
    // the result must equal bruteForceTopK row for row
    val vecs = (0 until 12).map { i =>
      (i.toLong, Array.tabulate(8)(d => (1.0f + ((i * 7 + d * 3) % 11)) / 11f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 2)
    val pq = Pq.pqTopK(vecs, queries, k = 3, m = 2, ksub = 12, dim = 8,
        rerankFactor = 4)
      .select("query_id", "vec_id", "cos_sim", "rank")
      .orderBy("query_id", "rank").collect()
    val bf = Similarity.bruteForceTopK(vecs, queries, k = 3)
      .orderBy("query_id", "rank").collect()
    assert(pq.length == bf.length)
    pq.zip(bf).foreach { case (p, b) =>
      assert((p.getLong(0), p.getLong(1), p.getInt(3)) ==
        (b.getLong(0), b.getLong(1), b.getInt(3)))
      assert(p.getDouble(2) == b.getDouble(2))
    }
    // codes live in [0, ksub)
    val cb = Pq.pqCodebooks(vecs, m = 2, ksub = 4, dim = 8)
    val codes = Pq.pqEncode(vecs, cb, m = 2, dim = 8)
    assert(codes.count() == 24) // 12 vectors × 2 subspaces
    assert(codes.filter(col("code") < 0 || col("code") >= 4).count() == 0)
  }

  test("span-link edges: ubiquitous spans are capped out of pair generation") {
    // identical 40-token text in 5 docs → one shared span each; a cap
    // below the sharing degree excludes it, above yields all C(5,2)
    // pairs in both directions
    val txt = (1 to 40).map(i => s"tok$i").mkString(" ")
    val df = (1L to 5L).map(i => (i, txt)).toDF("doc_id", "text")
    assert(Graph.spanLinkEdges(df, 32, 16, maxDocsPerSpan = 4).count() == 0)
    assert(Graph.spanLinkEdges(df, 32, 16, maxDocsPerSpan = 8).count() == 20)
  }

  test("pagerank: symmetric pair is uniform, star centre dominates, mass conserved") {
    val pair = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(pair, iters = 3).orderBy("node").collect()
    assert(pr.map(_.getDouble(1)).forall(r => math.abs(r - 0.5) < 1e-9))

    // undirected star 0—{1,2,3,4}: centre rank strictly above every leaf,
    // total mass ≈ 1
    val starPairs = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
    val star = Graph.pageRank(starPairs.toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((1L to 4L).forall(l => star(0L) > star(l)))
    assert(math.abs(star.values.sum - 1.0) < 1e-6)

    // dangling node: directed 1→2 only; 2's mass redistributes, total ≈ 1
    val dang = Graph.pageRank(Seq((1L, 2L)).toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(dang.values.sum - 1.0) < 1e-6)
    assert(dang(2L) > dang(1L)) // the sink receives 1's contribution

    // weighted: hub 0 splits 10:1 between leaves 1 and 2 — the heavy
    // leaf outranks the light one; mass still conserved
    val wEdges = Seq((0L, 1L, 10L), (1L, 0L, 10L), (0L, 2L, 1L), (2L, 0L, 1L))
      .toDF("src", "dst", "w")
    val wr = Graph.pageRank(wEdges, iters = 5, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wr(1L) > wr(2L), s"weighted split not respected: $wr")
    assert(math.abs(wr.values.sum - 1.0) < 1e-6)
  }

  test("personalized pagerank: mass stays near seeds, off-component is zero") {
    // two disjoint undirected pairs; seed node 1 → component {3,4} gets 0
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    def seeds(ids: Long*) = ids.toDF("node")
    val pr = Graph.personalizedPageRank(edges, seeds(1L), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(3L) == 0.0 && pr(4L) == 0.0, s"unreachable component ranked: $pr")
    assert(pr(1L) > pr(2L) && pr(2L) > 0.0)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)

    // seeds outside the graph are ignored — identical result
    val prIgnored = Graph.personalizedPageRank(edges, seeds(1L, 99L), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(prIgnored == pr)

    // an empty seed ∩ graph intersection fails loudly
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, seeds(42L))
    }
  }

  test("triangles: diamond counts, canonicalization, hub has none") {
    // K4 minus {3,4}: triangles {1,2,3} and {1,2,4}
    val diamond = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("src", "dst")
    val counts = Graph.triangleCounts(diamond).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))

    // stats: 4 nodes, 5 edges, wedges Σ C(deg,2) = 3+3+1+1 = 8,
    // clustering = 3·2/8
    val st = Graph.triangleStats(diamond).collect().head
    assert((st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3)) ==
      ((4L, 5L, 8L, 2L)))
    assert(math.abs(st.getDouble(4) - 0.75) < 1e-12)

    // reversed duplicates + self-loops canonicalize to the same graph
    val messy = diamond
      .union(diamond.select($"dst".as("src"), $"src".as("dst")))
      .union(Seq((3L, 3L), (1L, 2L)).toDF("src", "dst"))
    assert(Graph.triangleCounts(messy).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == counts)

    // star hub: max degree, zero triangles — the orientation points every
    // edge AT the hub, so no wedge opens there
    val star = (1L to 6L).map(l => (0L, l)).toDF("src", "dst")
    val starCounts = Graph.triangleCounts(star).collect()
    assert(starCounts.length == 7 && starCounts.forall(_.getLong(1) == 0L))
    assert(Graph.triangleStats(star).collect().head.getDouble(4) == 0.0)
  }

  test("label propagation: two bridged triangles separate into their communities") {
    // triangles {1,2,3} and {4,5,6} joined by bridge 3-4: after 3
    // synchronous min-tie rounds each triangle converges to one label
    // (hand-replayed: r1 = 2,1,1,3,4,4; r2 = 1,1,1,4,3,3; r3 final)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), s"got $got")
    // one round on a star: every leaf adopts the hub's label, the hub
    // adopts the smallest leaf's (all leaf labels tie at count 1)
    val star = (1L to 4L).map(l => (0L, l)).toDF("src", "dst")
    val one = Graph.labelPropagation(star, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    // reversed-duplicate edges canonicalize: same result
    val messy = edges.union(edges.select($"dst".as("src"), $"src".as("dst")))
    assert(Graph.labelPropagation(messy, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == got)
  }

  test("BFS levels: path distances, multi-source min, early exit, off-graph seeds") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    def run(seeds: Seq[Long], depth: Int) =
      Graph.bfsLevels(path, seeds.toDF("node"), maxDepth = depth)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // single seed, depth 3: node 5 stays unreached
    assert(run(Seq(1L), 3) == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
    // both ends seeded: min over sources
    assert(run(Seq(1L, 5L), 10) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0))
    // early exit: depth 10 on a 4-hop path terminates and is complete
    assert(run(Seq(1L), 10) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    // a seed that is not a graph node is ignored
    assert(run(Seq(99L), 5).isEmpty)
  }

  test("SSSP costs: cheapest beats fewest hops, frontier re-entry, multi-edge min") {
    // direct edge 1-4 costs 10; the 3-hop detour 1-2-3-4 costs 3: node 4
    // is first REACHED via the heavy edge (round 1) and must be improved
    // when the detour lands (round 3) — the exact case bfsLevels'
    // settled-first-wins shortcut would get wrong
    val g = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    def run(seeds: Seq[Long], rounds: Int) =
      Graph.ssspCosts(g, seeds.toDF("node"), maxRounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(Seq(1L), 4) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // hop bound 1: only the direct (expensive) arrival exists yet
    assert(run(Seq(1L), 1) == Map(1L -> 0L, 2L -> 1L, 4L -> 10L))
    // parallel edges collapse to the min weight; both directions fold
    val multi = Seq((1L, 2L, 5L), (2L, 1L, 2L), (1L, 2L, 9L))
      .toDF("src", "dst", "w")
    assert(Graph.ssspCosts(multi, Seq(1L).toDF("node"), maxRounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 0L, 2L -> 2L))
    // multi-source: min over seeds; off-graph seed ignored
    assert(run(Seq(1L, 4L), 4) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
    assert(run(Seq(42L), 3).isEmpty)
    // randomized: equals driver Bellman-Ford (<= rounds hops) on a
    // random weighted graph
    val rnd = new scala.util.Random(11)
    val edges = (0 until 60).map(_ =>
      (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong, (1 + rnd.nextInt(9)).toLong))
      .filter(e => e._1 != e._2)
    val rounds = 5
    val adjMin = edges.flatMap { case (a, b, w) => Seq(((a, b), w), ((b, a), w)) }
      .groupBy(_._1).map { case (k, ws) => (k, ws.map(_._2).min) }
    val nodes = adjMin.keySet.flatMap(k => Seq(k._1, k._2))
    val seedSet = Seq(0L, 7L).filter(nodes.contains)
    var d = seedSet.map(_ -> 0L).toMap
    for (_ <- 0 until rounds) {
      val relax = adjMin.toSeq.flatMap { case ((u, v), w) =>
        d.get(u).map(c => v -> (c + w))
      }.groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).min }
      d = (d.keySet ++ relax.keySet).map { k =>
        k -> math.min(d.getOrElse(k, Long.MaxValue), relax.getOrElse(k, Long.MaxValue))
      }.toMap
    }
    val got = Graph.ssspCosts(edges.toDF("src", "dst", "w"),
        seedSet.toDF("node"), maxRounds = rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == d, s"random graph: got $got want $d")
  }

  test("triangle delta: maintenance law old + delta == union") {
    // K4 built in two installments: old = 4-cycle (0 triangles), batch =
    // both diagonals → the 4 new triangles all belong to the delta
    val old4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val diag = Seq((1L, 3L), (2L, 4L)).toDF("src", "dst")
    val delta = Graph.triangleDelta(old4, diag).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val union = Graph.triangleCounts(old4.union(diag)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(delta == union.filter(_._2 > 0), s"delta $delta vs union $union")

    // a batch edge already present creates nothing; a batch closing ONE
    // wedge credits exactly that triangle's corners
    assert(Graph.triangleDelta(old4, old4.limit(1)).count() == 0)
    val wedge = Seq((10L, 11L), (11L, 12L)).toDF("src", "dst")
    val close = Seq((10L, 12L)).toDF("src", "dst")
    assert(Graph.triangleDelta(wedge, close).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(10L -> 1L, 11L -> 1L, 12L -> 1L))

    // law on the real substrate: span graph split by (src+dst)%3
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val edges = Graph.spanLinkEdges(docs)
    val oldE = edges.filter(($"src" + $"dst") % 3 =!= 0)
    val batch = edges.filter(($"src" + $"dst") % 3 === 0)
    val d = Graph.triangleDelta(oldE, batch).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val o = Graph.triangleCounts(oldE).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    val u = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    u.foreach { case (n, cu) =>
      assert(cu == o(n) + d.getOrElse(n, 0L), s"law broken at node $n")
    }
  }

  test("triangles: degree-oriented enumeration equals the id-ordered 3-join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val edges = Graph.spanLinkEdges(docs)
    // independent replay, the oracle's shape: canonical a<b pairs,
    // ascending 3-join
    val p = edges.select(least($"src", $"dst").as("a"),
        greatest($"src", $"dst").as("b")).distinct()
    val e2 = p.select($"a".as("b"), $"b".as("c"))
    val e3 = p.select($"a".as("a"), $"b".as("c"))
    val naive = p.join(e2, "b").join(e3, Seq("a", "c"), "left_semi")
      .select(explode(array($"a", $"b", $"c")).as("node"))
      .groupBy("node").agg(count(lit(1)).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val engine = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(engine.filter(_._2 > 0L) == naive,
      s"oriented vs naive mismatch: $engine vs $naive")
    assert(engine.values.sum / 3 == naive.values.sum / 3)
  }

  test("rendezvous sharding: consistent-routing law under shard growth") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def assign(n: Int) = Sampling.rendezvousShard(docs, "doc_id", n)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val at8 = assign(8)
    val at9 = assign(9)
    assert(at8.values.forall(s => s >= 0 && s < 8))
    // THE rendezvous property: growing 8 → 9 moves keys ONLY onto the
    // new shard — every key not routed to shard 8 keeps its assignment
    val moved = at8.keys.filter(k => at8(k) != at9(k)).toSeq
    assert(moved.forall(k => at9(k) == 8),
      s"a key moved between OLD shards: ${moved.map(k => (k, at8(k), at9(k))).take(3)}")
    // expected movement ≈ 1/9 of keys; loose band (binomial on 500)
    assert(moved.size > 20 && moved.size < 120, s"moved ${moved.size} of 500")
    // deterministic across evaluations
    assert(assign(8) == at8)
  }

  test("k-core: trees peel away, cycles survive, deep chains converge") {
    // cycle 1-2-3-4-1 with tail 4-5-6: 2-core = the cycle, degrees all 2
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val core2 = Graph.kCore(cyc, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))

    // K4 + pendant: 3-core = the clique exactly; 4-core empty
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 9L)).toDF("src", "dst")
    assert(Graph.kCore(k4, k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(Graph.kCore(k4, k = 4).count() == 0)

    // 20-node path: peeling eats one node from each end per round — the
    // multi-round convergence path (and the empty fixpoint)
    val path = (1L until 20L).map(i => (i, i + 1)).toDF("src", "dst")
    assert(Graph.kCore(path, k = 2).count() == 0)
    // ...and the maxIters guard fails loudly instead of half-peeling
    intercept[IllegalStateException] {
      Graph.kCore(path, k = 2, maxIters = 3)
    }

    // k = 1 on an already-1-core graph: fixpoint on round one, identity
    assert(Graph.kCore(cyc, k = 1).count() == 6)
  }

  test("dim recall: full-dim prefix is exact, sweep rows bounded and sane") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val res = Similarity.dimRecall(emb, emb.filter($"vec_id" < 5), k = 3,
        dims = Seq(8, 64))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // the d = 64 prefix IS the full vector: identical scores, identical
    // ties, recall exactly 1
    val (ep64, tp64, hp64, r64) = res(64)
    assert(tp64 == ep64 && hp64 == ep64 && r64 == 1.0,
      s"full-dim prefix must reproduce exact top-k: ${res(64)}")
    // every sweep row: k pairs per query, hits within [0, trunc]
    res.values.foreach { case (ep, tp, hp, r) =>
      assert(ep == 15L && tp == 15L && hp >= 0L && hp <= tp)
      assert(math.abs(r - hp.toDouble / ep.toDouble) < 1e-15)
    }
    // duplicate dims are a caller bug, not a silent double-count
    intercept[IllegalArgumentException] {
      Similarity.dimRecall(emb, emb.limit(1), k = 1, dims = Seq(8, 8))
    }
  }

  test("truncated top-k: full corpus pool and full-dim prefix both reduce to brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 3)
      .select("query_id", "vec_id", "cos_sim", "rank").collect().toSet
    // pool ≥ corpus (500 vectors < 3·200): the 8-dim prefix can't lose
    // any candidate, so the exact re-rank reproduces brute force
    // regardless of prefix quality
    val wide = Similarity.truncatedTopK(emb, queries, k = 3, d = 8,
        rerankFactor = 200)
      .select("query_id", "vec_id", "cos_sim", "rank").collect().toSet
    assert(wide == brute, "full-pool truncated retrieval must be exact")
    // d = dim: prefix scores ARE the exact scores — rf = 1 already exact,
    // and prefix_sim must equal cos_sim row by row
    val full = Similarity.truncatedTopK(emb, queries, k = 3, d = 64,
      rerankFactor = 1)
    assert(full.filter($"prefix_sim" =!= $"cos_sim").count() == 0)
    assert(full.select("query_id", "vec_id", "cos_sim", "rank")
      .collect().toSet == brute)
  }

  test("binary quantization: packed hamming is exact, wide pool reduces to brute force") {
    // hand-checked packing: dim 70 spans two words, and the hamming is
    // the count of sign disagreements regardless of word layout
    val a = Array.tabulate(70)(i => if (i % 3 == 0) 1.0f else -1.0f)
    val b = Array.tabulate(70)(i => if (i % 5 == 0) 1.0f else -1.0f)
    val expected = (0 until 70).count(i => (i % 3 == 0) != (i % 5 == 0))
    val hd = Seq((a, b)).toDF("a", "b")
      .select(Similarity.binaryHamming(
        Similarity.binarySignWords($"a", 70),
        Similarity.binarySignWords($"b", 70)).as("h"))
      .collect()(0).getLong(0)
    assert(hd == expected.toLong, s"hamming $hd != $expected")
    // identical vectors → 0; negated vectors → dim
    val az = Seq((a, a.map(-_))).toDF("a", "b")
    assert(az.select(Similarity.binaryHamming(
        Similarity.binarySignWords($"a", 70),
        Similarity.binarySignWords($"a", 70)).as("h"))
      .collect()(0).getLong(0) == 0L)
    assert(az.select(Similarity.binaryHamming(
        Similarity.binarySignWords($"a", 70),
        Similarity.binarySignWords($"b", 70)).as("h"))
      .collect()(0).getLong(0) == 70L)

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    // the native VecHamming loop must agree with the declarative
    // zip_with+aggregate formulation on every corpus pair vs query 0
    val q0 = emb.filter($"vec_id" === 0)
      .select(Similarity.binarySignWords($"embedding", 64).as("qb"))
      .collect()(0).getSeq[Long](0).toArray
    val disagree = emb
      .select(Similarity.binarySignWords($"embedding", 64).as("cb"))
      .withColumn("qb", typedLit(q0))
      .select(
        Similarity.binaryHamming($"cb", $"qb").as("native"),
        aggregate(
          zip_with($"cb", $"qb", (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
          lit(0L), (acc, x) => acc + x).as("declarative"))
      .filter($"native" =!= $"declarative").count()
    assert(disagree == 0L, "VecHamming must equal the zip_with formulation")

    val brute = Similarity.bruteForceTopK(emb, queries, k = 3)
      .select("query_id", "vec_id", "cos_sim", "rank").collect().toSet
    // pool ≥ corpus (500 < 3·200): Hamming can't lose a candidate, so
    // the exact re-rank reproduces brute force
    val wide = Similarity.binaryTopK(emb, queries, k = 3, dim = 64,
        rerankFactor = 200)
      .select("query_id", "vec_id", "cos_sim", "rank").collect().toSet
    assert(wide == brute, "full-pool binary retrieval must be exact")

    // recall sweep: monotone in rf, bounded, and exact at full width
    val sweep = Similarity.binaryRecall(emb, queries, k = 3, dim = 64,
        rerankFactors = Seq(1, 4, 200))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val recalls = Seq(1, 4, 200).map(rf => sweep(rf)._4)
    assert(recalls == recalls.sorted, s"recall must be monotone in rf: $recalls")
    sweep.values.foreach { case (ep, bp, hp, r) =>
      assert(ep == 15L && bp == 15L && hp >= 0L && hp <= bp)
      assert(math.abs(r - hp.toDouble / ep.toDouble) < 1e-15)
    }
    assert(sweep(200)._4 == 1.0, "full-width rf must recover exact top-k")
    intercept[IllegalArgumentException] {
      Similarity.binaryRecall(emb, emb.limit(1), k = 1, rerankFactors = Seq(2, 2))
    }
  }

  test("mutual nearest neighbors: hand geometry, symmetry, and hub exclusion") {
    // e0/e1 are each other's top-1; e2's top-1 is e0 but e0's is e1 —
    // one-directional attraction must NOT pair
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.7f, -0.7f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 0.98f, 0.2f)),
    ).toDF("vec_id", "embedding")
    val got = Similarity.mutualNeighbors(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (3L, 4L)), s"got $got")
  }

  test("link prediction: hand graph scores, cap drops hub centers") {
    // square a-b-c-d-a: the two diagonals are the only predictions,
    // each with common neighbors {2}, RA = 1/2 + 1/2, jaccard = 1
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val got = Graph.linkPredict(square, maxDegree = 64, minCommon = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set((1L, 3L), (2L, 4L)), s"got ${got.keySet}")
    got.values.foreach { case (cn, jac, ra) =>
      assert(cn == 2L && jac == 1.0 && ra == 1.0, s"got $got")
    }
    // path a-b-c at minCommon=1: predict (a, c) through b, RA = 1/deg(b)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val p = Graph.linkPredict(path, maxDegree = 64, minCommon = 1).collect()
    assert(p.length == 1)
    assert((p(0).getLong(0), p(0).getLong(1), p(0).getLong(2),
      p(0).getDouble(3), p(0).getDouble(4)) == ((1L, 3L, 1L, 1.0, 0.5)))
    // a star center above the degree cap is not enumerated: no output
    val star = (2L to 6L).map(i => (1L, i)).toDF("src", "dst")
    assert(Graph.linkPredict(star, maxDegree = 4, minCommon = 1).count() == 0)
    // ...and just below the cap the leaves pair through the center
    assert(Graph.linkPredict(star, maxDegree = 5, minCommon = 1).count() == 10)
  }

  test("co-occurrence projection: canonical edges, group cap, duplication idempotence") {
    val baskets = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),  // triangle 1-2-3
      (11L, 2L), (11L, 4L),             // edge 2-4
      (12L, 5L),                        // singleton group: no pairs
    ).toDF("g", "i")
    val got = Graph.coOccurrenceEdges(baskets, "g", "i")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L)))
    // a group over the item cap is dropped entirely
    val capped = Graph.coOccurrenceEdges(baskets, "g", "i", maxItemsPerGroup = 2)
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((2L, 4L)))
    // duplicating every basket under fresh group ids changes NOTHING:
    // the projection is a distinct pair set — the scale property that
    // makes re-crawled/re-delivered groups free
    val dup = (0 until 10).map(rep =>
        baskets.select((col("g") + rep * 1000).as("g"), col("i")))
      .reduce(_ unionByName _)
    val got10 = Graph.coOccurrenceEdges(dup, "g", "i")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got10 == got, "projection must be idempotent under basket duplication")
  }

  test("path trigrams and dwell stats: hand streams, boundary-exact top-N") {
    // user 1: a,b,c,d at 0/10/30/60s; user 2: a,b,c at 0/5/9s
    val ev = Seq(
      (1L, 1L, "a", 0L), (2L, 1L, "b", 10000L), (3L, 1L, "c", 30000L),
      (4L, 1L, "d", 60000L),
      (5L, 2L, "a", 0L), (6L, 2L, "b", 5000L), (7L, 2L, "c", 9000L),
    ).toDF("event_id", "user_id", "event_type", "ts_ms")
    val tri = Events.pathTrigrams(ev, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(tri.toSet == Set(("a", "b", "c", 2L), ("b", "c", "d", 1L)))
    // topN=1 keeps the higher count; a tie would break lexicographically
    assert(Events.pathTrigrams(ev, topN = 1).collect()(0).getLong(3) == 2L)

    val dwell = Events.dwellStats(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // a->b gaps: 10000 and 5000 -> mean 7500; b->c gaps: 20000 and 4000
    assert(dwell("a" -> "b") == ((2L, 5000L, 10000L, 7500.0)))
    assert(dwell("b" -> "c") == ((2L, 4000L, 20000L, 12000.0)))
    assert(dwell("c" -> "d") == ((1L, 30000L, 30000L, 30000.0)))
  }

  test("MAD outliers: hand medians, zero-MAD guard") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 9999.0),
    ).toDF("grp", "v")
    val got = Stats.madOutliers(df, "v", "grp", cutoff = 3.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    // group a: disc-median of {1,2,3,100} = 2; deviations {1,0,1,98},
    // disc-median = 1 → fence 3: only 98 exceeds
    assert(got("a") == ((4L, 2.0, 1.0, 1L)), s"got ${got("a")}")
    // group b: MAD = 0 (3 of 4 identical) → degenerate fence flags NOTHING,
    // even though 9999 is wildly off — the documented conservative rule
    assert(got("b") == ((4L, 5.0, 0.0, 0L)), s"got ${got("b")}")
  }

  test("k-anonymity: class populations, risk, and violation flags") {
    val df = Seq(
      (25, "A"), (25, "A"), (25, "A"), (30, "A"), (30, "B"), (30, "B"),
    ).toDF("age", "seg")
    val got = Pii.kAnonymity(df, Seq("age", "seg"), k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(25 -> "A") == ((3L, 0.333333, false)))
    assert(got(30 -> "A") == ((1L, 1.0, true)))
    assert(got(30 -> "B") == ((2L, 0.5, true)))
    intercept[IllegalArgumentException] { Pii.kAnonymity(df, Seq(), k = 3) }
    intercept[IllegalArgumentException] { Pii.kAnonymity(df, Seq("age"), k = 1) }
  }

  test("key profile: heavy hitter share and skew ratio, plan avoids a global window over keys") {
    val df = (Seq.fill(8)(7L) ++ Seq(1L, 2L, 3L, 4L)).toDF("k")
    val rows = Skew.keyProfile(df, col("k"), topN = 2).orderBy("rank").collect()
    assert(rows.length == 2)
    val r0 = rows(0)
    // key 7: 8 of 12 rows over 5 distinct keys → share 8/12, ratio 8/(12/5)
    assert((r0.getInt(0), r0.getLong(1), r0.getLong(2), r0.getLong(3),
      r0.getLong(4)) == ((1, 7L, 8L, 12L, 5L)))
    assert(r0.getDouble(5) == 0.666667 && r0.getDouble(6) == math.rint(8.0 / 2.4 * 1e4) / 1e4)
    assert(rows(1).getLong(1) == 1L, "ties below the top key break on key value")
    // the |keys|-sized top-N must be TakeOrderedAndProject, not a
    // single-partition window over every key
    val plan = Skew.keyProfile(df, col("k"), topN = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
  }

  test("centroid drift: single group is the identity, hand geometry agrees") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // one group == the corpus: its centroid IS the global centroid
    val self = Similarity.centroidDrift(
      emb.withColumn("label", lit(0)), "label").collect()
    assert(self.length == 1)
    assert(self(0).getDouble(2) == 1.0 && self(0).getDouble(3) == 1.0)
    // hand geometry: group 0 sums (2,0), group 1 (0,1), global (2,1)
    val hand = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)),
    ).toDF("label", "embedding")
    val got = Similarity.centroidDrift(hand, "label")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // cos((2,0),(2,1)) = 4/(2*sqrt(5)); ratio (2/2)/(sqrt(5)/3)
    assert(got(0)._1 == 2L && got(0)._2 == 0.8944)
    assert(math.abs(got(0)._3 - 3.0 / math.sqrt(5.0)) < 1e-4)
    assert(got(1)._1 == 1L && got(1)._2 == 0.4472)
  }

  test("FD violations: holding dependency returns nothing, breaks are counted") {
    val df = Seq(
      (1L, "a", 10), (1L, "a", 11), (2L, "b", 12), (2L, "c", 13), (2L, "c", 14),
    ).toDF("k", "dep", "other")
    // k -> dep is violated only by k=2 (two distinct deps over 3 rows)
    val got = Stats.fdViolations(df, Seq("k"), "dep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((2L, 3L, 2L)))
    // the (k, dep) pair determines itself -> no violations
    assert(Stats.fdViolations(df, Seq("k", "dep"), "dep").count() == 0)
  }

  test("Benford: digit extraction spans magnitudes, shares sum to one") {
    val df = Seq(1.5, 19.0, 25.0, 0.05, 912.0, 0.0, -3.0)
      .toDF("v") // 0 and negatives excluded; digits 1,1,2,5,9
    val got = Stats.benford(df, "v")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(1, 2, 5, 9))
    assert(got(1) == ((2L, 0.4)) && got(2) == ((1L, 0.2)))
    assert(got.values.map(_._2).sum == 1.0)
    // expected shares carry the Benford literals
    val e1 = Stats.benford(df, "v").filter($"digit" === 1)
      .collect()(0).getDouble(3)
    assert(e1 == 0.301029995664)
  }

  test("chi-square: independent table scores zero, dof from margins") {
    val indep = Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(10)(("y", "q"))
    val z = Stats.chiSquare(indep.toDF("a", "b"), "a", "b").collect()
    assert(z.length == 4)
    z.foreach { r =>
      assert(r.getLong(2) == 10L && r.getDouble(3) == 10.0)
      assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0 && r.getLong(6) == 1L)
    }
    // dependent 2x2: cells (x,p)=20, (y,q)=20 -> e = 10 each occupied
    // cell, chi_term = 10; occupied-cell total = 20, dof = 1
    val dep = Seq.fill(20)(("x", "p")) ++ Seq.fill(20)(("y", "q"))
    val d = Stats.chiSquare(dep.toDF("a", "b"), "a", "b").collect()
    assert(d.length == 2)
    d.foreach { r =>
      assert(r.getDouble(4) == 10.0 && r.getDouble(5) == 20.0 && r.getLong(6) == 1L)
    }
  }

  test("hard negatives: cross-label only, ranked like brute force on the rest") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val res = Similarity.hardNegatives(emb, emb.filter($"vec_id" < 3), k = 5)
      .collect()
    assert(res.length == 15)
    res.foreach { r =>
      assert(labels(r.getAs[Long]("vec_id")) != labels(r.getAs[Long]("query_id")),
        "a hard negative must not share the query's label")
    }
    // against a label-filtered brute-force replay: identical rows
    val brute = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 3), k = 500)
      .collect()
      .filter(r => labels(r.getAs[Long]("vec_id")) != labels(r.getAs[Long]("query_id")))
      .groupBy(_.getAs[Long]("query_id")).toSeq
      .flatMap { case (_, rows) =>
        rows.sortBy(_.getAs[Int]("rank")).take(5).zipWithIndex.map {
          case (r, i) => (r.getLong(0), r.getLong(1), r.getDouble(2), i + 1) }
      }.toSet
    val got = res.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == brute)
  }

  test("RRF hybrid: fused score recomputes from the emitted ranks; both-list items win") {
    // item 3 is rank-1 in BOTH lists for query 0: same text (sparse) and
    // nearest embedding (dense)
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "zeta eta theta iota"),
      (2L, "kappa lambda mu nu"),
      (3L, "alpha beta gamma delta"),
      (4L, "xi omicron pi rho")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f)),
      (2L, Array(0f, 0f, 1f)),
      (3L, Array(0.99f, 0.14f, 0f)),
      (4L, Array(0.5f, -0.8f, 0.33f))).toDF("vec_id", "embedding")
    val res = Retrieval.rrfHybridTopK(docs, emb, nQueries = 1,
      perList = 4, k = 5).collect()
    val top = res.filter(_.getAs[Int]("rank") == 1).head
    assert(top.getAs[Long]("item_id") == 3L)
    assert(top.getAs[Int]("rank_sparse") == 1 && top.getAs[Int]("rank_dense") == 1)
    res.foreach { r =>
      val rs = r.getAs[Int]("rank_sparse"); val rd = r.getAs[Int]("rank_dense")
      val want = (if (rs > 0) 1.0 / (60 + rs) else 0.0) +
        (if (rd > 0) 1.0 / (60 + rd) else 0.0)
      assert(math.abs(r.getAs[Double]("rrf_score") - want) < 1e-6,
        s"rrf_score must recompute from the emitted ranks: $r")
    }
    // scores weakly decrease in rank
    val scores = res.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("rrf_score"))
    assert(scores.toSeq == scores.sortBy(-_).toSeq)
  }

  test("MMR: redundant near-twin is deferred in favor of the diverse candidate") {
    // query 0; candidates: 1 and 2 are near-twins (rel ~0.9), 3 mirrors 1
    // across the x-axis (same rel, dissimilar to 1). Greedy λ=0.7 must
    // pick 1 (tie on id vs 2), then 3 (2's twin-penalty sinks it), then 2.
    val emb = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(0.9f, 0.4359f)),
      (2L, Array(0.9f, 0.436f)),
      (3L, Array(0.9f, -0.4359f))).toDF("vec_id", "embedding")
    val picks = Retrieval.mmrSelect(emb, nQueries = 1, m = 3, k = 3, lambda = 0.7)
      .orderBy("mmr_rank").collect()
    assert(picks.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 3L, 2L),
      s"got: ${picks.mkString(", ")}")
    // step-1 score is λ·rel; later scores carry the redundancy penalty
    assert(picks(0).getAs[Double]("mmr_score") > picks(1).getAs[Double]("mmr_score"))
    assert(picks(1).getAs[Double]("mmr_score") > picks(2).getAs[Double]("mmr_score"))
  }

  test("MMR on the corpus: first pick is the relevance argmax, picks are distinct") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val picks = Retrieval.mmrSelect(emb, nQueries = 2, m = 5, k = 3)
      .collect()
    assert(picks.length == 6)
    picks.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 3)
      assert(rows.map(_.getAs[Int]("mmr_rank")).sorted.toSeq == Seq(1, 2, 3))
    }
    val first = picks.filter(_.getAs[Int]("mmr_rank") == 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("vec_id")).toMap
    val brute = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 2), k = 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("vec_id")).toMap
    assert(first == brute)
  }

  test("novelty: first-occurrence shingle fractions, hand-computed") {
    val df = Seq(
      (1L, "a b c d", "A"), // shingles {a b c, b c d} — both first here
      (2L, "a b c x", "A"), // {a b c (seen), b c x (new)}
      (3L, "a b c d", "B"), // both seen in doc 1
    ).toDF("doc_id", "text", "source")
    val got = Dedup.noveltyBySource(df).orderBy("source")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("A", 2L, 4L, 3L, 0.75),
      ("B", 1L, 2L, 0L, 0.0)))
  }

  test("vocab drift: exact TVD vs corpus on a closed-form corpus") {
    // A: {x:2, y:1} N=3; B: {y:1, z:1} N=2; corpus: {x:2, y:2, z:1} N=5
    // TVD(A) = (|2/3-2/5| + |1/3-2/5| + 1/5)/2 = 4/15; TVD(B) = 0.4
    val df = Seq(
      (1L, "x x y", "A"),
      (2L, "y z", "B"),
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.vocabDrift(df).orderBy("source")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("A", 3L, 2L, 0.266667),
      ("B", 2L, 2L, 0.4)))
  }

  test("value anomalies: z cut on exact per-user moments, small users skipped") {
    // user 1: ten 10.0s and one 30.0 — z(30) = 18.1818/(sqrt(4000)/11)
    //   = sqrt(10) -> 3.1623 flagged; z(10) = -0.3162 not
    // user 2: same spike shape but only 3 events — under minEvents
    val rows = (1 to 10).map(i => (i.toLong, 1L, 10.0)) ++
      Seq((11L, 1L, 30.0), (12L, 2L, 10.0), (13L, 2L, 10.0), (14L, 2L, 30.0))
    val df = rows.toDF("event_id", "user_id", "value")
    val got = Events.valueAnomalies(df, zCut = 3.0, minEvents = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.toSeq == Seq((11L, 1L, 3.1623)))
  }

  test("winsorize: exact nearest-rank bounds, clip counts, robust mean") {
    // stratum A: v = 0.01 .. 0.20 (n=20). loIdx = floor(19*5/100)+1 = 1
    // -> lo = 0.01 (nothing below); hiIdx = floor(19*95/100)+1 = 19 ->
    // hi = 0.19, one value above. mean = (sum(0.01..0.19) + 0.19)/20
    //   = (1.90 + 0.19)/20 = 0.1045
    // stratum B: constant 0.5 -> lo = hi = 0.5, no clips, mean 0.5.
    val rows = (1 to 20).map(i => ("A", i / 100.0)) ++
      (1 to 5).map(_ => ("B", 0.5))
    val df = rows.toDF("lang", "score")
    val got = Stats.winsorize(df, "score", "lang").orderBy("stratum")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got.toSeq == Seq(
      ("A", 20L, 0.01, 0.19, 0L, 1L, 0.1045),
      ("B", 5L, 0.5, 0.5, 0L, 0L, 0.5)))
  }

  test("running anomalies: prequential z against strictly-prior history") {
    // user 1: ten alternating 10/12 (prior mean 11, popstd 1 at event 11),
    // then a 30 -> z = 19 flagged. The trailing 10 sees the spike in ITS
    // prior window (n=11, var inflated) -> not flagged. First ten events
    // have n_prior < 8 -> skipped whatever their value.
    val rows = (1 to 10).map(i =>
      (i.toLong, 1L, i.toLong * 1000, if (i % 2 == 1) 10.0 else 12.0)) ++
      Seq((11L, 1L, 11000L, 30.0), (12L, 1L, 12000L, 10.0))
    val df = rows.toDF("event_id", "user_id", "ts", "value")
    val got = Events.runningValueAnomalies(df, zCut = 3.0, minPrior = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.toSeq == Seq((11L, 19.0)))
  }

  test("embed outliers: off-manifold vector flagged, cluster members kept") {
    // two REAL clusters (+x and +z, five members each) so 2-means locks
    // onto them, plus one orthogonal +y vector: k-means cannot adopt the
    // outlier as a singleton centroid (both centroids are held by five
    // members), so its cosine to its assigned centroid stays ~0.2 while
    // every cluster member sits above 0.9. Init order matters: vec 0 is
    // +x and vec 1 is +z (trainCodebook seeds from the first k by id)
    val xs = (0L until 10L by 2L).map(i => (i, Array(1.0f, 0.001f * i, 0.0f)))
    val zs = (1L until 10L by 2L).map(i => (i, Array(0.0f, 0.001f * i, 1.0f)))
    val odd = Seq((10L, Array(0.0f, 1.0f, 0.0f)))
    val df = (xs ++ zs ++ odd).toDF("vec_id", "embedding")
    val got = Similarity.embedOutliers(df, k = 2, iters = 2, minCos = 0.5)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(got.size == 11)
    assert(got(10L)._2 && got(10L)._1 < 0.5, s"odd: ${got(10L)}")
    (0L until 10L).foreach { i =>
      assert(!got(i)._2 && got(i)._1 > 0.9, s"vec $i: ${got(i)}")
    }
  }

  test("aggTopK == row_number window under adversarial repartitioning, NaN and ties included") {
    // scores engineered for boundary ties (equal scores straddling the
    // k cut), negative zero vs zero, and NaN (a zero-norm cosine): the
    // aggregate must reproduce the window's total order — score desc
    // with NaN FIRST (Spark sorts NaN greater than any double), id asc
    // on ties — for every partitioning and merge order
    val rnd = new scala.util.Random(43)
    val rows = (0 until 4).flatMap { q =>
      (0 until 200).map { i =>
        val s = rnd.nextInt(12) match {
          case 0 => Double.NaN
          case 1 => 0.0
          case 2 => -0.0
          case n => (n - 6).toDouble / 4
        }
        (q.toLong, i.toLong, s)
      }
    }
    val base = rows.toDF("query_id", "vec_id", "cos_sim")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    val want = base.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)) &
          ~(1L << 63), r.getInt(3)))
      .toSet // fold -0.0 into 0.0: the window emits the arbitrary tie's sign
    for (parts <- Seq(1, 2, 7, 32)) {
      val got = Similarity.aggTopK(base.repartition(parts), 7)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)) &
            ~(1L << 63), r.getInt(3)))
        .toSet
      assert(got == want, s"parts=$parts: aggregate diverged from window")
    }
  }

  test("aggTopK plans as a partial (map-side) aggregate, not a candidate-wide window") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 3), 5)
      .queryExecution.executedPlan.toString
    // the TypedImperativeAggregate must run partial_top_k_by BEFORE the
    // exchange (k-slot buffers per partition) and merge after — the
    // whole point of replacing the row_number window; and no Window
    // node may survive in the finisher path
    assert(plan.contains("partial_top_k_by"), s"no partial aggregate:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"not object-hash:\n$plan")
    assert(!plan.contains("Window"), s"window survived:\n$plan")
  }

  test("string-id aggTopKBy == row_number window under adversarial repartitioning") {
    // the BoundedTopKStr twin of the long-id law: equal weights
    // straddling the k cut tie on the TERM (binary UTF-8 asc must equal
    // Spark's string asc), NaN ranks first, -0.0 == 0.0 — for every
    // partitioning and merge order
    val rnd = new scala.util.Random(47)
    val rows = (0 until 3).flatMap { g =>
      (0 until 150).map { i =>
        val s = rnd.nextInt(10) match {
          case 0 => Double.NaN
          case 1 => 0.0
          case 2 => -0.0
          case n => (n - 5).toDouble / 3
        }
        // mixed-case + digits: exercises byte-wise ordering ('Z' < 'a')
        val term = (if (i % 3 == 0) "T" else "t") + (i % 50)
        (s"g$g", term, s)
      }
    }
    // (group, term) may repeat with different scores — window rank vs
    // aggregate must agree anyway (dedup by max handled upstream in real
    // callers; the law is about the ranking, so dedup here)
    val base = rows.toDF("grp", "term", "weight")
      .groupBy("grp", "term").agg(max("weight").as("weight"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy(col("weight").desc, col("term").asc)
    val want = base.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 6)
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)) &
          ~(1L << 63), r.getInt(3)))
      .toSet
    for (parts <- Seq(1, 2, 7, 32)) {
      val got = Similarity.aggTopKBy(base.repartition(parts), "weight", 6,
          Seq("grp"), "rank", idCol = "term")
        .collect()
        .map(r => (r.getString(0), r.getString(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)) &
            ~(1L << 63), r.getInt(3)))
        .toSet
      assert(got == want, s"parts=$parts: string aggregate diverged from window")
    }
  }

  test("clusterTopTerms plans the string partial aggregate, not a vocab-wide window") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = Tfidf.clusterTopTerms(docs, "lang", topK = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_by_str"), s"no string partial:\n$plan")
    assert(!plan.contains("Window"), s"window survived:\n$plan")
    // and the cut is right: ≤ topK rows per group, rank dense from 1
    val got = df.collect().groupBy(_.getString(0))
    got.foreach { case (g, rs) =>
      assert(rs.length <= 3, s"group $g overflowed topK")
      assert(rs.map(_.getInt(5)).sorted.toSeq == (1 to rs.length),
        s"group $g ranks not dense")
    }
  }

  test("collocations plans a TakeOrderedAndProject cut, not a global window sort") {
    // parquet-backed input (a LocalRelation would constant-fold the
    // interesting plan away); the corpus-derived bigram table must be
    // cut by per-partition heaps + a topK-row merge, with the rank
    // window running AFTER the cut (parent of TakeOrderedAndProject in
    // the tree) over ≤ topK rows
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = TextAnalysis.collocations(docs, minCount = 3, topK = 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no take-ordered cut:\n$plan")
    val wIdx = plan.indexOf("Window")
    val tIdx = plan.indexOf("TakeOrderedAndProject")
    assert(wIdx >= 0 && wIdx < tIdx,
      s"rank window must run on the already-cut rows (parent of the take):\n$plan")
    assert(df.count() <= 10)
  }

  test("IVF path is repartitioning-invariant end to end (the aggregate finishers)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 3)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopK(c, queries, k = 3, numCentroids = 32, nprobe = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    val want = run(emb)
    for (parts <- Seq(1, 5, 32)) {
      assert(run(emb.repartition(parts)) == want,
        s"ivfTopK must be partitioning-invariant at parts=$parts")
    }
  }

  test("mutual-NN approx: exhaustive probe reproduces the exact twin") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id_a", "vec_id_b", "cos_sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = pairs(Similarity.mutualNeighbors(emb))
    assert(exact.nonEmpty)
    // nprobe = numCentroids → every pair shares a block → the blocked
    // operator degenerates to the exact one, cos_sim included
    assert(pairs(Similarity.mutualNeighborsApprox(emb, 8, 8)) == exact)
    // default blocking: every emitted pair is a genuine reciprocal
    // top-1 over its candidate lists; on this tiny corpus the blocks
    // still find most of the true pairs
    val approx = pairs(Similarity.mutualNeighborsApprox(emb))
    assert(approx.nonEmpty &&
      approx.map(p => (p._1, p._2)).intersect(exact.map(p => (p._1, p._2))).size * 2
        >= exact.size,
      s"approx ${approx.size} vs exact ${exact.size}")
  }

  test("winnowing: coverage guarantee, rightmost ties, density, short docs") {
    // coverage theorem: docs sharing a run of window+k-1 = 6 tokens must
    // share at least one selected fingerprint, whatever surrounds the run
    val run = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"one two three $run x y z"),
      (2L, s"$run completely different tail here"),
      (3L, "unrelated words entirely disjoint content stream"),
    ).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(df, k = 3, window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      "a shared 6-token run must yield a shared fingerprint")
    assert(byDoc(3L).intersect(byDoc(1L) ++ byDoc(2L)).isEmpty)
    // density: selections per doc ≤ shingle count, ≥ ceil(m / window)
    // (each window of 4 consecutive positions selects at least one)
    fp.groupBy(_._1).foreach { case (id, rows) =>
      val m = df.filter($"doc_id" === id).select(
        size(split(trim($"text"), "\\s+")) - 2).head().getInt(0)
      assert(rows.length <= m && rows.length >= (m + 3) / 4,
        s"doc $id: ${rows.length} selections over $m shingles")
    }
    // rightmost tie: identical tokens → all shingle hashes equal → every
    // window selects the RIGHTMOST position of its frame; selections are
    // the positions {w-1, w, ...} minima... the unique selected hash with
    // increasing positions; verify against a brute-force replay
    val rep = Seq((9L, "tok tok tok tok tok tok tok tok")).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(rep, k = 3, window = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    // 6 identical shingles, windows end at pos 3,4,5 → rightmost min is
    // the window END each time → positions 3,4,5 with one shared hash
    assert(got.map(_._1).toSeq == Seq(3L, 4L, 5L), s"got ${got.toSeq}")
    assert(got.map(_._2).distinct.length == 1)
    // short doc (fewer shingles than the window): overall min selected
    val short = Seq((5L, "just four tokens here")).toDF("doc_id", "text")
    assert(Dedup.winnowFingerprints(short, k = 3, window = 4).count() == 1)
    // pairs: the shared-run docs pair up when minShared = 1
    val pairs = Dedup.winnowPairs(df, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("jaro_winkler: classic reference values, boost threshold, empty convention") {
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),   // jaro .9444, prefix 3
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("", "", 0.0),                               // oracle convention
      ("a", "b", 0.0),
      ("CRATE", "TRACE", 0.7333333333333334),      // prefix 0: no boost
      ("aXXXX", "aYYYY", 0.4666666666666666),      // jaro<=0.7: no boost
      ("abcd", "abdc", 0.9333333333333333),        // one transposition
      ("héllo", "hèllo", 0.88),                    // non-ASCII char path
    )
    val got = cases.toDF("a", "b", "want")
      .select(graft.functions.GraftFunctions.jaro_winkler($"a", $"b"), $"want", $"a", $"b")
      .collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
        s"jw(${r.getString(2)}, ${r.getString(3)}) = ${r.getDouble(0)}, want ${r.getDouble(1)}")
    }
    // null propagates
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(graft.functions.GraftFunctions.jaro_winkler($"a", $"b")).collect()
    assert(n.head.isNullAt(0))
  }

  test("jaro_winkler: bit-parallel fast path ≡ reference scalar algorithm (fuzz, incl. the 64-length boundary)") {
    import org.apache.spark.unsafe.types.UTF8String
    // independent reference: the textbook boolean-array Jaro-Winkler,
    // matching the oracle engine's conventions (integer t/2, 0.7 boost
    // gate, both-empty → 0)
    def ref(a: String, b: String): Double = {
      val la = a.length; val lb = b.length
      if (la == 0 || lb == 0) return 0.0
      val window = math.max(0, math.max(la, lb) / 2 - 1)
      val aM = new Array[Boolean](la); val bM = new Array[Boolean](lb)
      var m = 0
      for (i <- 0 until la) {
        val lo = math.max(0, i - window); val hi = math.min(lb - 1, i + window)
        var j = lo
        var done = false
        while (j <= hi && !done) {
          if (!bM(j) && a.charAt(i) == b.charAt(j)) {
            aM(i) = true; bM(j) = true; m += 1; done = true
          }
          j += 1
        }
      }
      if (m == 0) return 0.0
      var t = 0; var k = 0
      for (i <- 0 until la) if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      val jaro = (m.toDouble / la + m.toDouble / lb + (m - t / 2).toDouble / m) / 3.0
      if (jaro <= 0.7) return jaro
      var l = 0
      val maxL = math.min(4, math.min(la, lb))
      while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
    val rnd = new scala.util.Random(20260818L)
    // small alphabet forces dense match/transposition structure; lengths
    // straddle 64 so the fuzz crosses bit-path → scalar-path fallback
    def randStr(maxLen: Int): String = {
      val n = rnd.nextInt(maxLen + 1)
      (0 until n).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    }
    for (_ <- 1 to 4000) {
      val a = randStr(70); val b = randStr(70)
      val got = graft.functions.JaroWinkler.score(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got == ref(a, b), s"jw('$a', '$b'): got $got, want ${ref(a, b)}")
    }
    // exact 64/65 boundary pairs (wm width-64 branch, fallback handoff)
    for (la <- Seq(63, 64, 65); lb <- Seq(63, 64, 65)) {
      val a = Seq.fill(la)(('a' + rnd.nextInt(3)).toChar).mkString
      val b = Seq.fill(lb)(('a' + rnd.nextInt(3)).toChar).mkString
      val got = graft.functions.JaroWinkler.score(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got == ref(a, b), s"boundary $la×$lb: got $got, want ${ref(a, b)}")
    }
  }

  test("association rules: hand-computed support/confidence/lift, mega-basket exclusion") {
    val df = Seq(
      (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"), (2L, "y"), // duplicate item rows collapse
      (3L, "x"), (3L, "z"),
      (4L, "y"),
    ).toDF("b", "i")
    val got = Graph.associationRules(df, "b", "i", minSupportCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8)))).toMap
    // N=4; n_x=3, n_y=3, n_z=1; (x,y) in 2 baskets, (x,z) in 1
    assert(got(("x", "y")) == ((3L, 3L, 2L, 0.5, 0.666667, 0.666667, 0.888889)))
    assert(got(("x", "z")) == ((3L, 1L, 1L, 0.25, 0.333333, 1.0, 1.333333)))
    assert(got.size == 2)
    // minSupportCount=2 keeps only the twice-co-occurring pair
    assert(Graph.associationRules(df, "b", "i", minSupportCount = 2)
      .count() == 1)
    // a basket over the cap drops from pair counts AND denominators:
    // with cap 2, basket 5 (3 items) vanishes — N=4 and counts unchanged
    val withMega = df.union(Seq((5L, "x"), (5L, "y"), (5L, "z")).toDF("b", "i"))
    val capped = Graph.associationRules(withMega, "b", "i",
        minSupportCount = 1, maxItemsPerBasket = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(capped(("x", "y")) == ((3L, 3L, 2L, 0.5)))
    assert(capped.size == 2)
  }

  test("FD violations: NULL counts as a distinct rhs state") {
    val df = Seq[(Long, Option[String])](
      (1L, Some("a")), (1L, None),          // {a, NULL} → violation, 2 states
      (2L, None), (2L, None),               // all-NULL → constant, holds
      (3L, Some("x")), (3L, Some("x")),     // constant non-null → holds
    ).toDF("k", "dep")
    val got = Stats.fdViolations(df, Seq("k"), "dep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 2L)), s"got ${got.toSeq}")
  }

  test("filtered IVFADC search: k full results, all satisfying the predicate, never post-filter starved") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("ivffilt").toString + "/ix"
    Similarity.writeIvfPqIndex(emb, dir, numCentroids = 8, m = 4,
      ksub = 16, dim = 64)
    val qs = emb.filter(col("vec_id") < 3)
    val got = Similarity.ivfPqTopKFiltered(spark, dir, qs, emb,
        col("vec_id") % 3 === 1, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4)))
    // k full rows per query, every hit inside the allowed set
    assert(got.length == 9 && got.forall(_._2 % 3 == 1), got.toSeq)
    // pre-filtering ≠ post-filtering: the unfiltered top-3 lists carry
    // out-of-filter vectors here, so post-filtering them would starve —
    // the exact failure the pre-ADC semi-join exists to prevent
    val unfiltered = Similarity.ivfPqTopK(spark, dir, qs, emb, k = 3,
        nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val postFiltered = unfiltered.filter(_._2 % 3 == 1)
    assert(postFiltered.length < got.length,
      s"draw too easy: unfiltered top-k already satisfies the filter " +
        s"(${postFiltered.length} of ${got.length}) — pick a sparser predicate")
    graft.operators.CacheRegistry.release(spark)
  }

  test("appendShards: published shards immutable, append starts at the next free id, contiguity enforced") {
    val base = java.nio.file.Files.createTempDirectory("pubapp").toString
    val dir = base + "/shards"
    val seed = docs.filter(col("doc_id") < 100)
    val rest = docs.filter(col("doc_id") >= 100)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val m1 = rows(Layout.publishInit(spark, seed, dir, nShards = 4))
    val m2 = rows(Layout.appendShards(spark, rest, dir))
    // every published shard's (n_docs, n_tokens, digest) is byte-stable
    // across the append — training loaders' checksums keep holding
    assert(m1.forall { case (s, v) => m2.get(s).contains(v) },
      s"published shards changed across append: $m1 vs $m2")
    // appended shards start past every published id, nothing in between
    val newIds = (m2.keySet -- m1.keySet)
    assert(newIds.nonEmpty && newIds.min > m1.keySet.max)
    // contiguity guard: re-appending ids at or below the published max
    // must refuse before anything writes
    val before = rows(Layout.shardManifest(
      spark.read.schema("doc_id BIGINT, text STRING, n_tokens BIGINT, shard_id INT")
        .parquet(dir)))
    intercept[IllegalArgumentException] {
      Layout.appendShards(spark, docs.filter(col("doc_id") < 50), dir)
    }
    assert(rows(Layout.shardManifest(
      spark.read.schema("doc_id BIGINT, text STRING, n_tokens BIGINT, shard_id INT")
        .parquet(dir))) == before, "refused append must not write")
    // appends CHAIN: a second publishInit-free append keeps extending
    assert(Layout.appendShards(spark,
      Seq((10000L, "tail doc after everything")).toDF("doc_id", "text"),
      dir).collect().nonEmpty)
    // crash fence (advisor r18): data ahead of meta — a previous append
    // that died between its shard write and its meta roll — must refuse
    // a retry (which would silently duplicate rows), not re-append. Model
    // the crash by rolling the meta sidecar BACK one append.
    val metaNow = graft.operators.StoreMeta.read(dir)
    graft.operators.StoreMeta.write(dir,
      "budget" -> metaNow("budget"), "max_doc_id" -> "9999",
      "next_shard" -> (metaNow("next_shard").toLong - 1L))
    val ex = intercept[IllegalArgumentException] {
      Layout.appendShards(spark,
        Seq((20000L, "doc after the crash")).toDF("doc_id", "text"), dir)
    }
    assert(ex.getMessage.contains("crashed between"), ex.getMessage)
    // restoring the meta makes the same append legal again
    graft.operators.StoreMeta.write(dir,
      "budget" -> metaNow("budget"), "max_doc_id" -> metaNow("max_doc_id"),
      "next_shard" -> metaNow("next_shard"))
    assert(Layout.appendShards(spark,
      Seq((20000L, "doc after the recovery")).toDF("doc_id", "text"),
      dir).collect().nonEmpty)
  }

  test("forgetPublished: only affected shards rewrite, empty shards vanish, geometry frozen") {
    val base = java.nio.file.Files.createTempDirectory("pubforget").toString
    val dir = base + "/shards"
    Layout.publishInit(spark, docs, dir, nShards = 8)
    val shardSchema = "doc_id BIGINT, text STRING, n_tokens BIGINT, shard_id INT"
    // forget ONE whole shard (every doc in shard 3) plus one doc from
    // shard 0 — exercises both the vanishing-shard path and the rewrite
    val byShard = spark.read.schema(shardSchema).parquet(dir)
      .select("doc_id", "shard_id").collect()
      .groupBy(_.getInt(1)).map { case (s, rs) => s -> rs.map(_.getLong(0)).toSet }
    import spark.implicits._
    val doomed = (byShard(3) + byShard(0).head).toSeq.toDF("doc_id")
    val manifest = Layout.forgetPublished(spark, doomed, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(!manifest.contains(3), "fully-forgotten shard must vanish")
    assert(manifest(0) == byShard(0).size - 1)
    val left = spark.read.schema(shardSchema).parquet(dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(doomed.collect().map(_.getLong(0)).forall(!left.contains(_)))
    // geometry frozen + generation bumped: loaders see the marker move
    val meta = graft.operators.StoreMeta.read(dir)
    assert(meta("forget_gen") == "1" && meta("next_shard") == "8")
    // forgotten ids are NOT re-usable: the contiguity guard still spans
    // them (doc_id order is the layout's backbone)
    intercept[IllegalArgumentException] {
      Layout.appendShards(spark,
        Seq(byShard(3).head -> "resurrected").toDF("doc_id", "text"), dir)
    }
  }

  test("forgetPublished: a crash between two shard swaps resumes to the law's post-state on the next call") {
    val base = java.nio.file.Files.createTempDirectory("pubforget-crash")
      .toString
    val dir = base + "/shards"
    Layout.publishInit(spark, docs, dir, nShards = 8)
    val shardSchema = "doc_id BIGINT, text STRING, n_tokens BIGINT, shard_id INT"
    val byShard = spark.read.schema(shardSchema).parquet(dir)
      .select("doc_id", "shard_id").collect()
      .groupBy(_.getInt(1)).map { case (s, rs) =>
        s -> rs.map(_.getLong(0)).toSet }
    import spark.implicits._
    // a forget spanning THREE partial shards and one vanishing shard —
    // then die after the first swap (the spec hook aborts the loop), so
    // the export is live with shard 0 rewritten and shards 2/4/6 still
    // holding forgotten docs, intent on disk
    val doomed = (byShard(6) + byShard(0).head + byShard(2).head +
      byShard(4).head).toSeq.toDF("doc_id")
    intercept[IllegalStateException] {
      Layout.forgetPublishedImpl(spark, doomed, dir,
        filesPerPartition = 1, crashAfterSwaps = 1)
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      dir + "_forgetting/_forget_intent.json")),
      "the crashed forget must leave its intent on disk")
    val midState = spark.read.schema(shardSchema).parquet(dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(doomed.collect().map(_.getLong(0)).exists(midState.contains),
      "construction: the crash must strand some forgotten docs live")
    // meta did NOT move — the generation marker only bumps once the
    // swaps are all in (a loader seeing forget_gen=1 may trust it)
    assert(!graft.operators.StoreMeta.read(dir).contains("forget_gen"))
    // the NEXT call detects the intent, rolls the pending forget
    // FORWARD to completion, THEN applies its own (empty) forget set —
    // landing on exactly the law's post-state
    val manifest = Layout.forgetPublished(spark,
        Seq.empty[Long].toDF("doc_id"), dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(!manifest.contains(6), "fully-forgotten shard must vanish")
    assert(manifest(0) == byShard(0).size - 1 &&
      manifest(2) == byShard(2).size - 1 &&
      manifest(4) == byShard(4).size - 1)
    val left = spark.read.schema(shardSchema).parquet(dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(doomed.collect().map(_.getLong(0)).forall(!left.contains(_)),
      "resume must finish every pending swap")
    // resumed forget lands its recorded generation; the empty follow-up
    // forget bumps once more; staging + intent are gone
    assert(graft.operators.StoreMeta.read(dir)("forget_gen") == "2")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "_forgetting")))
    // untouched shards stayed byte-stable through crash + resume
    assert(manifest(1) == byShard(1).size && manifest(3) == byShard(3).size)
  }

  test("generation-pointer compaction: a probe racing the flip completes on the old generation; serving unchanged for new reads") {
    import graft.operators.{StoreGen, StoreUpkeep}
    val base = java.nio.file.Files.createTempDirectory("storegen").toString
    val idx = base + "/lsh"
    LshIndex.write(docs.filter(col("doc_id") % 2 === 0), idx, nShards = 2)
    LshIndex.append(spark, docs.filter(col("doc_id") % 2 === 1), idx)
    def pairs(d: String) = LshIndex.lshPairs(spark, d)
      .orderBy("doc_id_a", "doc_id_b").collect().toSeq
    val before = pairs(idx)
    assert(before.nonEmpty)
    // the RACE: a reader resolves the pointer (generation 0 = the plain
    // path), builds its lazy plan... and the compaction flips to
    // generation 1 before the read executes. The old generation is
    // retained as the grace window, so the read completes — on gen 0 —
    // with the same answer
    val resolvedAtRead = StoreGen.resolve(idx)
    assert(resolvedAtRead == idx, "no pointer yet: gen 0 is the plain path")
    val inflight = LshIndex.lshPairs(spark, resolvedAtRead)
    assert(StoreUpkeep.compactNewGeneration(spark, idx,
      StoreUpkeep.LshKind) == 1L)
    assert(inflight.orderBy("doc_id_a", "doc_id_b").collect().toSeq == before,
      "in-flight read must complete on the retired generation")
    // new reads resolve generation 1; serving unchanged, and the store's
    // whole surface (probe, append, forget, health) follows the pointer
    assert(StoreGen.resolve(idx) == idx + "_g1")
    assert(pairs(idx) == before)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(idx)) &&
      fs.exists(new org.apache.hadoop.fs.Path(idx + "_g1")))
    // second flip: gen 2 serves, gen 0 (one-behind-grace) is reclaimed
    assert(StoreUpkeep.compactNewGeneration(spark, idx,
      StoreUpkeep.LshKind) == 2L)
    assert(pairs(idx) == before)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx)) &&
      fs.exists(new org.apache.hadoop.fs.Path(idx + "_g1")) &&
      fs.exists(new org.apache.hadoop.fs.Path(idx + "_g2")))
    // forget lands in (and compaction applies it from) the SERVING
    // generation; the flip applies it physically
    val doomedId = spark.read.parquet(idx + "_g2_sigs")
      .select("doc_id").head().getLong(0)
    import spark.implicits._
    LshIndex.forget(spark, Seq(doomedId).toDF("doc_id"), idx)
    assert(graft.operators.Tombstones.exists(idx + "_g2"))
    StoreUpkeep.compactNewGeneration(spark, idx, StoreUpkeep.LshKind)
    assert(!graft.operators.Tombstones.exists(StoreGen.resolve(idx)))
    assert(!spark.read.parquet(StoreGen.resolve(idx) + "_sigs")
      .filter(col("doc_id") === doomedId).head(1).nonEmpty)
  }

  test("generation-pointer compaction: ivfpq and span stores serve identically across a flip") {
    import graft.operators.{SpanStore, StoreGen, StoreUpkeep}
    val base = java.nio.file.Files.createTempDirectory("storegen2").toString
    // IVFADC: the flip stages a COMPLETE store (codes + frozen sidecars)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ivf = base + "/ivf"
    Similarity.writeIvfPqIndex(emb, ivf, numCentroids = 8,
      m = 4, ksub = 16, dim = 64)
    val queries = emb.filter(col("vec_id") < 4)
    def probe(d: String) = Similarity.ivfPqTopK(spark, d, queries, emb,
      k = 3, nprobe = 2, rerankFactor = 4, m = 4, dim = 64)
      .orderBy("query_id", "rank").collect().toSeq
    val ivfBefore = probe(ivf)
    assert(StoreUpkeep.compactNewGeneration(spark, ivf,
      StoreUpkeep.IvfPqKind) == 1L)
    assert(probe(ivf) == ivfBefore)
    assert(StoreGen.resolve(ivf) == ivf + "_g1")
    // span store: probe + bloom sidecar follow the pointer too
    val docs01 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val span = base + "/span"
    SpanStore.write(docs01, span, minTokens = 8, shardChars = 1,
      withBloom = true)
    val batch = docs01.filter(col("doc_id") < 10)
    def sprobe(d: String) = SpanStore.probe(spark, batch, d)
      .orderBy("doc_id", "p").collect().toSeq
    val spanBefore = sprobe(span)
    assert(StoreUpkeep.compactNewGeneration(spark, span,
      StoreUpkeep.SpanKind) == 1L)
    assert(sprobe(span) == spanBefore)
    assert(SpanStore.hasBloom(span), "bloom sidecar must follow the pointer")
    graft.operators.CacheRegistry.release(spark)
  }

  test("generation pointer: resolve hammered against repeated flips never dangles; a lost pointer recovers to the highest generation") {
    import graft.operators.{StoreGen, StoreUpkeep}
    val base = java.nio.file.Files.createTempDirectory("storegen-race")
      .toString
    val idx = base + "/lsh"
    LshIndex.write(docs.filter(col("doc_id") < 40), idx, nShards = 2)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(hconf)
    val servedPairs = LshIndex.lshPairs(spark, idx)
      .queryExecution.toRdd.count()
    graft.operators.CacheRegistry.release(spark)
    // the r19 weak mark: setGeneration's delete-then-rename left a
    // window where the pointer was ABSENT and a racing resolve fell
    // back to generation 0 — reclaimed from the second flip on. The
    // atomic replace closes it: a reader loop resolving flat-out across
    // four flips must always land on a generation whose directories
    // exist (straddling TWO whole compactions is the documented grace
    // bound and the only legitimate miss).
    @volatile var stop = false
    @volatile var loops = 0L
    @volatile var failure: Option[String] = None
    val reader = new Thread(() => {
      while (!stop && failure.isEmpty) {
        val g = StoreGen.generation(idx, hconf)
        val d = StoreGen.path(idx, g)
        if (!fs.exists(new org.apache.hadoop.fs.Path(d + "_meta"))) {
          val now = StoreGen.generation(idx, hconf)
          if (now - g < 2)
            failure = Some(s"resolved generation $g (current $now) but " +
              s"${d}_meta is missing — the pointer dangled")
        }
        loops += 1
      }
    })
    reader.start()
    try for (expect <- 1L to 4L)
      assert(StoreUpkeep.compactNewGeneration(spark, idx,
        StoreUpkeep.LshKind) == expect)
    finally { stop = true; reader.join(30000) }
    assert(failure.isEmpty, failure.getOrElse(""))
    assert(loops > 100L, s"reader starved — only $loops resolutions raced " +
      "the flips; the hammer proves nothing")
    info(s"$loops pointer resolutions raced 4 flips without a dangle")
    // lost-pointer recovery: `_current` exists but pointer.json is gone
    // (a writer died inside its first setGeneration, or a filesystem
    // with no atomic replace crashed in the fallback window). Assuming
    // generation 0 would dangle — gen 0 was reclaimed at the 1→2 flip —
    // so resolve must land on the highest surviving generation.
    fs.delete(new org.apache.hadoop.fs.Path(idx + "_current/pointer.json"),
      false)
    assert(StoreGen.generation(idx, hconf) == 4L,
      "lost pointer must recover to the highest existing _g<N>")
    assert(StoreGen.resolve(idx, hconf) == idx + "_g4")
    assert(LshIndex.lshPairs(spark, idx).queryExecution.toRdd.count()
      == servedPairs, "serving must be intact after pointer recovery")
    graft.operators.CacheRegistry.release(spark)
    // the next flip rebuilds the pointer and moves on
    assert(StoreUpkeep.compactNewGeneration(spark, idx,
      StoreUpkeep.LshKind) == 5L)
    assert(StoreGen.generation(idx, hconf) == 5L)
  }

  test("generation-pointer compaction reclaims the retired generation's tombstone sidecar") {
    import graft.operators.{StoreGen, StoreUpkeep, Tombstones}
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("storegen-tomb")
      .toString
    val idx = base + "/lsh"
    LshIndex.write(docs.filter(col("doc_id") < 30), idx, nShards = 2)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val doomed = spark.read.parquet(idx + "_sigs")
      .select("doc_id").head().getLong(0)
    LshIndex.forget(spark, Seq(doomed).toDF("doc_id"), idx)
    assert(Tombstones.exists(idx), "tombstone lands at generation 0")
    // flip to gen 1: the tombstone is applied PHYSICALLY in the new
    // generation, but gen 0 (sidecar included) stays — it is the grace
    // window an in-flight gen-0 reader still filters through
    StoreUpkeep.compactNewGeneration(spark, idx, StoreUpkeep.LshKind)
    assert(fs.exists(new org.apache.hadoop.fs.Path(idx + "_tomb")),
      "grace generation keeps its tombstone sidecar")
    assert(!Tombstones.exists(idx + "_g1"),
      "new generation starts tombstone-free (forget applied physically)")
    // flip to gen 2: gen 0 is reclaimed — INCLUDING `_tomb`/`_tomb_meta`
    // (advisor r19: the suffix list omitted them and leaked one orphan
    // pair per post-forget compaction)
    StoreUpkeep.compactNewGeneration(spark, idx, StoreUpkeep.LshKind)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx + "_tomb")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(idx + "_tomb_meta")),
      "retired generation's tombstone sidecar must be reclaimed with it")
    assert(!spark.read.parquet(StoreGen.resolve(idx) + "_sigs")
      .filter(col("doc_id") === doomed).head(1).nonEmpty)
  }

  test("StoreUpkeep: trigger fires at the documented threshold, serving unchanged across the in-place swap") {
    val base = java.nio.file.Files.createTempDirectory("upkeep").toString
    val idx = base + "/lsh"
    val half = docs.filter(col("doc_id") % 4 === 0)
    LshIndex.write(half, idx, nShards = 2)
    // three appends: each drops ≥1 file per touched shard + 1 sigs file
    for (r <- 1 to 3)
      LshIndex.append(spark, docs.filter(col("doc_id") % 4 === r), idx)
    val h = StoreUpkeep.health(spark, idx, StoreUpkeep.LshKind)
    assert(h.maxPartitionFiles >= 4 && h.sidecarFiles >= 4 &&
      !h.pendingTombstones, s"unexpected health $h")
    // below threshold: decision is NO and nothing moves
    assert(!StoreUpkeep.maybeCompact(spark, idx, StoreUpkeep.LshKind,
      maxPartitionFiles = 100, maxSidecarFiles = 100))
    assert(StoreUpkeep.health(spark, idx, StoreUpkeep.LshKind) == h)
    val before = LshIndex.lshPairs(spark, idx)
      .collect().map(_.toSeq).toSet
    CacheRegistry.release(spark)
    // at the documented threshold (widest partition > maxPartitionFiles)
    // the trigger fires, the swap folds the layout, serving is unchanged
    assert(StoreUpkeep.maybeCompact(spark, idx, StoreUpkeep.LshKind,
      maxPartitionFiles = h.maxPartitionFiles - 1))
    val hc = StoreUpkeep.health(spark, idx, StoreUpkeep.LshKind)
    assert(hc.maxPartitionFiles == 1 && hc.sidecarFiles <= 4,
      s"compaction did not fold the layout: $hc")
    val after = LshIndex.lshPairs(spark, idx).collect().map(_.toSeq).toSet
    assert(after == before, "serving changed across the swap")
    CacheRegistry.release(spark)

    // sidecar-growth leg alone must also trip (bloom generations): span
    // store with a fused sidecar, appends add one generation each
    val span = base + "/span"
    SpanStore.write(half, span, minTokens = 8, shardChars = 1,
      withBloom = true)
    for (r <- 1 to 3)
      SpanStore.append(spark, docs.filter(col("doc_id") % 4 === r), span)
    val hs = StoreUpkeep.health(spark, span, StoreUpkeep.SpanKind)
    assert(hs.sidecarFiles >= 4, s"bloom generations not counted: $hs")
    val probeBefore = SpanStore.probe(spark, docs.filter(col("doc_id") < 6), span)
      .collect().map(_.toSeq).toSet
    CacheRegistry.release(spark)
    assert(StoreUpkeep.maybeCompact(spark, span, StoreUpkeep.SpanKind,
      maxPartitionFiles = 1000, maxSidecarFiles = hs.sidecarFiles - 1))
    val hsc = StoreUpkeep.health(spark, span, StoreUpkeep.SpanKind)
    assert(hsc.sidecarFiles <= 1, s"bloom sidecar not folded: $hsc")
    val probeAfter = SpanStore.probe(spark, docs.filter(col("doc_id") < 6), span)
      .collect().map(_.toSeq).toSet
    assert(probeAfter == probeBefore, "span serving changed across the swap")
    CacheRegistry.release(spark)

    // tombstone leg: pending takedown is reported, opts into an eager
    // trigger, and the swap both removes the rows and CLEARS the
    // sidecar (serving == cold build without the forgotten docs)
    SpanStore.forget(spark, docs.filter(col("doc_id") % 5 === 2)
      .select("doc_id"), span)
    val ht = StoreUpkeep.health(spark, span, StoreUpkeep.SpanKind)
    assert(ht.pendingTombstones)
    assert(!StoreUpkeep.maybeCompact(spark, span, StoreUpkeep.SpanKind),
      "tombstones alone must not trigger by default")
    assert(StoreUpkeep.maybeCompact(spark, span, StoreUpkeep.SpanKind,
      compactOnTombstones = true))
    assert(!StoreUpkeep.health(spark, span, StoreUpkeep.SpanKind)
      .pendingTombstones, "swap must clear the applied tombstones")
    val cold = base + "/spancold"
    SpanStore.write(docs.filter(col("doc_id") % 5 =!= 2), cold,
      minTokens = 8, shardChars = 1)
    val want = SpanStore.probe(spark, docs.filter(col("doc_id") < 6), cold)
      .collect().map(_.toSeq).toSet
    val got = SpanStore.probe(spark, docs.filter(col("doc_id") < 6), span)
      .collect().map(_.toSeq).toSet
    assert(got == want, "post-takedown serving != cold build without")
    CacheRegistry.release(spark)
  }
}
