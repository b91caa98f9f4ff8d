package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pii, Sampling, Sketches, Stats}

/** Round-15 selection/audit operators: exact KS drift, Pareto-frontier
  * curation, distinct-count heavy hitters, l-diversity, split leakage.
  */
class SelectionSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def round6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Naive KS: max over distinct pooled values of |F_a − F_b| by integer
    * cross products, smallest attaining value.
    */
  private def naiveKs(a: Seq[Double], b: Seq[Double]): (Long, BigInt, Double, Long) = {
    val na = a.size.toLong; val nb = b.size.toLong
    val vs = (a ++ b).distinct.sorted
    var best = BigInt(-1); var at = Double.NaN
    for (v <- vs) {
      val ca = BigInt(a.count(_ <= v)) * nb
      val cb = BigInt(b.count(_ <= v)) * na
      val d = (ca - cb).abs
      if (d > best) { best = d; at = v }
    }
    (na, best, at, nb)
  }

  test("ksDrift matches the naive statistic, ties and duplicates included") {
    // two deliberately different discrete distributions with tie mass
    val a = (1 to 300).map(i => ((i * 2654435761L) % 17).toDouble)
    val b = (1 to 200).map(i => ((i * 40503L) % 23).toDouble)
    val (na, dnum, at, nb) = naiveKs(a, b)
    val got = Stats.ksDrift(a.toDF("v"), b.toDF("v"), "v").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_a") == na)
    assert(r.getAs[Long]("n_b") == nb)
    assert(r.getAs[Double]("d_num") == dnum.toDouble)
    assert(r.getAs[Double]("at_value") == at)
    assert(r.getAs[Double]("d_stat") ==
      round6(dnum.toDouble / (na.toDouble * nb.toDouble)))
  }

  test("ksDrift: identical samples give D = 0; result is partition-invariant") {
    val xs = (1 to 500).map(i => ((i * 7919L) % 41).toDouble)
    val a = xs.toDF("v"); val b = xs.toDF("v")
    val r = Stats.ksDrift(a.repartition(7), b.repartition(3), "v").head()
    assert(r.getAs[Double]("d_num") == 0.0)
    assert(r.getAs[Double]("d_stat") == 0.0)
    // repartitioning must not change anything (two-level scan contract)
    val r2 = Stats.ksDrift(a.repartition(1), b.repartition(13), "v").head()
    assert(r.toSeq == r2.toSeq)
  }

  test("ksDrift rejects NaN values loudly") {
    val a = Seq(1.0, Double.NaN).toDF("v")
    val b = Seq(2.0).toDF("v")
    val e = intercept[Exception] { Stats.ksDrift(a, b, "v").collect() }
    assert(e.getMessage.contains("NaN") ||
      e.getCause != null && e.getCause.getMessage.contains("NaN"))
  }

  /** Naive O(n²) skyline. */
  private def naiveFrontier(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filter { p =>
      !pts.exists(q => q._2 >= p._2 && q._3 >= p._3 &&
        (q._2 > p._2 || q._3 > p._3))
    }.map(_._1).toSet

  test("paretoFrontier matches the O(n²) dominance check, duplicates kept") {
    val pts = (1L to 400L).map { i =>
      (i, (i * 2654435761L) % 29, (i * 40503L) % 31)
    } ++ Seq((401L, 28L, 30L), (402L, 28L, 30L)) // duplicate frontier point
    val want = naiveFrontier(pts)
    val df = pts.toDF("id", "x", "y").repartition(5)
    val got = Sampling.paretoFrontier(df, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == want)
    // frontier must be an antichain: no member dominates another
    val front = pts.filter(p => got(p._1))
    assert(naiveFrontier(front) == want)
  }

  test("paretoFrontierBy: per-group skyline equals the per-group naive check") {
    val pts = (1L to 300L).map { i =>
      (i, s"g${i % 3}", (i * 2654435761L) % 23, (i * 40503L) % 29)
    }
    val byGroup = pts.groupBy(_._2)
    val want = byGroup.flatMap { case (_, gs) =>
      naiveFrontier(gs.map(p => (p._1, p._3, p._4)))
    }.toSet
    val got = graft.operators.Sampling.paretoFrontierBy(
        pts.toDF("id", "g", "x", "y").repartition(7), "x", "y", Seq("g"))
      .select("id").as[Long].collect().toSet
    assert(got == want)
  }

  test("paretoFrontier: strictly increasing staircase keeps everything") {
    val pts = (1L to 50L).map(i => (i, i, 100L - i))
    val got = Sampling.paretoFrontier(pts.toDF("id", "x", "y"), "x", "y")
      .count()
    assert(got == 50L)
  }

  test("superSpreaders finds planted distinct-count spreaders exactly") {
    // 60 background keys with ~8 distinct values each; two planted
    // spreaders with 500 and 300 distinct values
    val bg = for (k <- 1 to 60; v <- 1 to 8) yield (k.toLong, s"v${k}_$v")
    val hot = (1 to 500).map(v => (99L, s"h$v")) ++
      (1 to 300).map(v => (98L, s"g$v"))
    val df = (bg ++ hot).toDF("key", "value").repartition(6)
    val got = Sketches.superSpreaders(df, "key", "value", k = 2,
      candidates = 8).collect()
    assert(got.map(r => (r.getAs[Int]("rank"), r.getAs[Long]("key"),
      r.getAs[Long]("n_distinct"))).toSeq ==
      Seq((1, 99L, 500L), (2, 98L, 300L)))
  }

  test("superSpreaders fails loudly when the margin cannot certify the cut") {
    // 50 keys, all with the same 20 distinct values — no certified cut
    // exists below full coverage
    val rows = for (k <- 1 to 50; v <- 1 to 20) yield (k.toLong, v.toLong)
    val df = rows.toDF("key", "value")
    val e = intercept[Exception] {
      Sketches.superSpreaders(df, "key", "value", k = 2, candidates = 4)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("uncertified")))
  }

  test("plan shapes: KS/pareto scan discipline, broadcast frontier join, gram partial agg") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // parquet-backed so nothing constant-folds
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ks = Stats.ksDrift(li.filter(col("l_orderkey") % 2 === 0),
      li.filter(col("l_orderkey") % 2 === 1), "l_extendedprice")
    ks.queryExecution.sparkPlan.collect { case w: WindowExec => w }
      .filter(_.partitionSpec.isEmpty).foreach { w =>
        // the only global window allowed is the offsets prefix over the
        // partition-count-sized __pid aggregate (the rocAuc contract)
        assert(w.child.toString.contains("__pid"),
          s"unpartitioned window over non-offset input:\n$w")
      }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val par = Sampling.paretoFrontier(
      docs.select(col("doc_id"), col("n_chars"),
        length(col("text")).cast("long").as("y")), "n_chars", "y")
    val plan = par.queryExecution.sparkPlan
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "frontier join-back must broadcast the answer-sized frontier table")
    plan.collect { case w: WindowExec => w }
      .filter(_.partitionSpec.isEmpty).foreach { w =>
        assert(w.child.toString.contains("__pid"),
          s"unpartitioned window over non-offset input:\n$w")
      }
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val gram = graft.operators.Pca.gramSums(emb)
    val gplan = gram.queryExecution.sparkPlan
    assert(gplan.toString.contains("partial_sum"),
      "gram cells must map-side combine before the shuffle")
    assert(gplan.collect { case w: WindowExec => w }.isEmpty &&
      gplan.collect { case s: SortExec => s }.isEmpty,
      "gram pass must be pure hash aggregation — no windows, no sorts")
  }

  test("tCloseness equals the naive per-class TVD, absent values included") {
    // classes A (pure x), B (spread), C (no x at all) over N = 10 rows;
    // every fraction is a finite decimal so 9dp quantization is exact
    val rows = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "y"), ("B", "z"), ("B", "z"),
      ("C", "y"), ("C", "z"))
    val df = rows.toDF("lang", "source")
    val byCv = rows.groupBy(identity).view.mapValues(_.size).toMap
    val byC = rows.groupBy(_._1).view.mapValues(_.size).toMap
    val byV = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val n = rows.size.toDouble
    def naive(cls: String): Double = {
      val tvd = byV.keys.map { v =>
        val pc = byCv.getOrElse((cls, v), 0).toDouble / byC(cls)
        math.abs(pc - byV(v) / n)
      }.sum / 2.0
      math.round(tvd * 1e6) / 1e6
    }
    val got = operators.Pii.tCloseness(df.repartition(7), Seq("lang"),
        "source", t = 0.3)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    Seq("A", "B", "C").foreach { cls =>
      assert(got(cls)._1 == naive(cls), s"$cls: ${got(cls)} vs ${naive(cls)}")
      assert(got(cls)._2 == (naive(cls) > 0.3), s"violates flag for $cls")
    }
    // the pure class must violate a tight t; a class mirroring the
    // global distribution exactly reports 0
    assert(got("A")._2, "pure-value class must trip the audit")
    val mirror = Seq(("M", "x"), ("M", "y"), ("G", "x"), ("G", "y"))
      .toDF("lang", "source")
    val m = operators.Pii.tCloseness(mirror, Seq("lang"), "source", 0.1)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m("M") == 0.0 && m("G") == 0.0, m.toString)
  }

  test("anovaF matches the naive two-pass computation; degenerates to NULL") {
    val rows = (1 to 300).map { i =>
      val g = s"g${i % 4}"
      (g, ((i * 2654435761L) % 97).toDouble / 4.0 + (i % 4) * 5.0)
    }
    val got = Stats.anovaF(rows.toDF("g", "x").repartition(7), "x", "g").head()
    // naive on the 4dp grid the operator quantizes inputs to
    val q = rows.map { case (g, x) => (g, math.rint(x * 1e4) / 1e4) }
    val n = q.size; val k = q.map(_._1).distinct.size
    val grand = q.map(_._2).sum / n
    val ssb = q.groupBy(_._1).values.map { vs =>
      val m = vs.map(_._2).sum / vs.size
      vs.size * (m - grand) * (m - grand)
    }.sum
    val ssw = q.groupBy(_._1).values.flatMap { vs =>
      val m = vs.map(_._2).sum / vs.size
      vs.map(v => (v._2 - m) * (v._2 - m))
    }.sum
    assert(got.getAs[Long]("n") == n && got.getAs[Long]("k") == k)
    // the operator's 6dp-quantized terms agree with naive to ~1e-4
    assert(math.abs(got.getAs[Double]("ss_between") - ssb) < 1e-3)
    assert(math.abs(got.getAs[Double]("ss_within") - ssw) < 1e-3)
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(got.getAs[Double]("f_stat") - f) < 1e-4 * f)
    // partition invariance
    val got2 = Stats.anovaF(rows.toDF("g", "x").repartition(1), "x", "g").head()
    assert(got.toSeq == got2.toSeq)
    // single group -> NULL F
    val deg = Stats.anovaF(Seq(("a", 1.0), ("a", 2.0)).toDF("g", "x"), "x", "g").head()
    assert(deg.isNullAt(deg.fieldIndex("f_stat")))
  }

  test("waterfillBudget: whole tail, capped head, budget spent exactly") {
    val rows = Seq.fill(10)("a") ++ Seq.fill(40)("b") ++
      Seq.fill(100)("c") ++ Seq.fill(103)("d")
    val df = rows.zipWithIndex.map { case (g, i) => (i.toLong, g) }
      .toDF("id", "stratum").repartition(5)
    val got = Sampling.waterfillBudget(df, "stratum", budget = 120)
      .orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("allocation"), r.getAs[Boolean]("capped")))
    // level: a(10) whole; b(40)? (120-10)/3 = 36.7 < 40 -> capped from b
    // rest 110 over 3 strata: base 36 rem 2 -> b,c get 37, d gets 36
    assert(got.toSeq == Seq(("a", 10L, 10L, false), ("b", 40L, 37L, true),
      ("c", 100L, 37L, true), ("d", 103L, 36L, true)))
    assert(got.map(_._3).sum == 120L)
    // budget >= total: everyone whole, nothing capped
    val whole = Sampling.waterfillBudget(df, "stratum", budget = 1000)
      .collect()
    assert(whole.forall(r => r.getAs[Long]("allocation") ==
      r.getAs[Long]("n_docs") && !r.getAs[Boolean]("capped")))
  }

  test("lDiversity flags homogeneous classes") {
    val df = Seq(
      ("a", 1, "x"), ("a", 1, "x"), ("a", 1, "x"), // homogeneous
      ("b", 2, "x"), ("b", 2, "y"), ("b", 2, "z")  // diverse
    ).toDF("q1", "q2", "s")
    val got = Pii.lDiversity(df, Seq("q1", "q2"), "s", l = 2)
      .orderBy("q1").collect()
    assert(got.map(r => (r.getString(0), r.getAs[Long]("n"),
      r.getAs[Long]("n_sensitive"), r.getAs[Boolean]("violates"))).toSeq ==
      Seq(("a", 3L, 1L, true), ("b", 3L, 3L, false)))
  }

  test("curriculumOrder: contiguous stage-major rank, shuffled within stage") {
    val df = (1L to 500L).map(i => (i, i % 7)).toDF("doc_id", "stage")
      .repartition(9)
    val got = Sampling.curriculumOrder(df, "stage", seed = 11L)
      .select("doc_id", "stage", "shuffle_key", "curriculum_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    // contiguous 0..n-1
    assert(got.map(_._4).sorted.toSeq == (0L until 500L))
    // stage-major: sort by rank -> stages non-decreasing
    val byRank = got.sortBy(_._4)
    assert(byRank.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    // within a stage, rank order == (key, id) order
    byRank.groupBy(_._2).values.foreach { st =>
      val inRank = st.sortBy(_._4).map(r => (r._3, r._1)).toSeq
      assert(inRank == inRank.sorted)
    }
    // partition invariance
    val again = Sampling.curriculumOrder(df.repartition(2), "stage", seed = 11L)
      .select("doc_id", "curriculum_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.forall(r => again(r._1) == r._4))
  }

  test("mrrAtK: hand-built rankings, misses count as zero") {
    import graft.operators.Eval
    // q1: truth at rank 2 -> rr 0.5; q2: truth at rank 1 -> rr 1.0;
    // q3: truth absent -> 0; q4: truth at rank 7 > k -> 0
    val system = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 21L, 2),
      (3L, 30L, 1), (4L, 40L, 7)
    ).toDF("query_id", "vec_id", "rank")
    val truth = Seq((1L, 11L), (2L, 20L), (3L, 99L), (4L, 40L))
      .toDF("query_id", "vec_id")
    val r = Eval.mrrAtK(system, truth, k = 5).head()
    assert(r.getAs[Long]("n_queries") == 4L)
    assert(r.getAs[Long]("hits") == 2L)
    assert(r.getAs[Double]("hit_rate") == 0.5)
    assert(r.getAs[Double]("mrr") == 0.375) // (0.5 + 1.0 + 0 + 0) / 4
  }

  test("splitLeakage reports multi-doc clusters straddling splits") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L))
      .toDF("doc_id", "canonical_id")
    val splits = Seq((1L, "train"), (2L, "test"), (3L, "train"),
      (4L, "train"), (5L, "val")).toDF("doc_id", "split")
    val got = Sampling.splitLeakage(labels, splits)
      .orderBy("canonical_id").collect()
    assert(got.map(r => (r.getAs[Long]("canonical_id"),
      r.getAs[Long]("cluster_size"), r.getAs[Long]("n_splits"),
      r.getAs[Boolean]("leaks"))).toSeq ==
      Seq((1L, 2L, 2L, true), (3L, 2L, 1L, false)))
    // the cluster-keyed split leaks nothing by construction
    val fixed = Sampling.deterministicSplit(labels, "canonical_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split")
    assert(Sampling.splitLeakage(labels, fixed)
      .filter(col("leaks")).count() == 0L)
  }

  test("leakageSafeSplit: one pass leaves zero cross-split pairs and dup-free eval sets") {
    // enough docs that the md5 split populates every band, plus a
    // random-ish pair set including chains that defeat the narrower
    // "move only cross-split endpoints" rule
    val docs = (0L until 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = (0L until 130L).map(i => (i, i + 137L))
      .filter { case (a, b) => a < b }
      .toDF("doc_id_a", "doc_id_b")
    val out = Sampling.leakageSafeSplit(docs, pairs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val byId = out.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("split_raw"), r.getAs[String]("split"),
        r.getAs[Boolean]("moved"))).toMap
    // closure: no pair straddles final splits, and no paired doc
    // remains in an eval set
    pairs.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(byId(a)._2 == "train" && byId(b)._2 == "train",
        s"pair ($a,$b) endpoints must both end in train: ${byId(a)} ${byId(b)}")
    }
    // unpaired docs never move
    val paired = pairs.collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    byId.foreach { case (id, (raw, fin, moved)) =>
      if (!paired.contains(id)) assert(raw == fin && !moved, s"$id moved unpaired")
      else if (raw == "train") assert(fin == "train" && !moved)
    }
    // the raw split itself had leaks for this pair set (the test bites)
    assert(out.filter(col("moved")).count() > 0L)
  }
}
