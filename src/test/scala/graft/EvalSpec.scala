package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Eval

class EvalSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  /** Naive O(n²) reference: mean over all (pos, neg) pairs of
    * 1[s_p > s_n] + ½·1[s_p = s_n].
    */
  private def naiveAuc(rows: Seq[(Double, Boolean)]): Option[Double] = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    if (pos.isEmpty || neg.isEmpty) None
    else {
      val u = (for (p <- pos; n <- neg) yield
        if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      Some(u / (pos.size.toDouble * neg.size))
    }
  }

  private def round6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rocAuc matches the naive pairwise statistic, ties included") {
    // deterministic pseudo-random scores with deliberate tie mass
    val rows = (1 to 400).map { i =>
      val s = ((i * 2654435761L) % 23).toDouble // 23 distinct values
      (s, (i * 40503L) % 7 < 3)
    }
    val df = rows.toDF("score", "y")
    val got = Eval.rocAuc(df, "score", col("y")).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_pos") == rows.count(_._2))
    assert(r.getAs[Long]("n_neg") == rows.count(!_._2))
    assert(r.getAs[Double]("auc") == round6(naiveAuc(rows).get))
  }

  test("rocAuc: perfect separation = 1, reversed = 0, constant score = 0.5") {
    val perfect = (1 to 50).map(i => (i.toDouble, i > 25)).toDF("score", "y")
    assert(Eval.rocAuc(perfect, "score", col("y"))
      .head().getAs[Double]("auc") == 1.0)
    val reversed = (1 to 50).map(i => (i.toDouble, i <= 25)).toDF("score", "y")
    assert(Eval.rocAuc(reversed, "score", col("y"))
      .head().getAs[Double]("auc") == 0.0)
    val flat = (1 to 50).map(i => (7.0, i % 3 == 0)).toDF("score", "y")
    assert(Eval.rocAuc(flat, "score", col("y"))
      .head().getAs[Double]("auc") == 0.5)
  }

  test("grouped rocAuc = per-group naive; single-class group yields NULL") {
    val rows = (1 to 300).map { i =>
      val grp = s"g${i % 3}"
      val s = ((i * 1103515245L) % 31).toDouble
      // g2 is all-negative — the degenerate slice
      (grp, s, grp != "g2" && (i * 12345L) % 5 < 2)
    }
    val df = rows.toDF("grp", "score", "y")
    val got = Eval.rocAuc(df, "score", col("y"), Seq("grp"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val want = naiveAuc(rows.filter(_._1 == g).map(t => (t._2, t._3)))
      assert(got(g) == want.map(round6), s"group $g")
    }
    assert(got("g2").isEmpty)
  }

  test("rocAuc is repartitioning-invariant (two-level scan, integer sums)") {
    val rows = (1 to 500).map { i =>
      (((i * 48271L) % 97).toDouble, i % 4 == 0)
    }
    def run(parts: Int) =
      Eval.rocAuc(rows.toDF("score", "y").repartition(parts), "score", col("y"))
        .head().getAs[Double]("auc")
    val want = run(1)
    for (p <- Seq(3, 7, 32)) assert(run(p) == want, s"parts=$p")
  }

  test("rocAuc plans no single-partition window over the score histogram") {
    // parquet-backed so nothing constant-folds; the only unpartitioned
    // window allowed is the offsets prefix (partition-count-sized input)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = Eval.rocAuc(docs, "n_chars", col("lang") === "en")
    // sparkPlan, not the AQE-wrapped executedPlan — the wrapper hides
    // the stage children before execution (the ScaleCheck pruning-gate
    // lesson)
    val windows = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      // the offsets branch aggregates by __pid before its global window
      assert(w.child.toString.contains("__pid"),
        s"unpartitioned window over non-offset input:\n$w")
    }
  }

  test("quantScale bins: identity on already-quantized scores, trapezoid otherwise") {
    val rows = (1 to 300).map(i => (((i * 31L) % 13).toDouble, i % 3 == 0))
    val df = rows.toDF("score", "y")
    val exact = Eval.rocAuc(df, "score", col("y")).head().getDouble(2)
    // scores are integers: binning at scale 1 ranks floor(s) = s
    val binned = Eval.rocAuc(df, "score", col("y"), quantScale = Some(1.0))
      .head().getDouble(2)
    assert(binned == exact)
    // coarse binning merges distinct scores into ties — still a valid
    // AUC in [0,1], shifted toward 0.5 by the merged mass
    val coarse = Eval.rocAuc(df, "score", col("y"), quantScale = Some(0.1))
      .head().getDouble(2)
    assert(coarse >= 0.0 && coarse <= 1.0)
  }

  test("rocAuc rejects NaN scores loudly and skips null scores") {
    val bad = Seq((1.0, true), (Double.NaN, false)).toDF("score", "y")
    val e = intercept[Exception] {
      Eval.rocAuc(bad, "score", col("y")).collect()
    }
    assert(e.getMessage != null)
    val withNull = Seq[(java.lang.Double, Boolean)](
      (1.0, true), (null, false), (0.0, false)).toDF("score", "y")
    val r = Eval.rocAuc(withNull, "score", col("y")).head()
    assert(r.getAs[Long]("n_pos") == 1 && r.getAs[Long]("n_neg") == 1)
    assert(r.getAs[Double]("auc") == 1.0)
  }

  /** Naive AP reference at the tie-collapsed operating points. */
  private def naiveAp(rows: Seq[(Double, Boolean)]): Option[Double] = {
    val nPos = rows.count(_._2)
    if (nPos == 0) None
    else {
      val byScore = rows.groupBy(_._1).toSeq.sortBy(-_._1)
      var cp = 0L; var ca = 0L; var acc = 0.0
      for ((_, grp) <- byScore) {
        val p = grp.count(_._2)
        cp += p; ca += grp.size
        acc += p.toDouble * (cp.toDouble / ca)
      }
      Some(acc / nPos)
    }
  }

  test("averagePrecision matches the naive PR walk, ties included") {
    val rows = (1 to 400).map { i =>
      val s = ((i * 2654435761L) % 19).toDouble // heavy ties
      (s, (i * 40503L) % 11 < 3)                // ~27% positive
    }
    val r = Eval.averagePrecision(rows.toDF("score", "y"), "score",
      col("y")).head()
    assert(r.getAs[Long]("n_pos") == rows.count(_._2))
    assert(math.abs(r.getAs[Double]("avg_prec") - naiveAp(rows).get) <= 1e-6)
    // perfect ranking: AP = 1; all-negative group: NULL
    val perfect = (1 to 60).map(i => (i.toDouble, i > 40)).toDF("score", "y")
    assert(Eval.averagePrecision(perfect, "score", col("y"))
      .head().getAs[Double]("avg_prec") == 1.0)
    val allNeg = (1 to 20).map(i => (i.toDouble, false)).toDF("score", "y")
    assert(Eval.averagePrecision(allNeg, "score", col("y")).head().isNullAt(2))
  }

  test("grouped averagePrecision = per-group naive; repartitioning-invariant") {
    val rows = (1 to 300).map { i =>
      (s"g${i % 3}", ((i * 1103515245L) % 23).toDouble, (i * 12345L) % 4 == 0)
    }
    val df = rows.toDF("grp", "score", "y")
    val got = Eval.averagePrecision(df, "score", col("y"), Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val want = naiveAp(rows.filter(_._1 == g).map(t => (t._2, t._3))).get
      assert(math.abs(got(g) - want) <= 1e-6, s"group $g")
    }
    def run(parts: Int) =
      Eval.averagePrecision(df.repartition(parts), "score", col("y"),
        Seq("grp")).collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    for (p <- Seq(1, 7, 32)) assert(run(p) == got, s"parts=$p")
  }

  test("calibration: bin arithmetic, totals, and fixed-point mean") {
    val rows = (0 until 200).map { i =>
      val s = (i % 101) / 100.0 // includes s = 1.0 → clamped to bin 9
      (s, i % 3 == 0)
    }
    val got = Eval.calibration(rows.toDF("score", "y"), "score", col("y"),
      bins = 10).collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.values.map(_._1).sum == 200L)
    for ((bin, (n, nPos, frac, mean)) <- got) {
      val inBin = rows.filter { case (s, _) =>
        math.min(math.floor(s * 10), 9.0) == bin.toDouble }
      assert(inBin.size.toLong == n, s"bin $bin n")
      assert(inBin.count(_._2).toLong == nPos, s"bin $bin nPos")
      assert(frac == round6(nPos.toDouble / n), s"bin $bin frac")
      val s6 = inBin.map(t => math.floor(t._1 * 1e6 + 0.5).toLong).sum
      assert(mean == round6(s6.toDouble / (1e6 * n)), s"bin $bin mean")
    }
  }

  test("calibration and brier reject out-of-range scores loudly") {
    val bad = Seq((1.5, true)).toDF("score", "y")
    assert(intercept[Exception] {
      Eval.calibration(bad, "score", col("y")).collect()
    }.getMessage != null)
    assert(intercept[Exception] {
      Eval.brierScore(bad, "score", col("y")).collect()
    }.getMessage != null)
  }

  test("cohenKappa: perfect = 1, independent ≈ 0, constant raters = NULL") {
    // perfect agreement
    val same = (1 to 100).map(i => (s"c${i % 3}", s"c${i % 3}")).toDF("a", "b")
    val s = Eval.cohenKappa(same, "a", "b").head()
    assert(s.getAs[Double]("po") == 1.0 && s.getAs[Double]("kappa") == 1.0)
    // statistically independent raters: kappa near 0 even though raw
    // agreement is high (both say the majority label most of the time)
    val indep = (1 to 3000).map { i =>
      (if (i % 10 < 9) "keep" else "drop",        // rater A: 90% keep
       if ((i * 7) % 10 < 9) "keep" else "drop")  // rater B: independent 90%
    }.toDF("a", "b")
    val r = Eval.cohenKappa(indep, "a", "b").head()
    assert(r.getAs[Double]("po") > 0.7, "raw agreement must look high")
    assert(math.abs(r.getAs[Double]("kappa")) < 0.15,
      s"independent raters must score near 0, got ${r.getAs[Double]("kappa")}")
    // both raters constant: pe = 1, kappa undefined → NULL, not 0/0
    val const = (1 to 50).map(_ => ("keep", "keep")).toDF("a", "b")
    assert(Eval.cohenKappa(const, "a", "b").head().isNullAt(3))
    // naive replay on a mixed case, null-labeled rows excluded
    val rows = (1 to 200).map { i =>
      (if (i % 4 == 0) null else s"c${i % 3}", s"c${(i * 13) % 3}")
    }
    val mixed = rows.toDF("a", "b")
    val kept = rows.filter(_._1 != null)
    val n = kept.size.toDouble
    val po = kept.count(t => t._1 == t._2) / n
    val cats = (kept.map(_._1) ++ kept.map(_._2)).distinct
    val eSum = cats.map(c => kept.count(_._1 == c).toLong *
      kept.count(_._2 == c)).sum
    val pe = eSum.toDouble / (n * n)
    val got = Eval.cohenKappa(mixed, "a", "b").head()
    assert(got.getAs[Long]("n") == kept.size)
    assert(got.getAs[Double]("kappa") == round6((po - pe) / (1.0 - pe)))
  }

  test("brier matches the naive mean square on the 3dp grid; grouped twin agrees") {
    val rows = (1 to 250).map { i =>
      (s"g${i % 2}", (i % 97) / 96.0, (i * 7) % 5 < 2)
    }
    val df = rows.toDF("grp", "score", "y")
    def naive(sel: Seq[(String, Double, Boolean)]) = {
      val sq = sel.map { case (_, s, y) =>
        val d = math.floor(s * 1000 + 0.5) - (if (y) 1000 else 0)
        d * d
      }.sum
      round6(sq / (1e6 * sel.size))
    }
    val global = Eval.brierScore(df, "score", col("y")).head()
    assert(global.getAs[Long]("n") == 250)
    assert(global.getAs[Double]("brier") == naive(rows))
    val grouped = Eval.brierScore(df, "score", col("y"), Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    for (g <- Seq("g0", "g1"))
      assert(grouped(g) == naive(rows.filter(_._1 == g)), s"group $g")
  }
}
