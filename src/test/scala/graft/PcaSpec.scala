package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

class PcaSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic anisotropic corpus: dominant direction u (unit, dim
    * 8) with strong variance plus small off-axis wobble.
    */
  private val dim = 8
  private val u: Array[Double] = {
    val raw = Array.tabulate(dim)(i => math.sin(i + 1.0) + 0.3)
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }
  private def corpus(n: Int) = (0 until n).map { r =>
    val t = math.sin(r * 12.9898) * 2.0 // spread along u in ~[-2, 2]
    val e = Array.tabulate(dim) { i =>
      val wob = 0.05 * math.sin(r * 78.233 + i * 3.7)
      (t * u(i) + wob).toFloat
    }
    (r.toLong, e.toSeq)
  }.toDF("vec_id", "embedding")

  test("covarianceMatrix matches the naive double computation to the grid") {
    val df = corpus(300)
    val rows = df.collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val n = rows.length
    val mean = Array.tabulate(dim)(i => rows.map(_(i)).sum / n)
    val got = Pca.covarianceMatrix(df.repartition(5)).collect()
    assert(got.length == dim * (dim + 1) / 2)
    got.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val naive = rows.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
      // quantization to the 2^20 grid perturbs each factor by <= 2^-21
      assert(math.abs(r.getDouble(2) - naive) < 1e-5,
        s"cov($i,$j): got ${r.getDouble(2)} naive $naive")
    }
  }

  test("covariance and power results are partition-invariant") {
    val df = corpus(200)
    val a = Pca.covarianceMatrix(df.repartition(1)).orderBy("i", "j")
      .collect().toSeq
    val b = Pca.covarianceMatrix(df.repartition(13)).orderBy("i", "j")
      .collect().toSeq
    assert(a == b)
    val pa = Pca.dominantComponent(df.repartition(2)).orderBy("pos")
      .collect().toSeq
    val pb = Pca.dominantComponent(df.repartition(11)).orderBy("pos")
      .collect().toSeq
    assert(pa == pb)
  }

  test("dominantComponent recovers the planted direction") {
    val got = Pca.dominantComponent(corpus(500)).orderBy("pos").collect()
    val v = got.map(_.getDouble(1))
    val cos = v.zip(u).map { case (a, b) => a * b }.sum /
      math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(cos) > 0.995, s"|cos(pc1, planted)| = ${math.abs(cos)}")
    // eigenvalue ~ variance along u: spread t = 2 sin(...) has var ~2.0
    val lam = got.head.getDouble(2)
    assert(lam > 1.5 && lam < 2.5, s"eigval $lam")
    // the planted axis dominates: tiny off-axis wobble -> pc1 carries
    // nearly all the variance
    val ve = got.head.getDouble(3)
    assert(ve > 0.9 && ve <= 1.0, s"var_explained $ve")
    // unit norm on the quantized grid
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-6)
  }

  test("topComponents: deflation finds the second planted axis, orthogonal") {
    // two orthonormal planted axes with variances ~2.0 and ~0.5
    val w0 = Array.tabulate(dim)(i => math.cos(i * 2.3) - 0.1)
    val proj = w0.zip(u).map { case (a, b) => a * b }.sum
    val wRaw = w0.zip(u).map { case (a, b) => a - proj * b }
    val wN = math.sqrt(wRaw.map(x => x * x).sum)
    val w = wRaw.map(_ / wN)
    val df = (0 until 600).map { r =>
      val t1 = math.sin(r * 12.9898) * 2.0
      val t2 = math.sin(r * 3.333) * 1.0
      (r.toLong, Array.tabulate(dim)(i => (t1 * u(i) + t2 * w(i)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val got = Pca.topComponents(df, r = 2).collect()
      .groupBy(_.getInt(0)).view.mapValues(_.sortBy(_.getInt(1))).toMap
    val v1 = got(1).map(_.getDouble(2))
    val v2 = got(2).map(_.getDouble(2))
    def absCos(a: Array[Double], b: Array[Double]) =
      math.abs(a.zip(b).map { case (x, y) => x * y }.sum) /
        math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    assert(absCos(v1, u.toArray) > 0.99, s"pc1 vs planted u: ${absCos(v1, u.toArray)}")
    assert(absCos(v2, w) > 0.99, s"pc2 vs planted w: ${absCos(v2, w)}")
    assert(absCos(v1, v2) < 0.02, s"pc1/pc2 must be near-orthogonal")
    val (e1, e2) = (got(1).head.getDouble(3), got(2).head.getDouble(3))
    assert(e1 > e2 && e2 > 0, s"eigvals ordered: $e1 $e2")
    val (s1, s2) = (got(1).head.getDouble(4), got(2).head.getDouble(4))
    assert(s1 > s2 && s1 + s2 <= 1.0 + 1e-6, s"shares: $s1 $s2")
  }

  test("pc1Scores equals the manual projection") {
    val df = corpus(50)
    val comp = Pca.dominantComponent(df).orderBy("pos").collect()
      .map(_.getDouble(1))
    val scores = Pca.pc1Scores(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    df.collect().foreach { r =>
      val manual = r.getSeq[Float](1).zip(comp)
        .map { case (x, c) => x.toDouble * c }.sum
      // both sides quantize (components 2^-20, eigenvector 10^-12);
      // the score is 6dp-rounded
      assert(math.abs(scores(r.getLong(0)) - manual) < 2e-5)
    }
  }

  test("isotropy matches the O(n²) mean pairwise cosine; zero norms excluded") {
    val df = corpus(120)
    val got = Pca.isotropy(df).head()
    val vs = df.collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val naive = (for (i <- vs.indices; j <- vs.indices if i != j)
      yield cos(vs(i), vs(j))).sum / (vs.length * (vs.length - 1))
    assert(got.getAs[Long]("n_vectors") == 120L)
    assert(got.getAs[Long]("n_zero_norm") == 0L)
    assert(math.abs(got.getAs[Double]("mean_pairwise_cos") - naive) < 1e-4,
      s"got ${got.getAs[Double]("mean_pairwise_cos")} naive $naive")
    // a zero vector is excluded and counted, not divided by
    val withZero = df.unionByName(
      Seq((999L, Seq.fill(dim)(0.0f))).toDF("vec_id", "embedding"))
    val z = Pca.isotropy(withZero).head()
    assert(z.getAs[Long]("n_vectors") == 120L &&
      z.getAs[Long]("n_zero_norm") == 1L)
  }

  test("labelCohesion matches the O(n²) within/cross means") {
    val rows = (0 until 90).map { r =>
      val lab = r % 3
      // three displaced clusters so within > cross
      val e = Array.tabulate(dim)(i =>
        (math.sin(i + lab * 2.1) + 0.05 * math.sin(r * 7.7 + i)).toFloat)
      (r.toLong, lab, e.toSeq)
    }
    val got = graft.operators.Pca.labelCohesion(
        rows.toDF("vec_id", "label", "embedding").repartition(5))
      .orderBy("label").collect()
    val unit = rows.map { case (_, l, e) =>
      val v = e.map(_.toDouble).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      (l, v.map(_ / n))
    }
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (lab <- 0 until 3) {
      val in = unit.filter(_._1 == lab).map(_._2)
      val out = unit.filter(_._1 != lab).map(_._2)
      val within = (for (i <- in.indices; j <- in.indices if i != j)
        yield dot(in(i), in(j))).sum / (in.size * (in.size - 1))
      val cross = (for (a <- in; b <- out) yield dot(a, b)).sum /
        (in.size * out.size)
      val r = got(lab)
      assert(r.getAs[Long]("n") == 30L)
      assert(math.abs(r.getAs[Double]("mean_within_cos") - within) < 1e-4)
      assert(math.abs(r.getAs[Double]("mean_cross_cos") - cross) < 1e-4)
      assert(r.getAs[Double]("mean_within_cos") >
        r.getAs[Double]("mean_cross_cos"))
    }
  }

  test("ragged embeddings are rejected loudly") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pca.covarianceMatrix(df).collect()
    }
    assert(e.getMessage.contains("ragged"))
  }
}
