package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over the embedding corpus — covariance, dominant
  * principal component, and per-vector projection — under the engine's
  * exactness discipline: every corpus-sized reduction accumulates
  * INTEGERS (the [[Similarity.trainCodebook]] 2^20 fixed-point
  * convention), and the handful of scalar double ops at the end are
  * pinned single IEEE operations that any engine replays bit-for-bit
  * (the DuckDB oracle runs the identical arithmetic, power iteration
  * included, as a recursive CTE).
  *
  * Scale shape:
  *   - moments/Gram are ONE corpus pass each: a chained generator
  *     (posexplode → slice-explode) streams the d(d+1)/2 component
  *     pairs of each vector straight into a hash aggregate of at most
  *     d² cells per task — map-side combine means the shuffle carries
  *     partitions × d² rows, never corpus rows, and nothing
  *     materializes the exploded pairs (same wire/memory as a custom
  *     Gram aggregate, with zero custom code);
  *   - the covariance matrix is ANSWER-sized (d² ≤ a few thousand for
  *     model-dim d), so the power iteration runs driver-side on the
  *     collected matrix — bounded like the Misra–Gries candidate
  *     collect, independent of corpus size;
  *   - projections are one broadcast join + one grouped integer sum.
  *
  * Why fixed iterations: a convergence-tested solver is a moving
  * target no oracle can replay; 8 power rounds from e₀ is a SPEC —
  * deterministic in any engine — and the ScaleCheck gate separately
  * asserts the spec's QUALITY (Rayleigh residual, axis dominance).
  */
object Pca {

  /** Component quantization (the house 2^20 grid). */
  val Q: Long = 1L << 20
  /** Eigenvector quantization: unit components on a 10^-12 grid. */
  val VQ: Long = 1000000000000L
  /** Covariance quantization: 9dp (10^9) — covariances of unit-scale
    * embeddings live in [-1, 1], so 9dp keeps ~8 significant digits.
    */
  val CQ: Double = 1e9
  /** Working-sum downshift 2^40 between matrix-apply and normalize:
    * keeps norm² inside 128-bit integers whatever the corpus count.
    */
  val WSHIFT: Int = 40

  /** (vec_id, pos, q) — quantized components, one generator pass. */
  private def quantized(embeddings: DataFrame): DataFrame =
    embeddings.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"),
        floor(col("x").cast("double") * Q + 0.5).cast("long").as("q"))

  /** Loud dimension contract: every vector must have the same length
    * (a ragged corpus would silently drop Gram cells). Returns d.
    */
  private def checkedDim(embeddings: DataFrame): Int = {
    val r = embeddings.filter(col("embedding").isNotNull)
      .agg(min(size(col("embedding"))).as("mn"),
        max(size(col("embedding"))).as("mx")).head()
    require(!r.isNullAt(0) && r.getInt(0) == r.getInt(1) && r.getInt(0) > 0,
      s"pca: ragged or empty embedding column (len ${r.get(0)}..${r.get(1)})")
    r.getInt(0)
  }

  /** Upper-triangle second-moment sums: (i, j, s_qq) with i ≤ j,
    * s_qq = Σ_vec q_i·q_j as decimal(38,0) — exact at any corpus size.
    * No self-join: the pair stream comes from chaining a posexplode
    * with a slice-explode of the SAME row, so tasks stream pairs into
    * the ≤ d² hash-agg cells without shuffling anything corpus-sized.
    */
  def gramSums(embeddings: DataFrame): DataFrame =
    embeddings.filter(col("embedding").isNotNull)
      .select(posexplode(col("embedding")).as(Seq("i", "xi")),
        col("embedding"))
      .select(col("i"),
        floor(col("xi").cast("double") * Q + 0.5).cast("long").as("qi"),
        slice(col("embedding"), col("i") + 1,
          size(col("embedding")) - col("i")).as("rest"))
      .select(col("i"), col("qi"),
        posexplode(col("rest")).as(Seq("dj", "xj")))
      .select(col("i"), (col("i") + col("dj")).as("j"),
        (col("qi") * floor(col("xj").cast("double") * Q + 0.5).cast("long"))
          .cast("decimal(38,0)").as("qq"))
      .groupBy("i", "j").agg(sum(col("qq")).as("s_qq"))

  /** First moments: (pos, s_q, n) — Σ q and the vector count. Terms
    * cast to decimal BEFORE the sum (the gramSums discipline): a long
    * accumulator wraps past ~2^43 unit-scale rows.
    */
  def momentSums(embeddings: DataFrame): DataFrame =
    quantized(embeddings).groupBy("pos")
      .agg(sum(col("q").cast("decimal(38,0)")).as("s_q"),
        count(lit(1)).as("n"))

  /** The d×d covariance (upper triangle): cov_ij = (n·Σq_iq_j −
    * Σq_i·Σq_j) / (n²Q²), numerator exact decimal(38,0), ONE double
    * division rounded to 9dp. The biased (1/n) estimator — the
    * convention that keeps the formula a pure moment expression.
    * Output: (i, j, cov) with i ≤ j, ordered by the caller.
    */
  def covarianceMatrix(embeddings: DataFrame): DataFrame = {
    checkedDim(embeddings)
    covarianceUnchecked(embeddings)
  }

  /** [[covarianceMatrix]] body without the dimension-contract scan —
    * for callers that already ran [[checkedDim]] ([[covqCells]]), so
    * one PCA entry point costs one contract scan, not two.
    */
  private def covarianceUnchecked(embeddings: DataFrame): DataFrame = {
    val m = momentSums(embeddings)
    gramSums(embeddings)
      .join(m.select(col("pos").as("i"), col("s_q").as("__si"),
        col("n").as("__n")), "i")
      .join(m.select(col("pos").as("j"), col("s_q").as("__sj")), "j")
      .select(col("i"), col("j"),
        round((col("__n").cast("decimal(38,0)") * col("s_qq")
            - col("__si") * col("__sj")).cast("double")
          / (col("__n").cast("double") * col("__n") * Q * Q), 9).as("cov"))
  }

  /** HALF_UP to `p` decimal places — the Spark/DuckDB round(). */
  private def rnd(x: Double, p: Int): Double =
    BigDecimal(x).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Collect the quantized covariance to the driver (answer-sized: d²
    * cells) and run `iters` power rounds from e₀ in exact integer
    * arithmetic — the same spec the oracle's recursive CTE replays:
    *
    *   w   = covq · v                      (exact 128-bit-safe ints)
    *   wq  = w / 2^40 toward zero          (keeps Σwq² in 128 bits)
    *   v'  = floor(wq·10¹² / √(Σwq²) + .5) (two pinned double ops)
    *
    * Returns (v on the 10^-12 grid, the RAW Rayleigh quotient vᵀCv/vᵀv
    * in covq units — callers un-quantize/round). Fails loudly if the
    * iterate vanishes (covariance numerically zero or e₀ exactly
    * orthogonal to the dominant space — reseed upstream).
    */
  private[graft] def powerIterate(
      covq: Map[(Int, Int), Long], d: Int, iters: Int): (Array[Long], Double) = {
    require(d > 0 && iters > 0)
    def c(i: Int, j: Int): Long =
      if (i <= j) covq.getOrElse((i, j), 0L) else covq.getOrElse((j, i), 0L)
    var v = Array.tabulate(d)(i => if (i == 0) BigInt(VQ) else BigInt(0))
    val shift = BigInt(1) << WSHIFT
    for (_ <- 0 until iters) {
      val w = Array.tabulate(d)(i =>
        (0 until d).foldLeft(BigInt(0))((a, j) => a + BigInt(c(i, j)) * v(j)))
      val wq = w.map(x => if (x.signum < 0) -((-x) / shift) else x / shift)
      val norm = math.sqrt(wq.foldLeft(BigInt(0))((a, x) => a + x * x).toDouble)
      require(norm > 0.0,
        "pca: power iterate vanished — covariance is numerically zero " +
          "on this grid or e0 is orthogonal to the dominant space")
      v = wq.map(x => BigInt(math.floor((x * BigInt(VQ)).toDouble / norm + 0.5).toLong))
    }
    val num = (0 until d).foldLeft(BigInt(0))((a, i) =>
      a + (0 until d).foldLeft(BigInt(0))((b, j) => b + BigInt(c(i, j)) * v(j)) * v(i))
    val den = v.foldLeft(BigInt(0))((a, x) => a + x * x)
    (v.map(_.toLong), num.toDouble / den.toDouble)
  }

  /** Quantized covariance cells for the driver loop: covq =
    * floor(cov·10⁹ + 0.5) over the [[covarianceMatrix]] output.
    */
  private def covqCells(embeddings: DataFrame): (Map[(Int, Int), Long], Int) = {
    val d = checkedDim(embeddings)
    val cells = covarianceUnchecked(embeddings)
      .select(col("i"), col("j"),
        floor(col("cov") * CQ + 0.5).cast("long").as("cq"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    (cells, d)
  }

  /** Dominant principal component: (pos, pc1, eigval, var_explained) —
    * the unit eigenvector on the 10^-12 grid (reported 9dp), its
    * Rayleigh eigenvalue in covariance units, and the explained-
    * variance share λ / trace(C) (trace summed EXACTLY in covq
    * integers), identical on every engine that replays the
    * fixed-iteration spec.
    */
  def dominantComponent(embeddings: DataFrame, iters: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (cells, d) = covqCells(embeddings)
    val (v, rayRaw) = powerIterate(cells, d, iters)
    val trace = (0 until d).foldLeft(BigInt(0))((a, i) =>
      a + BigInt(cells.getOrElse((i, i), 0L)))
    val lam = rnd(rayRaw / CQ, 9)
    val ve = rnd(rayRaw / trace.toDouble, 6)
    v.zipWithIndex
      .map { case (x, i) => (i, rnd(x.toDouble / VQ, 9), lam, ve) }.toSeq
      .toDF("pos", "pc1", "eigval", "var_explained")
  }

  /** Hotelling deflation on the quantized grid: C' = C − λ·vvᵀ with
    * every cell one pinned double expression — floor(λ_raw ·
    * (v_i·v_j as double) / 1e24 + 0.5) — so the deflated matrix (and
    * therefore every later component) replays bit-for-bit in the
    * oracle. v_i·v_j multiplies EXACTLY as integers first; only the
    * final product meets doubles.
    */
  private def deflate(cells: Map[(Int, Int), Long], d: Int,
      v: Array[Long], rayRaw: Double): Map[(Int, Int), Long] =
    (for (i <- 0 until d; j <- i until d) yield {
      val vij = (BigInt(v(i)) * BigInt(v(j))).toDouble
      (i, j) -> (cells.getOrElse((i, j), 0L)
        - math.floor(rayRaw * vij / 1e24 + 0.5).toLong)
    }).toMap

  /** Top-r principal components by repeated power iteration +
    * [[deflate]]: long-format (component, pos, loading, eigval,
    * var_explained), component 1-based, var_explained always against
    * the ORIGINAL trace (the standard convention, so the shares of
    * successive components add up). Each component costs d² driver
    * flops — corpus touched exactly once, by the covariance pass.
    * Near-equal eigenvalues make the later components spec-stable but
    * statistically arbitrary (any basis of the eigenspace is correct);
    * the fixed-iteration spec still replays deterministically.
    */
  def topComponents(embeddings: DataFrame, r: Int = 2,
      iters: Int = 8): DataFrame = {
    require(r >= 1, s"need r >= 1, got $r")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (cells0, d) = covqCells(embeddings)
    require(r <= d, s"r=$r exceeds dimension $d")
    val trace = (0 until d).foldLeft(BigInt(0))((a, i) =>
      a + BigInt(cells0.getOrElse((i, i), 0L))).toDouble
    var cells = cells0
    val rows = (1 to r).flatMap { k =>
      val (v, rayRaw) = powerIterate(cells, d, iters)
      if (k < r) cells = deflate(cells, d, v, rayRaw)
      v.zipWithIndex.map { case (x, i) =>
        (k, i, rnd(x.toDouble / VQ, 9), rnd(rayRaw / CQ, 9),
          rnd(rayRaw / trace, 6))
      }
    }
    rows.toDF("component", "pos", "loading", "eigval", "var_explained")
  }

  /** Embedding-space isotropy report — mean pairwise cosine between all
    * n(n−1) ordered vector pairs WITHOUT the O(n²) pair join, via the
    * sum-vector identity: Σ_{a≠b} v̂_a·v̂_b = ‖Σ v̂‖² − Σ‖v̂‖². A healthy
    * embedding space is near-isotropic (mean cosine ≈ 0); a high mean
    * cosine is the anisotropy/"narrow cone" pathology [Ethayarajh,
    * EMNLP'19] that makes cosine retrieval scores saturate — the QA
    * readout to take BEFORE trusting any cosine threshold upstream
    * (semantic dedup, embedding near-dup, ANN recall gates).
    *
    * Exactness: per vector ONE pinned norm (the codegen'd vec_dot sums
    * components in array order — the same left-to-right order the
    * oracle's list_sum replays), normalized components 6dp-rounded and
    * quantized to the 10⁶ grid; everything after is exact integer
    * sums: per-dim totals S_i, ‖S‖² = Σ S_i² as decimal(38,0) ≡
    * HUGEINT, and the self-term Σ qn² (folded into the SAME d-row
    * grouped aggregate as S_i — one exploded pass). Two double
    * divisions at the end. One exploded corpus pass + one row-level
    * count pass, d-row state, answer-sized output. Zero-norm vectors
    * are excluded (no direction) and counted.
    */
  def isotropy(embeddings: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.vec_dot
    val base = embeddings.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"),
        sqrt(vec_dot(col("embedding"), col("embedding"))).as("__nrm"))
    val ok = base.filter(col("__nrm") > 0)
    val qn = ok
      .select(col("__nrm"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("pos"),
        floor(round(col("x").cast("double") / col("__nrm"), 6) * 1e6 + 0.5)
          .cast("long").as("qn"))
    // one d-row grouped pass carries BOTH moments; terms cast to
    // decimal before summing (the momentSums overflow discipline)
    val s2 = qn.groupBy("pos")
      .agg(sum(col("qn").cast("decimal(38,0)")).as("__s"),
        sum((col("qn") * col("qn")).cast("decimal(38,0)")).as("__t_pos"))
      .agg(sum(col("__s") * col("__s")).as("__s2"),
        sum(col("__t_pos")).as("__t"))
    val c = base.agg(count(lit(1)).as("__all"),
      sum(when(col("__nrm") > 0, 1L).otherwise(0L)).as("n_vectors"),
      sum(when(col("__nrm") > 0,
        floor(col("__nrm") * 1e6 + 0.5).cast("long"))
        .otherwise(0L).cast("decimal(38,0)")).as("__sn"))
    c.crossJoin(broadcast(s2))
      .select(col("n_vectors"),
        (col("__all") - col("n_vectors")).as("n_zero_norm"),
        round(col("__sn").cast("double") / col("n_vectors") / 1e6, 6)
          .as("mean_norm"),
        when(col("n_vectors") < 2, lit(null).cast("double"))
          .otherwise(round((col("__s2") - col("__t")).cast("double")
            / (col("n_vectors").cast("double") * (col("n_vectors") - 1))
            / 1e12, 6)).as("mean_pairwise_cos"))
  }

  /** Per-label embedding cohesion — mean WITHIN-label pairwise cosine
    * vs mean CROSS-label pairwise cosine, both without any pair join
    * (the [[isotropy]] sum-vector identity, grouped): with S_g the
    * per-label sum of unit vectors and T_g its self-term,
    *
    *   Σ_{a≠b ∈ g}  v̂_a·v̂_b = ‖S_g‖² − T_g
    *   Σ_{a∈g, b∉g} v̂_a·v̂_b = S_g · (S − S_g)
    *
    * — the label-separation QA readout for a labeled embedding table: a
    * label whose within-mean barely beats its cross-mean has no
    * geometric identity (the one-pass exact cousin of a silhouette).
    * Same quantization discipline as [[isotropy]] (6dp unit components
    * on the 10⁶ grid, exact integer sums, two pinned divisions per
    * label). State is labels × d rows; one exploded corpus pass.
    * Output: (label, n, mean_within_cos, mean_cross_cos), within NULL
    * for singleton labels, cross NULL when one label owns the corpus.
    */
  def labelCohesion(embeddings: DataFrame,
      labelCol: String = "label"): DataFrame = {
    import graft.functions.GraftFunctions.vec_dot
    val base = embeddings
      .filter(col("embedding").isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).as("__g"), col("embedding"),
        sqrt(vec_dot(col("embedding"), col("embedding"))).as("__nrm"))
      .filter(col("__nrm") > 0)
    val qn = base
      .select(col("__g"), col("__nrm"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("__g"), col("pos"),
        floor(round(col("x").cast("double") / col("__nrm"), 6) * 1e6 + 0.5)
          .cast("long").as("qn"))
    // labels × d rows: per-label dim sums + self-terms in ONE pass
    val labelDims = qn.groupBy("__g", "pos")
      .agg(sum(col("qn").cast("decimal(38,0)")).as("__s"),
        sum((col("qn") * col("qn")).cast("decimal(38,0)")).as("__t"))
    val globalDims = labelDims.groupBy("pos")
      .agg(sum(col("__s")).as("__sg"))
    val perLabel = labelDims.join(globalDims, "pos")
      .groupBy("__g")
      .agg(sum(col("__s") * col("__s")).as("__s2"),
        sum(col("__t")).as("__tt"),
        sum(col("__s") * (col("__sg") - col("__s"))).as("__x"))
    val counts = base.groupBy("__g").agg(count(lit(1)).as("n"))
    val total = broadcast(counts.agg(sum(col("n")).as("__nall")))
    perLabel.join(counts, "__g").crossJoin(total)
      .select(col("__g").as(labelCol), col("n"),
        when(col("n") < 2, lit(null).cast("double"))
          .otherwise(round((col("__s2") - col("__tt")).cast("double")
            / (col("n").cast("double") * (col("n") - 1)) / 1e12, 6))
          .as("mean_within_cos"),
        when(col("__nall") === col("n"), lit(null).cast("double"))
          .otherwise(round(col("__x").cast("double")
            / (col("n").cast("double") * (col("__nall") - col("n")))
            / 1e12, 6)).as("mean_cross_cos"))
  }

  /** Per-vector projection onto the dominant component: score =
    * round(Σ q_pos·v_pos / (Q·10¹²), 6) — one broadcast join of the
    * d-row eigenvector against the quantized component stream, one
    * grouped exact decimal sum. The 1-D embedding every drift monitor
    * and stratifier downstream can afford at corpus scale.
    * Output: (vec_id, pc1_score).
    */
  def pc1Scores(embeddings: DataFrame, iters: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (cells, d) = covqCells(embeddings)
    val (v, _) = powerIterate(cells, d, iters)
    val vdf = broadcast(v.zipWithIndex.map { case (x, i) => (i, x) }
      .toSeq.toDF("pos", "__v"))
    quantized(embeddings)
      .join(vdf, "pos")
      .groupBy("vec_id")
      .agg(sum((col("q") * col("__v")).cast("decimal(38,0)")).as("__s"))
      .select(col("vec_id"),
        round(col("__s").cast("double") / (lit(1048576.0) * 1e12), 6)
          .as("pc1_score"))
  }
}
