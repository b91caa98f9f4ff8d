package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CacheRegistry, Classifier}

/** Laws for the trained linear quality probe. The q_quality_clf oracle
  * replays the full training loop bit-for-bit; these specs pin what the
  * oracle can't say — that the probe actually LEARNS (separable corpus
  * → correct ranking), that training is partition-order invariant (the
  * integer-sum property), and that held-out scoring works.
  */
class ClassifierSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // linearly separable toy corpus: 'good' docs share a vocabulary the
  // 'bad' docs never use — three gradient steps must rank every good
  // doc above every bad one
  private def toyDocs = Seq(
    (1L, "clear prose with structure and meaning", true),
    (2L, "clear structure meaning prose flows well", true),
    (3L, "meaning and structure in clear prose", true),
    (4L, "zx qq vv kk jj pp", false),
    (5L, "qq zx pp kk vv spam", false),
    (6L, "kk pp zx spam qq junk", false),
  ).toDF("doc_id", "text", "good")

  test("trained probe separates a separable corpus") {
    val scored = Classifier.linearProbe(toyDocs, col("good"),
        dim = 32, iters = 3, lr2 = 0.25)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    CacheRegistry.release(spark)
    val goodMin = scored.filter(_._1 == 1L).map(_._2).min
    val badMax = scored.filter(_._1 == 0L).map(_._2).max
    assert(goodMin > badMax,
      s"every labeled-good doc must outscore every bad one " +
        s"(good min $goodMin vs bad max $badMax)")
  }

  test("training is invariant under adversarial repartitioning") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val base = Classifier.trainLinearProbe(docs, col("lang") === "en",
      dim = 32, iters = 2)
    CacheRegistry.release(spark)
    val shuffled = Classifier.trainLinearProbe(
      docs.repartition(17, col("text")), col("lang") === "en",
      dim = 32, iters = 2)
    CacheRegistry.release(spark)
    assert(base == shuffled && base.nonEmpty,
      "integer gradient sums must make training partition-order exact")
  }

  test("scoring under frozen weights is one map-side projection (no shuffle)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val w = Classifier.trainLinearProbe(docs, col("lang") === "en",
      dim = 32, iters = 1)
    CacheRegistry.release(spark)
    val plan = Classifier.scoreWith(docs, col("lang") === "en", w, dim = 32)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"scoring a 100 TB corpus must not shuffle:\n$plan")
  }

  test("scoring under an EMPTY weight map is bias-only, not an analysis error") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val rows = Classifier.scoreWith(docs, lit(false), Map.empty[Long, Long])
      .orderBy("doc_id").collect()
    // no weights anywhere: every feature lookup misses, the bias is 0
    assert(rows.map(_.getDouble(2)).toSeq == Seq(0.0, 0.0),
      "empty weights must score the zero bias for every doc")
  }

  test("held-out scoring: train on a labeled slice, score the rest") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val labeled = docs.filter(col("doc_id") % 2 === 0)
    val w = Classifier.trainLinearProbe(labeled, col("lang") === "en",
      dim = 32, iters = 2)
    CacheRegistry.release(spark)
    val held = Classifier.scoreWith(docs.filter(col("doc_id") % 2 === 1),
      col("lang") === "en", w, dim = 32)
    val rows = held.collect()
    assert(rows.nonEmpty && rows.forall(!_.isNullAt(2)),
      "every held-out doc gets a score (bias feature is always present)")
  }
}
