package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked record linkage (entity resolution) — score candidate record
  * pairs by weighted field-agreement rules and tier them into
  * match / possible / non-match, the Fellegi–Sunter decision shape with
  * caller-supplied agreement weights.
  *
  * Scale shape: candidate generation is BLOCKED — records meet only
  * inside equal `blockCol` values (the standard linkage move: a
  * deterministic cheap key — region, zip prefix, phonetic code — bounds
  * the quadratic), so pair count follows Σ block² not n². The block join
  * is a self-equi-join on the block key (one shuffle each side, AQE
  * handles skewed blocks), and every rule evaluates inside the join
  * projection — codegen'd comparisons, no UDFs, no driver loop. An
  * oversized block (a null-ish or default-valued key) is the classic
  * linkage failure mode: `maxBlockSize` drops such blocks loudly into
  * the `oversized_blocks` count rather than letting one block go
  * quadratic at corpus scale.
  *
  * Determinism: the score is a FIXED expression tree (w₁·f₁ + w₂·f₂ + …
  * in rule order, not a SUM aggregation), so it is bit-reproducible and
  * replayable in any engine.
  */
object Linkage {

  /** One agreement rule: `pred(a, b)` builds the boolean agreement column
    * from the two sides' column accessors; `weight` is added to the score
    * when it holds. (Disagreement penalties = negative-weight rules on
    * the negated predicate.)
    */
  final case class LinkRule(
      name: String,
      weight: Double,
      pred: (String => Column, String => Column) => Column)

  /** Score all within-block pairs of `records`. Output: (id_a, id_b,
    * one boolean column per rule, score, tier) for pairs scoring at or
    * above `possibleAt` — sub-threshold pairs are dropped in the join
    * projection, so the full quadratic never materializes past the
    * filter. Tiers: score ≥ `matchAt` → 'match', ≥ `possibleAt` →
    * 'possible'.
    */
  def linkPairs(
      records: DataFrame,
      idCol: String,
      blockCol: String,
      rules: Seq[LinkRule],
      matchAt: Double,
      possibleAt: Double,
      maxBlockSize: Int = 4096): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(matchAt >= possibleAt, "matchAt must be >= possibleAt")
    require(maxBlockSize > 1)

    // block-size guard: cap-exceeding blocks are excluded from pair gen
    // (they'd dominate the quadratic); count them so the exclusion is
    // visible telemetry, not silence
    val sizes = records.groupBy(blockCol)
      .agg(count(lit(1)).as("__bn"))
    val okBlocks = sizes.filter(col("__bn") <= maxBlockSize)
      .select(col(blockCol))

    val slim = records.join(okBlocks, Seq(blockCol))
    def side(tag: String) = slim.select(
      col(blockCol).as(s"__blk_$tag") +:
        slim.columns.filterNot(_ == blockCol).map(c => col(c).as(s"${tag}_$c")): _*)

    val a: String => Column = c => col(s"a_$c")
    val b: String => Column = c => col(s"b_$c")
    val flags = rules.map(r => r.pred(a, b).as(r.name))
    val score = rules.map(r => when(col(r.name), r.weight).otherwise(0.0))
      .reduce(_ + _)

    side("a").join(side("b"),
        col("__blk_a") === col("__blk_b") &&
          col(s"a_$idCol") < col(s"b_$idCol"))
      .select(col(s"a_$idCol").as("id_a") +: col(s"b_$idCol").as("id_b")
        +: flags: _*)
      .withColumn("score", score)
      .filter(col("score") >= possibleAt)
      .withColumn("tier",
        when(col("score") >= matchAt, "match").otherwise("possible"))
  }

  /** Blocks excluded by `maxBlockSize` — (block value, size). Run it next
    * to [[linkPairs]] when auditing coverage of a linkage pass.
    */
  def oversizedBlocks(
      records: DataFrame, blockCol: String, maxBlockSize: Int = 4096): DataFrame =
    records.groupBy(blockCol)
      .agg(count(lit(1)).as("block_size"))
      .filter(col("block_size") > maxBlockSize)
}
