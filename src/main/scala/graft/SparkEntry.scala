package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, CacheRegistry, Cdc, Dedup, Eval, Events, Graph, HllStore, Index, Linkage, Multimodal, Pq, Quantiles, Sampling, Similarity, SketchStore, Sketches, TextAnalysis, Tfidf}

/** Driver contract — queries over the synthetic tables plus DuckDB oracle
  * SQL for each (SURVEY.md §7.2 step 5, FIXTURES.md §B mapping).
  *
  * Cross-engine determinism rules used throughout:
  *   - every query ends in an explicit ORDER BY on a unique key;
  *   - double aggregates go through exact DECIMAL accumulation, then a cast
  *     back to double (identical bits in any engine), or are round()ed;
  *   - event timestamps (parquet TIMESTAMP_NANOS) are exposed as epoch-ms
  *     longs (`ts div 1000000` ↔ DuckDB `epoch_ms(ts)`);
  *   - DuckDB `sum(INTEGER)` returns HUGEINT, which pandas renders as
  *     float64 and hash-mismatches Spark's int64 — every integer sum in
  *     oracle SQL must be wrapped in CAST(... AS BIGINT);
  *   - no array-typed output columns: the driver's pandas sort cannot hash
  *     ndarray cells (flatten to scalars instead).
  */
object SparkEntry {

  import graft.queries._

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  private def merged[V](parts: Seq[Map[String, V]], what: String): Map[String, V] = {
    val all = parts.reduce(_ ++ _)
    // a duplicate key across registry files would silently SHADOW an
    // earlier query out of the correctness gate (the r17 q_retention
    // escape) — fail loudly instead
    require(all.size == parts.map(_.size).sum,
      s"duplicate $what key across registry files: " +
        parts.flatMap(_.keys).groupBy(identity).collect {
          case (k, vs) if vs.size > 1 => k }.mkString(", "))
    all
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(Seq(QueriesPart1.m, QueriesPart2.m, QueriesPart3.m,
      QueriesPart4.m), "query")

  def oracleSql: Map[String, String] =
    merged(Seq(OraclesPart1.m, OraclesPart2.m, OraclesPart3.m,
      OraclesPart4.m), "oracle")
}
