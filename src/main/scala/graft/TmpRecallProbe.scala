package graft

// TEMPORARY probe to size ScaleCheck recall floors — deleted after use.
object TmpRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val qs = emb.filter(col("vec_id") < 8)

    val idx = java.nio.file.Files.createTempDirectory("proberec").toString + "/ix"
    operators.Similarity.writeIvfPqIndex(emb, idx, numCentroids = 32)
    println("=== ivfPqRecall sf0.1 k=5 ===")
    operators.Similarity.ivfPqRecall(spark, idx, qs, emb, k = 5).show()

    println("=== ivfRecall sf0.1 k=5 ===")
    operators.Similarity.ivfRecall(emb, qs, k = 5).show()

    println("=== pqRecall pseudo sf0.1 k=5 ===")
    operators.Pq.pqRecall(emb, qs, k = 5).show()

    println("=== pqRecall TRAINED iters=2 sf0.1 k=5 ===")
    val cb = operators.Pq.pqCodebooksTrained(emb, m = 4, ksub = 16, dim = 64, iters = 2)
    operators.Pq.pqRecall(emb, qs, k = 5, codebooks = Some(cb)).show()
    spark.stop()
  }
}
