package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed by per-partition batch functions.
  *
  * The Spark side — schema, partition-parallel batch iteration, stable
  * output contract — is real and tested. The media DECODE itself is a
  * clearly-marked STUB (this environment has no image/audio codecs): it
  * derives deterministic fake features from the payload bytes. Swapping in
  * a real decoder changes only the body of [[decodeStub]].
  */
object Multimodal {

  /** Attach a binary payload + deterministic metadata to each document.
    * Stands in for an ingest that carries image/audio bytes alongside text;
    * every derived column is computable by any engine (oracle-able).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("payload_bytes"),
      // fake media metadata, deterministic from doc stats
      (lit(16) + pmod(col("n_chars"), lit(64))).cast("int").as("width"),
      (lit(16) + pmod(col("n_chars") * 7, lit(64))).cast("int").as("height"),
      (col("n_chars") / 500 + 1).cast("int").as("frames"))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload_bytes", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false),
  ))

  /** STUB decoder — stands in for image decode / resize / frame sampling.
    * Deterministic 8-bin byte histogram normalized to [0,1]. A real
    * implementation would decode `payload` with a codec library here;
    * signature and batch shape stay identical.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >> 5) += 1f
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    hist.map(_ / n)
  }

  /** Feature extraction over payload batches: per-partition iteration (the
    * Scala analogue of an Arrow-batched UDF) — each partition's rows stream
    * through the decoder without driver involvement.
    */
  def extractFeatures(spark: SparkSession, withPayloads: DataFrame): DataFrame = {
    val out = withPayloads.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row(r.getAs[Long]("doc_id"), payload.length.toLong, decodeStub(payload))
      }
    }
    spark.createDataFrame(out, featureSchema)
  }
}
