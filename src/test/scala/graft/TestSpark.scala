package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local SparkSession for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.sparkContext.setCheckpointDir(
      CheckpointDirs.temp())
    s
  }

  /** Build a lines DF shaped like LogParser.readLines output. */
  def linesDF(lines: Seq[String], file: String = "mem"): DataFrame = {
    val s = spark
    import s.implicits._
    lines.zipWithIndex
      .map { case (l, i) => (file, i.toLong, l, 0) }
      .toDF("file", "offset", "value", "__split")
  }
}
