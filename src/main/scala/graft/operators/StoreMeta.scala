package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}

/** Driver-side JSON sidecar for persisted-store metadata (the frozen
  * geometry/precision/column contract every store dir carries).
  *
  * Metadata is ONE answer-sized row, but as a parquet table it cost a
  * full Spark job to write and another per read — and the store
  * lifecycles (seed → meta → append → serve) call readMeta at every
  * stage, so the r15 bench billed ~16 s of combined wall to the four
  * store queries, most of it fixed per-action overhead rather than
  * data (r15 verdict task 7). A driver-written JSON file makes both
  * directions free.
  *
  * The sidecar goes through the HADOOP FILESYSTEM CLIENT resolved from
  * the store path itself (`Path.getFileSystem`), NOT java.nio — the
  * store's parquet data is written by Spark through that same client,
  * so on a cluster whose default FS is HDFS/S3 the meta object lands
  * next to the data instead of on the driver's local disk, any driver
  * can read it back, and the compact-and-swap renames move a `_meta`
  * dir that actually holds the sidecar. Local paths resolve to the
  * local FS, so single-node behavior is unchanged.
  *
  * Values are stored as JSON strings and parsed by typed getters —
  * geometry fields are ints/longs/booleans/strings only. The file
  * lives INSIDE the store's `_meta` dir (`<dir>_meta/meta.json`), so
  * the on-disk contract ("a store dir plus a _meta sidecar") is
  * unchanged.
  */
private[graft] object StoreMeta {
  private def metaPath(dir: String) = new Path(dir + "_meta", "meta.json")

  /** The Hadoop conf the sidecar IO resolves filesystems with: the
    * active session's (carries fs.defaultFS plus any object-store
    * credentials Spark was configured with), or a vanilla Configuration
    * when called outside a session (tests' cleanup paths).
    */
  private def hadoopConf: org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def fsFor(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def writeBytes(p: Path, bytes: Array[Byte]): Unit = {
    val fs = fsFor(p)
    // create(overwrite=true) makes parent dirs on every Hadoop FS impl
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  private def readBytes(p: Path): Array[Byte] = {
    val fs = fsFor(p)
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  def write(dir: String, kv: (String, Any)*): Unit = {
    val json = kv.map { case (k, v) => s""""${esc(k)}":"${esc(v.toString)}"""" }
      .mkString("{", ",", "}")
    writeBytes(metaPath(dir), json.getBytes(UTF_8))
  }

  /** Copy a frozen sidecar verbatim (compaction keeps the geometry).
    * Read-then-write rather than FS rename/copy so src and dst may live
    * on DIFFERENT filesystems (compact-to-local-staging patterns).
    */
  def copy(srcDir: String, dstDir: String): Unit =
    writeBytes(metaPath(dstDir), readBytes(metaPath(srcDir)))

  /** Does `dir` carry a meta sidecar — i.e. was a store (or optional
    * sidecar store, e.g. a Bloom companion) ever written there? Checked
    * on the store's own filesystem, same as read/write.
    */
  def exists(dir: String): Boolean = {
    val p = metaPath(dir)
    fsFor(p).exists(p)
  }

  def read(dir: String): Map[String, String] = {
    val p = metaPath(dir)
    require(fsFor(p).exists(p), s"store at $dir has no _meta sidecar " +
      s"($p) — not a store dir, or built by an older layout")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(readBytes(p), UTF_8))
    val it = root.properties().iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
    b.result()
  }
}
