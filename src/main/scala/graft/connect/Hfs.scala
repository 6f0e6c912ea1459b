package graft.connect

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-FileSystem plumbing for the engine's custom sinks
  * ([[graft.streaming.StreamOps]] upserts, [[Sources.compactParquet]],
  * [[Sources.writeZOrdered]]'s file count). These used to run on
  * `java.io.File`, which is correct on a laptop and meaningless on the
  * deployment target: a 100 TB cluster writes to HDFS or an object
  * store, where `java.io.File` does not resolve at all. Every path
  * operation goes through the `Path.getFileSystem(hadoopConf)` handle
  * instead — the same abstraction Spark's own committers use — so
  * `file:`, `hdfs:`, `s3a:` etc. all bind from the session's Hadoop
  * configuration.
  *
  * Rename semantics (the part that differs per store): HDFS rename is
  * an atomic namespace edit — the current→prev→next swap dance keeps
  * exactly its local-filesystem guarantees there. Object-store
  * "renames" are copy+delete and NOT atomic; for those targets use the
  * manifest-committed sink ([[graft.streaming.StreamOps.mergeIntoManifestSnapshot]]),
  * which never renames data and commits via write-once manifest files.
  * [[renameChecked]] requires a non-existent destination because
  * `FileSystem.rename` with an existing directory destination moves
  * the source INTO it (posix-mv semantics) instead of replacing it —
  * the sinks' dance always deletes/clears the target first, and this
  * guard turns any violation into an immediate error instead of a
  * silently nested directory.
  */
object Hfs {
  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def isDir(fs: FileSystem, p: Path): Boolean =
    fs.exists(p) && fs.getFileStatus(p).isDirectory

  def isFile(fs: FileSystem, p: Path): Boolean =
    fs.exists(p) && fs.getFileStatus(p).isFile

  def deleteIfExists(fs: FileSystem, p: Path): Unit = {
    if (fs.exists(p)) { val _ = fs.delete(p, true) }
  }

  def renameChecked(fs: FileSystem, from: Path, to: Path, what: String): Unit = {
    require(!fs.exists(to), s"$what: rename target $to already exists")
    require(fs.rename(from, to), s"$what: rename $from -> $to failed")
  }

  /** Directories directly under `p` (empty if `p` doesn't exist). */
  def listDirs(fs: FileSystem, p: Path): Seq[Path] =
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath).toSeq

  /** Files directly under `p` (empty if `p` doesn't exist). */
  def listFiles(fs: FileSystem, p: Path): Seq[Path] =
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath).toSeq

  /** Data files of a parquet directory (excludes _SUCCESS etc.). */
  def countParquetFiles(fs: FileSystem, p: Path): Long =
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).count(st => st.isFile &&
      st.getPath.getName.endsWith(".parquet") &&
      !st.getPath.getName.startsWith("_")).toLong

  /** [[countParquetFiles]] through partition subdirectories (hive
    * layouts: data files live under `col=value/` dirs, the top level
    * holds none).
    */
  def countParquetFilesRecursive(fs: FileSystem, p: Path): Long =
    if (!fs.exists(p)) 0L
    else countParquetFiles(fs, p) +
      listDirs(fs, p).map(countParquetFilesRecursive(fs, _)).sum

  /** Write a small control file (pointer/marker) in one stream. With
    * overwrite=true this is a single-object PUT on object stores. */
  def writeSmall(fs: FileSystem, p: Path, content: String,
      overwrite: Boolean = false): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  def readSmall(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Listing-level fingerprint of a file or directory: every part
    * file's (name, length, mtime) hashed — metadata-only, no data
    * read, one namenode listing per call. Used to key per-JVM frozen
    * artifact caches honestly: a fixture regenerated in place changes
    * the listing, so stale artifacts rebuild instead of silently
    * serving wrong results.
    */
  def listingFingerprint(spark: SparkSession, path: String): String = {
    val f = fs(spark, path)
    val p = new Path(path)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    if (f.exists(p)) {
      val st = f.getFileStatus(p)
      if (st.isFile) parts += s"${p.getName}:${st.getLen}:${st.getModificationTime}"
      else {
        val it = f.listFiles(p, true)
        while (it.hasNext) {
          val e = it.next()
          parts += s"${e.getPath.getName}:${e.getLen}:${e.getModificationTime}"
        }
      }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(parts.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }
}
