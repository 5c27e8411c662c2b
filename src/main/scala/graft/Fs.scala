package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem helpers that resolve through the Hadoop FileSystem API, so
  * store paths work on any supported scheme (file://, hdfs://, s3a://…)
  * — `java.io.File` checks silently return false for non-local URIs,
  * which would break the anti-join idempotency contract on a cluster.
  */
object Fs {
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def delete(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
  }

  def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readString(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  def rename(spark: SparkSession, from: String, to: String): Boolean = {
    val f = new Path(from)
    f.getFileSystem(spark.sparkContext.hadoopConfiguration).rename(f, new Path(to))
  }

  /** Publish `from` at `to` iff `to` does not exist, ATOMICALLY — the
    * compare-and-swap primitive for manifest commits. On the local
    * filesystem a plain rename OVERWRITES an existing destination
    * (POSIX rename(2)), so an exists-check + rename leaves a TOCTOU
    * window; hardlink creation (`link(2)`) fails with EEXIST atomically,
    * which makes the local CAS exact. On HDFS, rename to an existing
    * file already fails, so exists+rename is exact there too.
    * Returns true iff this caller won the publish.
    *
    * Any OTHER scheme is REJECTED: on object stores (s3a/gs/abfs…)
    * rename is copy+delete with no destination-exists atomicity, so two
    * concurrent commits could both "win" the same manifest version and
    * one append's segment would be silently dropped — fail fast instead
    * of risking silent data loss. Supporting an object store needs a
    * conditional-create publish (e.g. S3 conditional PUT) first.
    *
    * viewfs caveat: viewfs is a client-side mount table and this guard
    * inspects only the OUTER scheme — a viewfs mount whose target is an
    * object store passes the check yet loses the no-overwrite
    * atomicity. Keep versioned tables on mounts backed by HDFS (or
    * resolve the target filesystem before trusting the commit).
    */
  def publishExclusive(spark: SparkSession, from: String, to: String): Boolean = {
    val f = new Path(from)
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scheme = fs.getScheme
    if (scheme != "file" && scheme != "hdfs" && scheme != "viewfs")
      throw new UnsupportedOperationException(
        s"publishExclusive requires an atomic no-overwrite publish, which scheme " +
          s"'$scheme' cannot guarantee (object-store rename is copy+delete): " +
          s"refusing to commit at $to — use a file:// or hdfs:// table path")
    if (scheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(new Path(to).toUri.getPath),
          java.nio.file.Paths.get(f.toUri.getPath))
        fs.delete(f, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          // 'file'-scheme mounts without link(2) (CIFS, FAT, some FUSE
          // drivers): degrade to the exists+rename publish rather than
          // making the store unusable — exactness shrinks back to the
          // HDFS-style check on those mounts
          !fs.exists(new Path(to)) && fs.rename(f, new Path(to))
      }
    } else !fs.exists(new Path(to)) && fs.rename(f, new Path(to))
  }

  def copyFile(spark: SparkSession, from: String, to: String): Unit = {
    val f = new Path(from); val t = new Path(to)
    val conf = spark.sparkContext.hadoopConfiguration
    val ok = org.apache.hadoop.fs.FileUtil.copy(
      f.getFileSystem(conf), f, t.getFileSystem(conf), t,
      false /* keep source */, true /* overwrite */, conf)
    if (!ok) throw new java.io.IOException(s"copy failed: $from -> $to")
  }

  def mkdirs(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
  }

  def modTime(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p).getModificationTime
  }

  def list(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.toString)
  }

  /** All regular files under `dir` (recursive) with their sizes —
    * metadata-only, one listing stream.
    */
  def listFilesRecursive(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (it.hasNext) {
        val st = it.next()
        buf += ((st.getPath.toString, st.getLen))
      }
      buf.toSeq
    }
  }
}
