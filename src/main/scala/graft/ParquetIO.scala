package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cached reads of IMMUTABLE parquet directories (guide §6 "file listing"
  * / §7.3 driver-side planning cost).
  *
  * Every `spark.read.parquet(path)` call builds a fresh relation: it
  * re-lists the directory and re-infers the schema from a footer —
  * driver-side, single-threaded work that costs tens of milliseconds per
  * call locally and whole listing rounds on object stores. The engine's
  * two hottest read families are provably immutable once readable:
  *
  *  - [[graft.ops.VersionedStore]] segments — write-once directories; a
  *    committed segment is never modified (mutations write NEW segments
  *    and swap the manifest pointer), and vacuumed segments are never
  *    re-read (the manifest no longer references them);
  *  - the driver-generated testdata tables under the scale-factor
  *    directory, constant for a process lifetime.
  *
  * For those, the resolved DataFrame itself — logical relation, snapshot
  * file index, inferred schema — is reusable verbatim, so it is cached
  * per (session, path). Round-18 job attribution measured lifecycle
  * queries (CDC replay, incremental sidecar rows) spending ~half their
  * wall OUTSIDE Spark jobs on exactly this re-resolution: the same
  * store's segments re-listed and re-footer-read once per state read,
  * several state reads per batch.
  *
  * NOT for mutable paths (sidecar ledgers, streaming sinks, anything
  * rewritten in place): a cached relation pins the file list at first
  * read and would silently miss files added later. Callers own that
  * contract; only the two families above go through here.
  */
object ParquetIO {
  // values are tiny (plan + file metadata), keys die with their session;
  // sized defensively anyway — a long-lived ingest JVM touching millions
  // of segments must not hoard plans for segments it read once
  private val MaxEntries = 65536
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def key(spark: SparkSession, path: String): String =
    System.identityHashCode(spark).toString + "|" + path

  /** The parquet directory at `path` as a cached, re-usable DataFrame.
    * First call resolves it exactly like `spark.read.parquet(path)`;
    * later calls in the same session return the identical relation with
    * zero driver I/O. Only call on paths whose CONTENTS never change
    * while readable (see object doc).
    */
  def readImmutable(spark: SparkSession, path: String): DataFrame = {
    val k = key(spark, path)
    val hit = cache.get(k)
    if (hit != null) hit
    else {
      val df = spark.read.parquet(path)
      if (cache.size() >= MaxEntries) cache.clear()
      cache.put(k, df)
      df
    }
  }

  /** Drop every cached relation under `prefix` (all sessions) — for the
    * rare mutation-adjacent caller that must re-resolve (e.g. tests
    * rewriting a fixture in place).
    */
  def invalidate(prefix: String): Unit = {
    val it = cache.keys()
    while (it.hasMoreElements) {
      val k = it.nextElement()
      if (k.substring(k.indexOf('|') + 1).startsWith(prefix)) cache.remove(k): Unit
    }
  }
}
