package graft.ops

import org.apache.spark.sql.SparkSession

/** ONE register/maintain/restamp discipline for store-attached sidecars
  * — the lexical index ([[Keyword]]) and the MinHash band sidecar
  * ([[Dedup]]) share every mechanism here, so a future sidecar type
  * (and every seam that maintains them) inherits the whole lifecycle
  * instead of re-implementing it:
  *
  *   - a marker file inside the table names the sidecar + its columns;
  *     registration builds BEFORE writing the marker (a half-registered
  *     state is an unmarked, ignored sidecar — never a
  *     marked-but-missing one);
  *   - seam maintenance folds appends in, and any fold refusal
  *     (non-pure-append history, damaged stats) falls back to a LOUD
  *     rebuild;
  *   - a compaction restamps in O(1) ONLY when provably row-preserving
  *     from the artifacts alone (sole commit, single survivor segment,
  *     fresh pre-stamp), and a mid-rebuild failure degrades to a
  *     loudly-stale sidecar the next seam append heals — never a
  *     retroactive failure of the committed operation;
  *   - one lock per TABLE serializes every maintenance path (a restamp
  *     racing a seam fold lock-free could overwrite the sidecar
  *     mid-append and stamp the result fresh — the silent-corruption
  *     mode the stamp discipline exists to prevent). The lock is shared
  *     across sidecar TYPES on the same table deliberately: their
  *     maintenance reads the same manifest chain.
  *
  * The `_stats` contract both sidecars follow: a space-separated line
  * whose LAST field is the store stamp `v<version>`; the restamp
  * rewrites only that field.
  */
private[ops] object SidecarRegistry {

  final case class Registration(path: String, idCol: String, textCol: String)

  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def lock(table: String): Object = locks.computeIfAbsent(table, _ => new Object)

  private def log = org.slf4j.LoggerFactory.getLogger(getClass)

  def register(spark: SparkSession, table: String, markerPath: String,
               reg: Registration)(build: => Unit): Unit =
    lock(table).synchronized {
      build
      graft.Fs.writeString(spark, markerPath,
        s"${reg.path}\n${reg.idCol}\n${reg.textCol}")
    }

  def registered(spark: SparkSession, markerPath: String): Option[Registration] =
    if (!graft.Fs.exists(spark, markerPath)) None
    else {
      val lines = graft.Fs.readString(spark, markerPath).trim
        .split("\n").map(_.trim)
      Some(Registration(lines(0), lines(1), lines(2)))
    }

  /** Seam maintenance: fold, or rebuild loudly on any fold refusal. */
  def maintain(spark: SparkSession, table: String, markerPath: String,
               label: String)(append: Registration => Unit)(
               rebuild: Registration => Unit): Unit =
    registered(spark, markerPath).foreach { reg =>
      lock(table).synchronized {
        try append(reg)
        catch {
          case e @ (_: IllegalArgumentException | _: IllegalStateException |
                    _: java.io.FileNotFoundException) =>
            log.warn(s"incremental $label maintenance of ${reg.path} failed " +
              s"(${e.getMessage}); rebuilding from the store")
            rebuild(reg)
        }
      }
    }

  /** O(1) restamp across a provably row-preserving compaction; rebuild
    * otherwise, degrading to loudly-stale on a mid-rebuild failure.
    */
  def maintainAfterCompact(spark: SparkSession, table: String,
                           markerPath: String, label: String,
                           preVersion: Long, post: VersionedStore.State,
                           files: Int)(rebuild: Registration => Unit): Unit =
    registered(spark, markerPath).foreach { reg =>
      lock(table).synchronized {
        val statsPath = s"${reg.path}/_stats"
        def stamp: Option[String] =
          if (!graft.Fs.exists(spark, statsPath)) None
          else {
            val st = graft.Fs.readString(spark, statsPath).trim.split(" ")
            if (st.length >= 2) Some(st.last) else None
          }
        // an abandoned compaction (files == 0: the in-flight rewrite lost
        // its race and committed nothing) changed neither rows nor
        // version — a sidecar fresh at the current version needs nothing,
        // and rebuilding here would risk failing an operation that
        // already (vacuously) succeeded
        if (files == 0 && stamp.contains(s"v${post.version}")) ()
        else {
          val provablyExact = files > 0 && post.version == preVersion + 1 &&
            post.segments.size == 1 && stamp.contains(s"v$preVersion")
          if (provablyExact) {
            val st = graft.Fs.readString(spark, statsPath).trim.split(" ")
            graft.Fs.writeString(spark, statsPath,
              (st.init :+ s"v${post.version}").mkString(" "))
          } else {
            log.warn(s"compaction of $table not provably row-preserving for " +
              s"the registered $label ${reg.path}; rebuilding")
            try rebuild(reg)
            catch {
              case e @ (_: IllegalArgumentException | _: IllegalStateException |
                        _: java.io.FileNotFoundException) =>
                log.warn(s"post-compaction $label rebuild of ${reg.path} " +
                  s"failed (${e.getMessage}); left stale — the staleness " +
                  "guard refuses to serve it until the next append's " +
                  "maintenance heals it")
            }
          }
        }
      }
    }
}
