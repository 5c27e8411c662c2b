package graft.embed

import scala.util.hashing.MurmurHash3

/** Pluggable embedding interface.
  *
  * The reference delegates embedding to external model APIs
  * (`src/server/utils/models.py:123-141`) and its own tests substitute a
  * deterministic mock (`tests/server/test_endpoints_embed.py:98-112`).
  * The engine therefore treats the embedder as an injected, deterministic
  * function `text -> ARRAY<FLOAT>` so every downstream vector operator is
  * exactly testable.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map(embed)
}

/** Deterministic feature-hashing embedder: tokens are hashed into `dim`
  * signed buckets and the vector is L2-normalized. Pure JVM, no state,
  * identical on every executor — the Spark analog of the reference's
  * MockEmbeddings.
  */
final case class HashEmbedder(dim: Int = 64, seed: Int = 42) extends Embedder {
  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null) {
      var i = 0
      val n = text.length
      while (i < n) {
        // manual tokenizer: runs of letters/digits, lowercased
        while (i < n && !Character.isLetterOrDigit(text.charAt(i))) i += 1
        val start = i
        while (i < n && Character.isLetterOrDigit(text.charAt(i))) i += 1
        if (i > start) {
          val tok = text.substring(start, i).toLowerCase
          val h = MurmurHash3.stringHash(tok, seed)
          val bucket = java.lang.Math.floorMod(h >>> 1, dim)
          val sign = if ((h & 1) == 0) 1.0f else -1.0f
          v(bucket) += sign
        }
      }
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += v(j).toDouble * v(j); j += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      j = 0
      while (j < dim) { v(j) *= inv; j += 1 }
    }
    v
  }
}

/** Requests-per-minute throttle around any [[Embedder]] — the engine
  * side of the reference's embed-API rate limit, which sleeps
  * `60 / rate_limit` seconds between ingestion batches
  * (`src/server/utils/embedding.py:335-338`). The token interval is
  * enforced per EXECUTOR JVM: all task closures that deserialize an
  * equal embedder (same inner, same rpm) share one process-wide clock
  * ([[RateLimitedEmbedder.clocks]]), so rapid task churn cannot reset
  * the interval and the effective cluster-wide rate is bounded by
  * `rpm × numExecutors` — size `rpm` accordingly, exactly as the
  * reference sizes it per worker. `rpm <= 0` disables the throttle.
  */
final case class RateLimitedEmbedder(inner: Embedder, rpm: Int) extends Embedder {
  def dim: Int = inner.dim
  // resolved through the companion's JVM-wide map, NOT a per-instance
  // field: a @transient per-instance clock would restart at 0 in every
  // deserialized task, letting each task's first call through unthrottled
  @transient private lazy val clock = RateLimitedEmbedder.clocks
    .computeIfAbsent(this, _ => new java.util.concurrent.atomic.AtomicLong(0L))
  // nanosecond interval: a millisecond quantum would truncate to ZERO
  // (= unthrottled) for any rpm above 60000
  private def throttle(): Unit = if (rpm > 0) {
    val intervalNs = 60000000000L / rpm
    while (true) {
      val last = clock.get()
      val now = System.nanoTime()
      val next = math.max(now, last + intervalNs)
      if (clock.compareAndSet(last, next)) {
        val waitNs = next - now
        if (waitNs > 0) Thread.sleep(waitNs / 1000000L, (waitNs % 1000000L).toInt)
        return
      }
    }
  }
  def embed(text: String): Array[Float] = { throttle(); inner.embed(text) }
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    throttle() // the reference throttles per BATCH, not per text
    inner.embedBatch(texts) // and the inner batch implementation (e.g. a
                            // single batched API call) must be preserved
  }
}

object RateLimitedEmbedder {
  /** One clock per distinct (inner, rpm) embedder identity per JVM —
    * case-class equality makes every deserialized copy of the same
    * logical embedder land on the same entry.
    *
    * CONTRACT: `inner` must implement VALUE equality (be a case class,
    * or override equals/hashCode on its configuration). A user-supplied
    * class with default reference equality makes every deserialized task
    * copy its own map entry — silently reinstating exactly the
    * per-task unthrottled-first-call bug this map exists to fix (and
    * leaking one entry per task). Relatedly, entries are never evicted
    * (one AtomicLong per logical embedder — fine for the intended
    * handful of static identities) and the map strongly retains the
    * embedder instances: do NOT mint embedder identities dynamically
    * (e.g. a fresh config object per request), or the map grows without
    * bound.
    */
  private[embed] val clocks =
    new java.util.concurrent.ConcurrentHashMap[
      RateLimitedEmbedder, java.util.concurrent.atomic.AtomicLong]()
}
