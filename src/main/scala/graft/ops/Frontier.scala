package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier politeness scheduling — the step between the robots
  * gate and the fetcher: per host, URLs are laid out one per
  * crawl-delay interval (RFC 9309's `Crawl-delay` as surfaced by
  * [[Robots.gateUrls]]; a configurable default where the host declares
  * none), producing the deterministic fetch timeline a distributed
  * fetcher fleet executes. Hosts are mutually independent — the whole
  * relation is ONE window keyed by host, no global coordination.
  *
  * Ordering within a host is md5(url)-then-url (the
  * `domain_cap_sample` convention): deterministic, engine-portable,
  * and unbiased w.r.t. discovery order.
  *
  * Scale shape: one shuffle keyed by host; the per-host sort is the
  * SEMANTIC requirement (politeness is a sequential schedule), not an
  * artifact. A host carrying 1e8 URLs is not a partitioning problem
  * but a scheduling absurdity — at 1 req/s that schedule is three
  * years long — so the real-world guard is the per-domain quota
  * ([[Sampling.stratifiedQuota]], the `domain_cap_sample` op) applied
  * BEFORE scheduling, which bounds every host's group.
  */
object Frontier {

  /** Assign per-host fetch slots: `slot` (0-based position in the
    * host's timeline) and `fetch_ms` (= slot × the host's crawl-delay
    * in ms, `defaultDelayMs` where `delayCol` is null). All input
    * columns ride through.
    */
  def schedule(urls: DataFrame, urlCol: String, hostCol: String,
               delayCol: String, defaultDelayMs: Long = 1000L): DataFrame = {
    require(defaultDelayMs >= 0, s"negative default delay $defaultDelayMs")
    val w = Window.partitionBy(col(hostCol))
      .orderBy(md5(col(urlCol)), col(urlCol))
    val delayMs = coalesce(
      (col(delayCol) * 1000).cast("long"), lit(defaultDelayMs))
    urls
      .withColumn("slot", (row_number().over(w) - 1).cast("long"))
      .withColumn("fetch_ms", col("slot") * delayMs)
  }
}
