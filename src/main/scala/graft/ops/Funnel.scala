package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analytics over an event stream: how many users
  * completed step 1, then step 2 strictly after their earliest step-1,
  * and so on — the conversion-funnel report every event pipeline runs.
  *
  * Semantics: a user reaches step i+1 iff they have an event of that
  * step's type strictly later than their EARLIEST qualifying step-i
  * event (the standard greedy/min-timestamp funnel, which is exactly
  * the existence semantics: if any ordered chain exists, the earliest
  * chain exists). Ties at identical timestamps do NOT advance the
  * funnel (strict `>`).
  */
object Funnel {

  /** Per-step reach counts: one row per step, `(step, event_type,
    * n_users)`, steps numbered from 1 in the given order.
    *
    * Plan shape, sized for 100 TB: each step is one type-filtered scan
    * (predicate pushed to the source), one SHUFFLE_HASH join against
    * the previous step's per-user frontier — a (user, ts) pair, never
    * event payloads — and one per-user min agg. Steps are bounded and
    * few; work per step is linear in that step's events. The timestamp
    * column only needs a total order (the nanos BIGINT of the events
    * table is used as-is — no truncation, so ties are exact).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var cur: DataFrame = null
    val frames = steps.zipWithIndex.map { case (st, i) =>
      cur =
        if (i == 0)
          events.filter(col(typeCol) === st)
            .groupBy(col(userCol)).agg(min(col(tsCol)).as("__s"))
        else
          events.filter(col(typeCol) === st)
            .join(cur.select(col(userCol), col("__s").as("__prev"))
              .hint("SHUFFLE_HASH"), Seq(userCol))
            .filter(col(tsCol) > col("__prev"))
            .groupBy(col(userCol)).agg(min(col(tsCol)).as("__s"))
      cur.agg(count(lit(1)).cast("long").as("n_users"))
        .select(lit(i + 1).as("step"), lit(st).as("event_type"),
          col("n_users"))
    }
    frames.reduce(_ unionByName _)
  }

  /** Cohort retention: users grouped by the time bucket of their FIRST
    * event (the cohort), then counted in every later bucket they were
    * active in — `(cohort, week_offset, n_users)`, offset 0 being the
    * cohort bucket itself. Buckets are exact integer FLOOR division of
    * the raw timestamp (nanos by default — `bucketNs` = one 7-day
    * week), so the computation is wholly integer arithmetic and
    * reproduces bit-for-bit on any engine — including pre-epoch
    * (negative) timestamps, where Spark's `div` truncates toward zero
    * but floor (and DuckDB's `//`) rounds down.
    *
    * Plan shape: one (user, bucket) dedup agg, one per-user min agg,
    * one SHUFFLE_HASH join of the two (both already keyed by user),
    * one final (cohort, offset) agg — counts are plain `count` because
    * the dedup already made (user, bucket) unique. Linear, no windows.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      bucketNs: Long = 7L * 86400L * 1000000000L): DataFrame = {
    require(bucketNs > 0, s"bucketNs must be positive, got $bucketNs")
    // integer floor division (not `div`, which truncates toward zero):
    // stays in Long arithmetic — floor(ts / b) via DOUBLE would lose
    // precision above 2^53 ns (~104 days)
    val q = expr(s"`$tsCol` div ${bucketNs}L")
    val r = expr(s"`$tsCol` % ${bucketNs}L")
    val wk = when(r < 0, q - 1).otherwise(q)
    val active = events.select(col(userCol), wk.as("__wk")).distinct()
    val cohorts = active.groupBy(col(userCol)).agg(min(col("__wk")).as("cohort"))
    active.join(cohorts.hint("SHUFFLE_HASH"), Seq(userCol))
      .groupBy(col("cohort"), (col("__wk") - col("cohort")).as("week_offset"))
      .agg(count(lit(1)).cast("long").as("n_users"))
  }
}
