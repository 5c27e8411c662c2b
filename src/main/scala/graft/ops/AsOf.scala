package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (temporal lookup) join — for every left row, the single right
  * row with the greatest time at-or-before the left row's time within
  * the same key. The reference has no such operator (SURVEY.md §2.3:
  * "no as-of joins exist in the reference"), but a training-data event
  * pipeline needs it constantly: attach the most recent purchase /
  * model-version / config snapshot to each event without an aggregation
  * that collapses the stream.
  *
  * Implementation is a union + running carry, NOT a join: right rows
  * (tagged 0) and left rows (tagged 1) are unioned, sorted per key by
  * (time, tag), and the latest right payload is carried forward with
  * `last(ignoreNulls) over rowsBetween(unboundedPreceding, current)`.
  * One Exchange on the key — the same shuffle a sort-merge join would
  * pay — and zero row explosion, where the naive
  * `l.join(r, l.key===r.key && l.t >= r.t)` + per-pair max is a per-key
  * cartesian that dies on hot keys at 100 TB.
  *
  * Skew caveat: all rows of ONE key land in one window partition, so a
  * single hot key serializes in a single task — inherent to per-key
  * time ordering (a sort-merge join has the identical bound). If one
  * key dominates at scale, salt by time range: split the key's timeline
  * into chunks, run the carry per chunk, then stitch chunk boundaries
  * by carrying each chunk's final payload into the next (one extra
  * pass over chunk count, not row count).
  */
object AsOf {

  /** Join `left` to the most recent `right` row per `keyCol` with
    * `right.timeCol <= left.timeCol` (`< ` when `inclusive = false`).
    * Every non-key, non-time column of `right` is attached to the left
    * row under `prefix`; left rows with no eligible right row get nulls
    * (left-outer semantics).
    *
    * `tolerance`: maximum allowed gap `left.time - right.time`; a match
    * farther back yields nulls, exactly as if no right row existed (the
    * pandas `merge_asof(tolerance=...)` contract). Pass a literal in the
    * time column's difference type — numeric times take a numeric bound,
    * timestamps an INTERVAL expression.
    *
    * Null contract (matches a true ASOF join, e.g. the DuckDB oracle):
    * equality keys never match on NULL — right rows with a null key or
    * null time are dropped up front, and left rows with a null key or
    * null time keep their row with a null payload (their position in
    * the carry order is undefined, so they must see no match rather
    * than an arbitrary one).
    *
    * Determinism: when `right` has several rows at the same (key, time),
    * which payload is carried is plan-order-dependent — pre-reduce
    * `right` to one row per (key, time) (e.g. `max_by` the latest id)
    * when that matters, exactly as an `ASOF JOIN`'s contract expects.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
               inclusive: Boolean = true, prefix: String = "asof_",
               tolerance: Option[Column] = None): DataFrame = {
    val payload = right.columns.filterNot(c => c == keyCol || c == timeCol).toSeq
    require(payload.nonEmpty, "right side must carry at least one payload column")
    // the carried struct leads with an internal __rt field (the matched
    // right time, for the tolerance check); a payload column of the same
    // name would duplicate the struct field and make __c.__rt ambiguous
    require(!payload.contains("__rt"),
      "right payload column '__rt' collides with the internal matched-time field; rename it")
    require(left.columns.contains(keyCol) && left.columns.contains(timeCol),
      s"left side must contain '$keyCol' and '$timeCol'")
    // the carried struct leads with the matched right time so the
    // tolerance check can see how far back the match reached
    val payloadType = StructType(
      StructField("__rt", right.schema(timeCol).dataType) +: payload.map(right.schema(_)))
    val leftType = StructType(left.columns.map(left.schema(_)))
    // inclusive: a right row AT the left row's time is visible, so right
    // sorts first (tag 0 < 1); exclusive flips the tags so the left row
    // sorts before any same-instant right row and cannot see it
    val (lTag, rTag) = if (inclusive) (1, 0) else (0, 1)
    val l2 = left.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(lTag).as("__tag"),
      lit(null).cast(payloadType).as("__p"),
      struct(left.columns.map(col).toSeq: _*).as("__l"))
    val r2 = right
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .select(
        col(keyCol).as("__k"), col(timeCol).as("__t"), lit(rTag).as("__tag"),
        struct(col(timeCol).as("__rt") +: payload.map(col): _*).as("__p"),
        lit(null).cast(leftType).as("__l"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a null-keyed/null-timed LEFT row must see no match: null keys
    // partition together and nulls sort first, so with null-keyed right
    // rows dropped the carry is provably null there — no explicit branch
    val withCarry = l2.union(r2)
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === lTag)
    val keep = tolerance match {
      case Some(tol) => col("__c").isNotNull && (col("__t") - col("__c.__rt")) <= tol
      case None      => col("__c").isNotNull
    }
    withCarry.select(
      col("__l.*") +: payload.map(p => when(keep, col(s"__c.$p")).as(prefix + p)): _*)
  }
}
