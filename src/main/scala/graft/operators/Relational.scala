package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's four specialized join shapes plus its windowed /
  * dedup idioms, as reusable DataFrame combinators (SURVEY §2.4–§2.7).
  *
  * Scale notes are attached per operator: these run on day-partitioned
  * fact tables at 100 TB, so each one states its shuffle behavior and the
  * broadcast decision.
  */
object Relational {

  /** Previous-period metric join (SURVEY §2.4, reference
    * google_search_console.py:369-408): left-join the same fact table
    * shifted by a period, exposing each metric as `<metric>Previous`.
    *
    * Scale: self-equi-join on (keys, date). Both sides shuffle on the same
    * keys, so Spark co-partitions them in one exchange each; with the fact
    * table bucketed/partitioned by the join keys the exchange on the big
    * side is reused across periods.
    */
  def previousPeriodJoin(
      cur: DataFrame,
      keys: Seq[String],
      dateCol: String,
      metrics: Seq[String],
      shift: Column => Column,
      suffix: String = "Previous"): DataFrame = {
    val prev = cur.select(
      (keys.map(col) :+ shift(col(dateCol)).as(dateCol)) ++
        metrics.map(m => col(m).as(m + suffix)): _*)
    cur.join(prev, keys :+ dateCol, "left")
  }

  /** As-of / latest-snapshot lookup (SURVEY §2.4, mongodb.py:128-131 /
    * metatags.py:224-234): latest row per key by `dateCol`.
    *
    * Scale: one shuffle on `keys`; implemented with max_by-style
    * row_number so no driver-side collect. AQE handles key skew.
    */
  def latestSnapshot(df: DataFrame, keys: Seq[String], dateCol: String,
                     tieBreak: Seq[String] = Nil): DataFrame = {
    val ordering = (desc(dateCol) +: tieBreak.map(desc)).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** As-of JOIN between two tables (pandas merge_asof / Flink temporal
    * join): every left row picks up the single right row with the
    * greatest rightTs ≤ leftTs (strict: < leftTs) for the same keys —
    * null-filled when no right row precedes it. Output = left's columns
    * + right's non-key columns (including rightTs, the match's
    * timestamp). Column names must not collide outside `keys`; the two
    * ts columns must share a type.
    *
    * Implemented as the union-window idiom, NOT a join: tag both
    * inputs, union, and per key carry the last non-null right value
    * forward in (ts, side) order — ONE exchange on `keys` and one
    * per-key sort, where the join formulation is either a range join
    * (interval work the caller shouldn't need) or a row-multiplying
    * equi-join + filter. At equal timestamps the side tag orders the
    * right row before (non-strict) or after (strict) the left row, which
    * IS the ≤ vs < semantic. Right rows should be unique per
    * (keys, rightTs) — with duplicates the forward-fill keeps an
    * arbitrary-but-deterministic one only if the caller adds a tiebreak
    * column to rightTs upstream (same contract as merge_asof).
    *
    * Scale: the window is partitioned by `keys` — per-key history sorts
    * in parallel, nothing global; a pathologically hot key degrades to
    * that key's own external sort, the standard per-key window trade. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               strict: Boolean = false): DataFrame = {
    val lCols = left.columns.filterNot(keys.contains)
    val rCols = right.columns.filterNot(keys.contains)
    val clash = lCols.toSet intersect rCols.toSet
    require(clash.isEmpty, s"column names collide outside keys: $clash")
    require(lCols.contains(leftTs) && rCols.contains(rightTs),
      s"ts columns ($leftTs, $rightTs) must exist outside keys")
    val (rSide, lSide) = if (strict) (1, 0) else (0, 1)
    // The whole right row travels as ONE struct so the forward-fill picks
    // a single matched row atomically: filling each right column
    // independently would let a null field inside the matched row pull
    // that field's value from an OLDER right row, silently mixing columns
    // from different rows. A right row whose payload fields are all null
    // is still a non-null struct, so it matches (fields stay null), while
    // left rows carry a null struct the fill skips over.
    val rStruct = org.apache.spark.sql.types.StructType(
      rCols.map(c => right.schema(c)))
    val lPrep = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(lSide).as("__side")) ++
        lCols.map(col) :+ lit(null).cast(rStruct).as("__r"): _*)
    val rPrep = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(rSide).as("__side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rCols.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPrep.unionByName(rPrep)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === lSide)
      .select(keys.map(col) ++ lCols.map(col) ++
        rCols.map(c => col("__r").getField(c).as(c)): _*)
  }

  /** Time-series resampling with forward fill: per key, a regular
    * `step`-spaced grid spanning [⌊min ts⌋, ⌊max ts⌋] (floored to step
    * multiples), each grid point carrying the latest observation
    * at-or-before it ([[asofJoin]] semantics — a leading grid point
    * before the first observation null-fills). `tsCol` is an integer
    * dimension (epoch micros/seconds/days — caller's choice of unit);
    * output = keys + grid_ts + the observation's remaining columns
    * (tsCol surfacing as `obs_ts`, the matched observation's time).
    *
    * Scale: the grid derives from a per-key (min, max) aggregate — one
    * partial-agg'd exchange of #keys rows — and explodes to
    * (range/step)+1 points per key, capped by `maxPointsPerKey`
    * (fail-fast assert, the [[RangeJoin]] discipline); the fill is one
    * more keys-exchange via the union-window as-of join. Nothing
    * quadratic, nothing single-partition. */
  def resample(df: DataFrame, keys: Seq[String], tsCol: String,
               step: Long, maxPointsPerKey: Int = 100000): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    require(!df.columns.contains("grid_ts") && !df.columns.contains("obs_ts"),
      "input must not already have grid_ts/obs_ts columns")
    val ts = col(tsCol).cast("long")
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(RangeJoin.floorDiv(min(ts), step).as("__g0"),
        RangeJoin.floorDiv(max(ts), step).as("__g1"))
    val grid = bounds
      .filter(assert_true(col("__g1") - col("__g0") + 1 <= maxPointsPerKey,
        concat(lit(s"resample grid exceeds $maxPointsPerKey points for key ("),
          concat_ws(",", keys.map(c => col(c).cast("string")): _*),
          lit(")"))).isNull)
      .withColumn("grid_ts",
        explode(sequence(col("__g0") * step, col("__g1") * step, lit(step))))
      .select((keys.map(col) :+ col("grid_ts")): _*)
    asofJoin(grid, df.withColumnRenamed(tsCol, "obs_ts"), keys,
      "grid_ts", "obs_ts")
  }

  /** Change-detection self-join: each row paired with the previous
    * snapshot's value of `valueCol` for the same key (lag over date).
    * Mirrors metatags-has_title_changed (metatags.py:209-275). */
  def withPreviousValue(df: DataFrame, keys: Seq[String], dateCol: String,
                        valueCol: String, out: String,
                        tieBreak: Seq[String] = Nil): DataFrame = {
    val ordering = (col(dateCol) +: tieBreak.map(col)).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn(out, lag(col(valueCol), 1).over(w))
  }

  /** Idempotent append: drop incoming rows whose key already exists in
    * the sink (SURVEY §2.4 existence anti-join; replaces the reference's
    * per-day COUNT probes, google_search_console.py:516-549).
    *
    * Scale: `sink` should be pre-filtered to the partitions the batch can
    * touch (date pruning) before calling; the anti-join then shuffles only
    * the incoming batch + pruned sink keys. Broadcast is OPT-IN: only set
    * `broadcastSink = true` when the caller has already pruned the sink to
    * a provably small key set — broadcasting an unpruned 100 TB sink's
    * keys is a driver OOM. Without the hint, AQE still converts to a
    * broadcast join at runtime when the key set turns out small.
    */
  def idempotentFilter(incoming: DataFrame, sink: DataFrame,
                       keys: Seq[String], broadcastSink: Boolean = false): DataFrame = {
    val keyDf = sink.select(keys.map(col): _*).dropDuplicates(keys)
    incoming.join(if (broadcastSink) broadcast(keyDf) else keyDf, keys, "left_anti")
  }

  /** Duplicate-value detection within a group set (SURVEY §2.5,
    * metatags.py:277-377): for each row, is its `valueCol` shared by other
    * rows of the same urlset? Emits per-row validity plus the list of
    * other members as `diff` (comma-joined, sorted for determinism).
    *
    * Scale: one shuffle on `valueCol`. The member list per group is capped
    * at `maxMembers` (row_number over the group, ordered by id, before the
    * collect) so an adversarial corpus where every row shares one value
    * cannot OOM an executor's aggregation buffer; `dup_count` still
    * reports the TRUE group size. Count-only callers should use
    * [[duplicateCounts]].
    */
  def duplicateValues(df: DataFrame, idCol: String, valueCol: String,
                      maxMembers: Int = 1000): DataFrame = {
    // ONE exchange on valueCol feeds all three window aggregates (the
    // former groupBy + groupBy + double-join-back shape moved the table
    // through three stages for the same answer); the member list still
    // caps at maxMembers via the row_number guard inside collect_list
    // (nulls are skipped), while dup_count reports the TRUE group size.
    val wv = Window.partitionBy(col(valueCol))
    val wOrd = wv.orderBy(col(idCol))
    // NULL values never pair: the former join-back form dropped
    // null-keyed rows via inner-join semantics; the window form would
    // instead lump every NULL into one "duplicate" group — filter first
    df.filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("dup_count", count(lit(1)).over(wv))
      .withColumn("__members", array_sort(
        collect_list(when(col("__rn") <= maxMembers, col(idCol))).over(wv)))
      .withColumn("is_duplicate", col("dup_count") > 1)
      .withColumn("diff",
        array_join(transform(array_remove(col("__members"), col(idCol)),
          m => m.cast("string")), ","))
      .drop("__members", "__rn")
  }

  /** Duplicate-count variant safe for adversarial corpora: no lists. */
  def duplicateCounts(df: DataFrame, valueCol: String): DataFrame =
    df.groupBy(col(valueCol)).agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** Top-k per group — rank() over a window; ties included by rank
    * semantics. One shuffle on the partition keys. */
  def topKPerGroup(df: DataFrame, keys: Seq[String], ordering: Seq[Column],
                   k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("rank", rank().over(w)).filter(col("rank") <= k)
  }

  /** Gap-based sessionization: a new session starts when the time since
    * the key's previous event exceeds `gapSeconds`. Two stacked windows
    * over ONE shuffle+sort on (keys; ts, tieBreak): lag marks session
    * starts, a running sum numbers them — the standard distributed
    * sessionization shape (no state explosion, no per-key collects;
    * Structured Streaming's session_window covers the always-on case).
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 gapSeconds: Long, tieBreak: Seq[String] = Nil,
                 out: String = "session_id"): DataFrame = {
    val ordering = (col(tsCol) +: tieBreak.map(col)).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    val prevTs = lag(col(tsCol), 1).over(w)
    val isNew = when(prevTs.isNull ||
      (unix_micros(col(tsCol)) - unix_micros(prevTs)) > gapSeconds * 1000000L,
      lit(1L)).otherwise(lit(0L))
    df.withColumn(out,
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** The reference's retry-queue merge: pending work unioned with fresh
    * work, deduped on the work-spec key (google_search_console.py:128-129).
    */
  /** Scalable global running sum (two-phase prefix sum): a global
    * `Window.orderBy(...)` funnels the whole stream through ONE task
    * (Spark warns `No Partition Defined for Window operation`) — fatal at
    * 100× scale. Instead:
    *   1. window per `bucket` (a coarse, monotone prefix of the ordering,
    *      e.g. year-month of the order date) → parallel local cumsums;
    *   2. per-bucket totals → each bucket's offset = sum of all EARLIER
    *      buckets' totals, via a triangular join over the (tiny, bounded)
    *      bucket list — no unpartitioned window even here;
    *   3. broadcast the offsets back and add.
    *
    * Requires: `bucket` is non-decreasing along `order` (rows of an
    * earlier bucket all precede rows of a later one). Long-typed values
    * sum associatively, so the result is bit-equal to the global window.
    */
  def prefixSum(df: DataFrame, bucket: Column, order: Seq[Column],
                value: Column, out: String): DataFrame = {
    val withB = df.withColumn("__bucket", bucket)
    val local = Window.partitionBy("__bucket").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withLocal = withB.withColumn("__local", sum(value).over(local))
    val totals = withB.groupBy(col("__bucket")).agg(sum(value).as("__btot"))
    val offsets = totals.as("a")
      .join(totals.as("b"), col("b.__bucket") < col("a.__bucket"), "left")
      .groupBy(col("a.__bucket").as("__bucket"))
      .agg(sum(col("b.__btot")).as("__off"))
    withLocal.join(broadcast(offsets), Seq("__bucket"))
      .withColumn(out, col("__local") + coalesce(col("__off"), lit(0L)))
      .drop("__bucket", "__local", "__off")
  }

  def mergeWorkLists(fresh: DataFrame, pending: DataFrame,
                     keys: Seq[String]): DataFrame =
    fresh.unionByName(pending, allowMissingColumns = true)
      .dropDuplicates(keys)
}
