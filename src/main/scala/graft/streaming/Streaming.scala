package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming expression of the reference's incremental
  * semantics (SURVEY §2.9): the cron micro-batch + unprocessed-marker
  * pattern becomes a stream over the staging directory with checkpointed
  * progress; daily-tumbling ingestion becomes a watermarked window
  * aggregation; the per-key change detection of the metatags operation
  * becomes mapGroupsWithState.
  *
  * Batch remains the primary mode (the reference is cron-driven); these
  * give the same operators an always-on deployment without code changes —
  * staging writes are identical, only the reader differs.
  */
object Streaming {

  /** Stream over a staging collection directory: every file the batch
    * `StagingStore.append` writes becomes a micro-batch. The checkpoint
    * (set on the query) replaces the per-operation watermark table. */
  def readStagingStream(spark: SparkSession, root: String, collection: String,
                        schema: StructType,
                        maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(s"$root/staging/$collection")

  /** Daily tumbling counts/sums with late-data tolerance — the streaming
    * form of the reference's "data settles after N days" lag
    * (google_search_console.py:67: dateDaysAgo=3 ⇒ 3-day watermark). */
  def dailyMetrics(events: DataFrame, tsCol: String, valueCol: String,
                   keyCols: Seq[String],
                   lateness: String = "3 days"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy((window(col(tsCol), "1 day") +: keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select((Seq(col("window.start").as("day_start")) ++
        keyCols.map(col) ++ Seq(col("n"), col("total"))): _*)

  /** Streaming gap-based sessionization — the always-on form of
    * `Relational.sessionize` (batch q43/q44): `session_window` merges
    * events within `gap` of each other per key into one growing window;
    * the watermark bounds session state so abandoned sessions finalize
    * and evict instead of accumulating forever. */
  def sessionMetrics(events: DataFrame, tsCol: String, keyCols: Seq[String],
                     gap: String = "30 minutes",
                     lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy((session_window(col(tsCol), gap) +: keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n_events"))
      .select((Seq(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end")) ++
        keyCols.map(col) :+ col("n_events")): _*)

  /** Streaming exactly-once-per-key: dropDuplicates with watermark — the
    * always-on version of the idempotent-append anti-join (§2.4). */
  def dedupeStream(df: DataFrame, tsCol: String, keys: Seq[String],
                   lateness: String = "1 day"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .dropDuplicates(keys :+ tsCol)

  /** Streaming threshold alerting — the always-on form of
    * alerting_check's whole-result mode (S10): windowed per-key counts
    * that cross `threshold` become alert rows in the
    * [[graft.plans.Alerting.alertSchema]] shape, ready for the same
    * queue + dispatcher chain the batch path uses. */
  def thresholdAlerts(events: DataFrame, tsCol: String, keyCols: Seq[String],
                      threshold: Long, group: String = "default",
                      windowLen: String = "1 hour",
                      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy((window(col(tsCol), windowLen) +: keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .select(
        col("window.end").as("created"),
        lit(group).as("group"),
        concat_ws(" ",
          (lit("threshold") +: keyCols.map(col) :+
            col("n").cast("string")): _*).as("message"),
        to_json(struct((col("window.start") +: keyCols.map(col) :+
          col("n")): _*)).as("payload"))

  /** Exactly-once streaming sink into the warehouse: every micro-batch
    * lands via [[graft.sources.Warehouse.idempotentAppend]] keyed on
    * `keys`, so the batch a recovered checkpoint RE-DELIVERS (foreachBatch
    * is at-least-once) appends nothing the first delivery didn't — the
    * streaming end of the same effectively-once contract the batch
    * pipeline gets from the idempotent-append anti-join (§2.4). `keys`
    * is the replay identity, not a row identity, exactly as in batch. */
  def warehouseSink(df: DataFrame, warehouse: graft.sources.Warehouse,
                    table: String, keys: Seq[String], checkpoint: String,
                    partitionCol: String = "date")
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        warehouse.idempotentAppend(table, batch.toDF(), keys, partitionCol)
        ()
      }
      .start()

  /** Stream-static enrichment join — the streaming form of matching a
    * small configured rules/lookup table (alert rules, urlset
    * classifications) against the event stream. The static side is
    * broadcast: the stream never shuffles and no join state accrues.
    * The static plan is re-evaluated each micro-batch, so a rules
    * DataFrame that reads from storage picks up rule edits between
    * batches without restarting the query. */
  def ruleMatches(events: DataFrame, rules: DataFrame,
                  keys: Seq[String]): DataFrame =
    events.join(broadcast(rules), keys)

  /** Watermarked stream-stream inner join: pair each left event with
    * right events for the same `key` whose timestamp falls in
    * [leftTs, leftTs + within]. Both sides carry watermarks and the
    * range condition bounds join state, so buffered rows evict once the
    * watermark passes — the always-on form of the previous-period /
    * as-of correlation joins (§2.4). Timestamp columns must be named
    * differently so the range condition is unambiguous. */
  def correlateStreams(left: DataFrame, leftTs: String,
                       right: DataFrame, rightTs: String,
                       key: String, within: String,
                       lateness: String = "1 hour"): DataFrame = {
    require(leftTs != rightTs,
      "left and right timestamp columns must have distinct names")
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(r, l(key) === r(key) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"interval $within"))
      .drop(r(key))
  }

  /** Per-key change detection with custom state — the streaming form of
    * the as-of/lag comparison (metatags-has_title_changed): emits one row
    * per arriving record whose value differs from the key's previous
    * value, carrying the previous value as `diff`. */
  final case class KeyedValue(key: String, ts: java.sql.Timestamp, value: String)
  final case class Change(key: String, ts: java.sql.Timestamp,
                          value: String, previous: String)

  def changeDetection(input: Dataset[KeyedValue]): Dataset[Change] = {
    import input.sparkSession.implicits._
    input.groupByKey(_.key)
      .flatMapGroupsWithState[String, Change](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[KeyedValue], state: GroupState[String]) =>
          // state = last seen value; process in ts order within the batch
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.value))
          val out = scala.collection.mutable.ArrayBuffer.empty[Change]
          var last = state.getOption.orNull
          sorted.foreach { r =>
            if (last == null || last != r.value)
              out += Change(key, r.ts, r.value, if (last == null) "" else last)
            last = r.value
          }
          if (last != null) state.update(last)
          out.iterator
      }
  }
}
