package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Sketch-accelerated corpus statistics — the operators whose EXACT
  * formulations stop scaling first. At 100 TB the killers are the
  * full-keyspace shuffles: an exact `groupBy(token).count` moves every
  * distinct token through the exchange (billions of keys for a web
  * corpus) even though the consumer wanted only the few thousand heavy
  * ones, and an exact `count_distinct` per group keeps a per-group hash
  * set alive through the aggregation.
  *
  * Two tiers:
  *  - [[heavyHitters]] is sketch-ACCELERATED but EXACT: a count-min
  *    sketch (which only ever over-estimates, so it admits no false
  *    negatives) prunes the shuffle down to candidate keys, and an exact
  *    count over the survivors removes the false positives. Same result
  *    as the naive groupBy — oracle-checkable — at a fraction of the
  *    exchange volume.
  *  - [[approxDistinct]] / [[mergeDistinctSketches]] are approximate by
  *    contract (DataSketches HLL, ±~1% at lgK 12) and buy mergeability:
  *    per-partition/per-day sketches union into any rollup without
  *    re-scanning history — the incremental-distinct path an exact count
  *    cannot offer.
  */
object Sketches {

  /** Exact heavy hitters: every distinct `valueCol` whose row count ≥
    * `threshold`, as (value, cnt) — identical to
    * `groupBy(value).count.filter(_ ≥ threshold)`.
    *
    * Plan: pass 1 folds the corpus into ONE count-min sketch (map-side
    * partial aggregation; the merged sketch is depth×width longs — a
    * bounded single-row control read, ~d·(2e/eps) bytes, not data). Pass
    * 2 re-scans, keeps only rows whose sketch estimate reaches the
    * threshold (estimate ≥ true count always ⇒ every true heavy hitter
    * survives), and exact-counts the survivors. The groupBy exchange
    * carries only candidate rows: true heavy keys + false positives
    * (≈ eps·N collision mass). With eps 1e-4 and a Zipf token table, the
    * shuffle drops from |corpus| rows to the heavy tail only.
    *
    * The estimate probe is a NATIVE codegen expression over the
    * broadcast merged sketch ([[graft.functions.expressions
    * .CmsEstimateGte]]) — one generated call per row on the value's
    * UTF-8 bytes, inside the scan's WholeStageCodegen span. The
    * original Scala-UDF probe was plan-equivalent but paid per-row
    * Tungsten↔JVM conversion over the whole pass-2 scan (the
    * interpreted-fallback genus the ADC kernel measured at ~10×). */
  def heavyHitters(df: DataFrame, valueCol: String, threshold: Long,
                   eps: Double = 1e-4, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val spark = df.sparkSession
    val bytes = df
      .agg(count_min_sketch(col(valueCol).cast("string"),
        lit(eps), lit(confidence), lit(seed)).as("s"))
      .head().getAs[Array[Byte]](0)
    val sketch = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    val bc = spark.sparkContext.broadcast(sketch)
    import graft.functions.expressions.{ColumnBridge, CmsEstimateGte}
    val vals = df.select(col(valueCol).cast("string").as("value"))
    vals
      .filter(ColumnBridge.column(CmsEstimateGte(
        ColumnBridge.expression(col("value")), bc, threshold)))
      .groupBy("value")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }

  /** Per-group approximate distinct count of `valueCol` via DataSketches
    * HLL: (groupCols*, approx_distinct). Approximate by contract —
    * relative error ≈ 1.04/√2^lgK (±1.6% at the default lgK 12) — in
    * exchange for a fixed 2^lgK-byte state per group and mergeability.
    * Rows with a null value are not counted (null is not a member). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col(valueCol).cast("string"), lit(lgK)))
        .as("approx_distinct"))

  /** Bloom-prefiltered EXACT semi join: left rows whose `leftCol` occurs
    * in right's `rightCol` — identical to `left.join(right, ...,
    * "left_semi")`, but the shuffle carries only rows the bloom filter
    * can't refute. The filter is built from the RIGHT side (one
    * aggregation to a driver-held bitset — ~1.2 MB per million expected
    * items at 1% fpp; `expectedItems` is capped so an oversized build
    * fails fast instead of OOMing the driver), broadcast, and applied
    * as a row-local pre-filter; false positives are removed by the real
    * semi join that follows, false negatives don't exist. Use when the
    * left side is huge and mostly non-matching (decontamination
    * membership, late-arriving fact filtering) — the win is the
    * left-side exchange dropping to the candidate mass. Spark's own
    * runtime row-group filters cover simple cases; this form makes the
    * decision explicit and keeps working where AQE declines. */
  def bloomSemiJoin(left: DataFrame, leftCol: String,
                    right: DataFrame, rightCol: String,
                    expectedItems: Long, fpp: Double = 0.01,
                    maxExpectedItems: Long = 100000000L): DataFrame = {
    val pass = bloomMightContain(left.sparkSession, right, rightCol,
      expectedItems, fpp, maxExpectedItems)
    left.filter(pass(col(leftCol)))
      .join(right.select(col(rightCol).cast("string").as("__bsj_k")),
        col(leftCol).cast("string") === col("__bsj_k"), "left_semi")
  }

  /** Bloom-accelerated EXACT anti join: left rows whose `leftCol` does
    * NOT occur in right. The bloom filter's guarantee runs the other
    * way here — "definitely absent" rows bypass the join entirely and
    * only possible members pay the exact anti join; the union of the
    * two paths is exactly the naive anti join. */
  def bloomAntiJoin(left: DataFrame, leftCol: String,
                    right: DataFrame, rightCol: String,
                    expectedItems: Long, fpp: Double = 0.01,
                    maxExpectedItems: Long = 100000000L): DataFrame = {
    val pass = bloomMightContain(left.sparkSession, right, rightCol,
      expectedItems, fpp, maxExpectedItems)
    val definiteMiss = left.filter(!pass(col(leftCol)))
    val candidates = left.filter(pass(col(leftCol)))
      .join(right.select(col(rightCol).cast("string").as("__bsj_k")),
        col(leftCol).cast("string") === col("__bsj_k"), "left_anti")
    definiteMiss.unionByName(candidates)
  }

  /** The row-local membership probe as a NATIVE codegen expression over
    * the broadcast filter (same rationale as the [[heavyHitters]]
    * probe). NULL values probe `false`: null is not a member, so a
    * null-keyed left row is a definite miss for the semi join and a
    * definite keep for the anti join — the UDF forms' semantics. */
  private def bloomMightContain(spark: SparkSession, right: DataFrame,
                                rightCol: String, expectedItems: Long,
                                fpp: Double, maxExpectedItems: Long)
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    require(expectedItems > 0 && expectedItems <= maxExpectedItems,
      s"expectedItems $expectedItems outside (0, $maxExpectedItems] — " +
        "a bigger build side would hold gigabytes on the driver; " +
        "raise maxExpectedItems deliberately or use a plain join")
    val bf = right.select(col(rightCol).cast("string").as("k"))
      .stat.bloomFilter("k", expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    import graft.functions.expressions.{BloomMightContainValue, ColumnBridge}
    (c: org.apache.spark.sql.Column) => ColumnBridge.column(
      BloomMightContainValue(ColumnBridge.expression(c.cast("string")), bc))
  }

  /** Per-group EXACT quantiles via linear interpolation (the
    * quantile_cont definition both Spark's `percentile` and DuckDB
    * share): (groupCols*, <name per requested p>). Exact percentile
    * buffers each group's values — correct at any scale where a single
    * group's values fit an executor (TPC-H-ish groups), and the oracle
    * form for [[approxQuantiles]]. */
  def quantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty, "at least one percentile required")
    val aggs = ps.map { case (name, p) =>
      percentile(col(valueCol), lit(p)).as(name)
    }
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The 100 TB quantile path: `percentile_approx` (Greenwald-Khanna
    * style) — bounded sketch state per group, mergeable partials, rank
    * error ≤ 1/accuracy. Same output shape as [[quantiles]]; approximate
    * by contract (SketchesSpec pins the error bound). */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      ps: Seq[(String, Double)],
                      accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty, "at least one percentile required")
    val aggs = ps.map { case (name, p) =>
      percentile_approx(col(valueCol), lit(p), lit(accuracy)).as(name)
    }
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group HLL sketches as reusable state: (groupCols*, hll) binary.
    * Persist these per ingest batch/day; any later rollup is a
    * [[mergeDistinctSketches]] over the stored rows — no history
    * re-scan. */
  def distinctSketches(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol).cast("string"), lit(lgK)).as("hll"))

  /** Union stored sketches up to a coarser grouping and estimate:
    * (groupCols*, approx_distinct). Folding N batch sketches costs N
    * fixed-size rows, not the N batches' raw data. */
  def mergeDistinctSketches(sketches: DataFrame,
                            groupCols: Seq[String]): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) sketches.groupBy()
      else sketches.groupBy(groupCols.map(col): _*)
    grouped.agg(hll_sketch_estimate(hll_union_agg(col("hll")))
      .as("approx_distinct"))
  }

  /** Persisted, APPENDABLE distinct-count store — the cardinality member
    * of the incremental-store family: each batch folds into one
    * per-group HLL sketch row, and [[estimate]] over the accumulated
    * rows carries the same ±1.04/√2^lgK guarantee as the one-shot
    * [[approxDistinct]] over the union (bit-equal while the sketches
    * are still in exact coupon range — SketchesSpec; once in dense HLL
    * mode the union's estimate may differ from the one-shot's by a
    * fraction of the error bound, which DistinctStoreSpec pins against
    * the EXACT count). Serve cost is #appends × #groups fixed-size rows, never
    * the batches' raw data: the incremental "distinct tokens per
    * source, corpus to date" a 100 TB ingest cannot afford to re-scan
    * for.
    *
    * The [[AppendStore]] idCol slot carries the GROUP column (the store
    * counts values per group); both column names and lgK are store
    * identity — recorded in the transaction ledger on first append and
    * validated on every later one, so sketches of different geometry
    * or meaning never merge.
    *
    * CRASH SEMANTICS: appends are single-table [[graft.sources
    * .StoreTxn]] transactions with the family's commit-record key
    * ledger — [[AppendStore.appendOnce]] redelivery skips completed
    * appends, a mid-append crash rolls back on the next open, and
    * [[graft.streaming.Streaming.appendStoreSink]] gives it the same
    * exactly-once streaming maintenance as IvfStore/GramIndex. */
  final class DistinctStore(spark: SparkSession, root0: String,
                            name: String, lgK: Int = 12,
                            nBaseBuckets: Int = 32) extends AppendStore {
    private val root = new java.io.File(root0).getCanonicalPath
    def storeRoot: String = root
    private val rel = s"state/${name}_hll_sk"
    private val skPath = s"$root/$rel"
    private val baseState = s"${name}_hll_base"
    private val compactKey = s"compact:$name:upto"

    override protected def appendBody(batch: DataFrame, groupCol: String,
                                      valueCol: String): Unit = {
      val txn = graft.sources.StoreTxn.current(root)
      // store identity: first append fixes (groupCol, valueCol, lgK)
      val want = s"$groupCol,$valueCol,$lgK"
      graft.sources.StoreTxn.getKv(root, s"param:$name:distinct") match {
        case Some(have) => require(have == want,
          s"DistinctStore '$name' was created with ($have), got ($want)")
        case None => txn.putKv(s"param:$name:distinct", want)
      }
      txn.touchPath(rel)
      // one DELTA DIRECTORY per append, named by the transaction epoch:
      // compaction can then fold "every delta ≤ E" and record E, instead
      // of trying to delete files an undo could never restore
      distinctSketches(batch, Seq(groupCol), valueCol, lgK)
        .write.mode("overwrite").parquet(s"$skPath/a${txn.epoch}")
    }

    /** Delta dirs currently visible, with their epochs; `liveOnly` drops
      * those already folded into the base. */
    private def deltaDirs(liveOnly: Boolean): Seq[(Long, String)] = {
      val upto = graft.sources.StoreTxn.getKv(root, compactKey)
        .map(_.toLong).getOrElse(-1L)
      val dir = new java.io.File(skPath)
      Option(dir.listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("a"))
        .flatMap(f => f.getName.stripPrefix("a").toLongOption
          .map(e => (e, f.getPath)))
        .filter { case (e, _) => !liveOnly || e > upto }
        .sortBy(_._1)
    }

    private def sketchRows(): DataFrame = {
      graft.sources.StoreTxn.recoverIfIdle(spark, root)
      val base = graft.sources.StoreTxn.stateDir(root, baseState).toSeq
      val paths = base ++ deltaDirs(liveOnly = true).map(_._2)
      require(paths.nonEmpty,
        s"DistinctStore '$name' at $root has no appends — append before estimating")
      spark.read.parquet(paths: _*)
    }

    /** Per-group estimate over everything appended so far:
      * (groupCol, approx_distinct). */
    def estimate(): DataFrame = {
      val rows = sketchRows()
      val param = graft.sources.StoreTxn.getKv(root, s"param:$name:distinct")
      mergeDistinctSketches(rows, Seq(param.get.split(',')(0)))
    }

    /** Whole-store estimate: one (approx_distinct) row. */
    def estimateTotal(): DataFrame =
      mergeDistinctSketches(sketchRows(), Seq.empty)

    /** Fold the base and every visible delta into ONE sketch row per
      * group, published as a fresh base version — the maintenance pass
      * that keeps an always-on sink's serve cost flat instead of
      * growing with stream age (#appends × #groups rows → #groups
      * rows). Runs as one transaction: the new base version publishes
      * atomically with the fold watermark, a crash mid-compact rolls
      * back to the old base + deltas, and a blind retry converges.
      * Folded delta directories are physically removed only AFTER the
      * commit (they are logically dead the instant the watermark
      * publishes; a crash between commit and cleanup leaves inert
      * directories the next compact removes). Estimates are unchanged
      * by construction — HLL union is associative. */
    def compact(spark: SparkSession): Unit = compact() // AppendStore form
    def compact(): Unit = {
      graft.sources.StoreTxn.recoverIfIdle(spark, root)
      val folded = scala.collection.mutable.Buffer.empty[String]
      graft.sources.StoreTxn.transact(spark, root) {
        val param = graft.sources.StoreTxn.getKv(root, s"param:$name:distinct")
        require(param.isDefined,
          s"DistinctStore '$name' at $root has no appends — nothing to compact")
        val gcol = param.get.split(',')(0)
        val deltas = deltaDirs(liveOnly = true)
        if (deltas.nonEmpty) {
          val txn = graft.sources.StoreTxn.current(root)
          val base = graft.sources.StoreTxn.stateDir(root, baseState).toSeq
          val merged = spark.read
            .parquet((base ++ deltas.map(_._2)): _*)
            .groupBy(col(gcol))
            .agg(hll_union_agg(col("hll")).as("hll"))
          val outDir = txn.stateVersionDir(baseState)
          // group-partitioned base write, like every other store's
          // compactor: a per-URL/per-host store has millions of groups
          // × 2^lgK-byte sketches — coalesce(1) would funnel GBs
          // through a single writer task. Small stores still produce
          // few files (empty partitions emit none).
          merged.repartition(nBaseBuckets, col(gcol))
            .write.mode("overwrite").parquet(outDir)
          txn.putKv(compactKey, deltas.map(_._1).max.toString)
          folded ++= deltas.map(_._2)
        }
      }
      // post-commit physical cleanup of logically-dead delta dirs; also
      // sweep any dirs a previous compact's crash-after-commit left
      val upto = graft.sources.StoreTxn.getKv(root, compactKey)
        .map(_.toLong).getOrElse(-1L)
      (folded ++ deltaDirs(liveOnly = false)
        .filter(_._1 <= upto).map(_._2)).distinct.foreach { p =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(p))
      }
    }
  }
}
