package graft.core

import org.apache.spark.sql.SparkSession

/** Session tuning for WIDE-STRING parquet scans — the engine's own
  * guard for the failure the 10M-doc e2e probe hit twice: Spark's
  * vectorized reader sizes its columnar batches in ROWS (default
  * 4096), so a documents table of ~KB texts turns each batch into a
  * multi-MB contiguous allocation, and `maxPartitionBytes` (default
  * 128 MB) lets a single task hold hundreds of MB of live strings
  * through a transform chain. With many reader threads per executor
  * and modest heap-per-core, either one OOMs a scan whose plan is
  * otherwise fine.
  *
  * [[tuneForRowWidth]] is called by the engine's text-scan entry
  * points (curation, BPE encode, the WARC text projection) so the
  * operator carries its own sizing instead of a runbook note. The
  * clamp:
  *  - only ever tightens (a user's explicit smaller setting wins;
  *    a roomy heap leaves the defaults untouched);
  *  - scales with HEAP PER TASK SLOT — on `local[n]`, driver heap / n;
  *    on a cluster, `spark.executor.memory / spark.executor.cores` —
  *    so the same code is a no-op on well-provisioned executors and
  *    engages exactly when bytes-per-core is tight;
  *  - is SCOPED to the operator's eager body ([[withScanSizing]]):
  *    the reader reads the conf at execution time, and the curation
  *    entry points materialize their scans inside the call (staged
  *    checkpoints), so tighten-on-entry / restore-on-exit covers
  *    exactly the wide scans and leaves the rest of the session at
  *    Spark defaults. (A sticky session-wide clamp was measured to
  *    slow UNRELATED narrow scans by 1.3–2× at bench scale — scoping
  *    is load-bearing, not hygiene.)
  *
  * Calibration (probe-derived, `ScaleProbe e2e` at 16 GB / 32 slots =
  * 0.5 GB per slot, ~1.2 KB texts): batch rows clamp to
  * perSlot/256/rowWidth ≈ 1024 (the value that fixed the probe live)
  * and partition bytes to perSlot/16 = 32 MB (ditto).
  */
object WideScan {

  /** Expected bytes per document text for web/training corpora — the
    * width the curation entry points declare when the caller has no
    * better estimate. */
  val DefaultDocBytes: Long = 2048L

  /** Heap available to one concurrent task: local master → driver heap
    * over local parallelism; cluster → executor memory over executor
    * cores (the provisioning knobs a cluster operator actually sets). */
  def heapPerSlotBytes(spark: SparkSession): Long = {
    val sc = spark.sparkContext
    // "local" / "local[*]" ONLY — a `local-cluster[n,c,m]` master runs
    // tasks in real executor JVMs whose memory/cores bound the scan,
    // not the driver heap (a startsWith("local") match would read the
    // driver's heap and leave the clamp off on tight executors)
    if (sc.master == "local" || sc.master.startsWith("local["))
      Runtime.getRuntime.maxMemory / math.max(1, sc.defaultParallelism)
    else {
      val mem = parseBytes(
        spark.conf.get("spark.executor.memory", "1g"), "m")
      val cores = spark.conf.get("spark.executor.cores", "1").toInt
      mem / math.max(1, cores)
    }
  }

  private val batchKey = "spark.sql.parquet.columnarReaderBatchSize"
  private val partKey = "spark.sql.files.maxPartitionBytes"
  // open scopes per session: (depth, prior batch conf, prior partition
  // conf). The conf is SESSION-GLOBAL, so unsynchronized save/restore
  // races under concurrent scoped callers (B captures A's clamp as its
  // "prior" and restores it permanently — the sticky residue scoping
  // exists to prevent). Refcount instead: the FIRST entrant saves the
  // true priors, later entrants only ever TIGHTEN (tuneForRowWidth is
  // only-down, so overlapping widths compose to the tightest), and the
  // LAST exiter restores. While any scope is open other queries on the
  // session run clamped — inherent to a session conf and bounded by
  // the scope, unlike the unsynchronized race's permanent residue.
  private val openScopes = new java.util.IdentityHashMap[
    SparkSession, (Int, Option[String], Option[String])]()

  /** Run `body` with the scan sizing tightened for `rowWidthBytes`,
    * restoring the session's prior values afterwards. The entry-point
    * form: an operator whose wide scans all execute inside the call
    * (curate's staged checkpoints, an ingest transaction) wraps its
    * body and leaves no session-wide residue. Re-entrant and safe
    * under concurrent callers on one session (see [[openScopes]]). */
  def withScanSizing[A](spark: SparkSession,
                        rowWidthBytes: Long = DefaultDocBytes)(body: => A): A =
    withScanSizingTuned(spark, rowWidthBytes, tuneForRowWidth)(body)

  /** [[withScanSizing]] with the tune injectable — the seam that lets
    * the spec pin the throw-unwind contract (Spark validates conf
    * values on set, so a malformed value can't be planted from
    * outside; a future conf type or parse change could still throw
    * here, and the refcount must unwind when it does). */
  private[core] def withScanSizingTuned[A](spark: SparkSession,
      rowWidthBytes: Long,
      tune: (SparkSession, Long) => Unit)(body: => A): A = {
    def restore(key: String, prior: Option[String]): Unit = prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    openScopes.synchronized {
      openScopes.get(spark) match {
        case null =>
          openScopes.put(spark, (1,
            spark.conf.getOption(batchKey), spark.conf.getOption(partKey)))
        case (n, pb, pp) =>
          openScopes.put(spark, (n + 1, pb, pp))
      }
      // if the tune throws (malformed conf value), the body never runs
      // and the finally never arms — unwind the registration HERE, or
      // the scope entry leaks at refcount 1 and the clamp (possibly
      // half-applied) plus saved priors stick for the session
      try tune(spark, rowWidthBytes)
      catch { case t: Throwable =>
        val (n, pb, pp) = openScopes.get(spark)
        if (n == 1) {
          restore(batchKey, pb)
          restore(partKey, pp)
          openScopes.remove(spark)
        } else openScopes.put(spark, (n - 1, pb, pp))
        throw t
      }
    }
    try body
    finally openScopes.synchronized {
      val (n, pb, pp) = openScopes.get(spark)
      if (n == 1) {
        restore(batchKey, pb)
        restore(partKey, pp)
        openScopes.remove(spark)
      } else openScopes.put(spark, (n - 1, pb, pp))
    }
  }

  /** Tighten the vectorized reader batch and the scan partition size
    * for scans whose rows average `rowWidthBytes`. Idempotent;
    * only-down; floors keep pathological widths from degenerating the
    * scan (256 rows / 16 MB). Prefer [[withScanSizing]] — this form
    * leaves the clamp set for the session. */
  def tuneForRowWidth(spark: SparkSession,
                      rowWidthBytes: Long = DefaultDocBytes): Unit = {
    val perSlot = heapPerSlotBytes(spark)
    val rows = math.min(4096L, math.max(256L,
      perSlot / 256 / math.max(1L, rowWidthBytes)))
    val curRows = spark.conf.get(batchKey, "4096").toLong
    if (rows < curRows)
      spark.conf.set(batchKey, rows.toString)
    val partBytes = math.max(16L << 20, perSlot / 16)
    val curPart = parseBytes(spark.conf.get(partKey, "128MB"), "b")
    if (partBytes < curPart)
      spark.conf.set(partKey, partBytes.toString)
  }

  /** "16g" / "512m" / "134217728" / "128MB" → bytes (`defaultUnit` for
    * a bare number — Spark's executor.memory is MiB, byte-typed confs
    * are bytes). */
  private[core] def parseBytes(s: String, defaultUnit: String): Long = {
    val t = s.trim.toLowerCase
    if (t.forall(_.isDigit))
      if (defaultUnit == "m") t.toLong << 20 else t.toLong
    else
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(t)
  }
}
