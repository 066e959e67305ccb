package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** The composed end-to-end curation pipeline for training text — the
  * artifact the LLM-data tier exists for. Every stage is an operator that
  * is individually oracle-verified (q17/q61/q62/q63/q19/q34/q64); this
  * operator pins their COMPOSITION: stage order, column contracts, and
  * the survivor accounting, which is where pipelines actually break
  * (a redaction after fingerprinting, a dedup before decontamination —
  * both silently change the corpus).
  *
  * Stage order and why:
  *  1. quality + repetition filters — row-local, cheapest, run first so
  *     every later stage touches fewer rows; one scan computes both
  *     scores from a single tokenization.
  *  2. PII redaction — BEFORE any content hashing, so two docs equal up
  *     to their PII dedup as the same document (and no raw PII survives
  *     into the kept corpus or the signature stores).
  *  3. benchmark decontamination — n-gram overlap with an eval set, on
  *     the redacted text (same text later stages see).
  *  4. exact dedup — min-id keep per identical text; removes the free
  *     wins before the (costlier) near-dup sketch runs.
  *  5. near-dup dedup — MinHash-LSH pairs → connected components →
  *     keep the min-id doc per component.
  *
  * Scale shape: stages 1–4 are one linear scan plus the decontamination
  * semi-join (eval side distinct + broadcastable); the exact-dedup
  * output is materialized ONCE (localCheckpoint) because three
  * consumers read it — the signature branch, the verification branch,
  * and the final keep join. At warehouse scale, pass `stage` to swap the
  * checkpoint for a staging-table write (same contract: a materialized,
  * re-readable frame).
  */
object Pipeline {

  /** Shared guard: curation ids must be integral (connected components
    * needs integral labels, and a string id would make min-casts read
    * null and silently no-op). One definition for the store AND the
    * streaming wrapper so they can never disagree on accepted schemas. */
  private[graft] def requireIntegralId(schema: org.apache.spark.sql.types.StructType,
                                       idCol: String, context: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$context id column '$idCol' must be integral, got $dt")
  }

  /** The quality / repetition pass predicates over a scored frame —
    * ONE definition, used both to filter (preFilter) and to account
    * (curate's stage counts); a second copy could silently drift.
    * Null-safe: a doc whose score is null (null text scores null) FAILS
    * the gate rather than evaluating to SQL null — without the
    * coalesce, both `filter(qPass)` and the audit's `filter(!qPass)`
    * exclude the row and it vanishes from kept AND ledger, breaking the
    * audit's partition invariant. */
  private def qPass(cfg: CurateConfig) =
    coalesce(col("__q") >= cfg.minQuality, lit(false))
  private def rPass(cfg: CurateConfig) =
    coalesce(col("__rep") <= cfg.maxRepetition, lit(false))

  /** Thresholds and sketch parameters for [[curate]]. Defaults match the
    * oracle-verified per-stage queries; tune per corpus. */
  final case class CurateConfig(
      minQuality: Double = 0.42,
      maxRepetition: Double = 0.06,
      repN: Int = 2,
      deconN: Int = 5,
      // surgical decontamination: instead of DROPPING every doc that
      // shares an eval n-gram (the default, strictest policy), EXCISE
      // the overlapping token spans and keep the remainder — at corpus
      // scale, a doc quoting one benchmark question is volume worth
      // keeping. Docs whose text empties are dropped; untouched docs
      // keep their exact bytes (no whitespace renormalization). Still a
      // pure per-doc function of the static eval set, so the batch and
      // incremental forms stay observationally equal.
      surgicalDecon: Boolean = false,
      minhash: MinhashConfig =
        MinhashConfig(shingleN = 3, bands = 8, rowsPerBand = 2,
          threshold = 0.5),
      // pluggable quality stage: (text, tokens) → score, gated by
      // minQuality exactly like the default heuristic — the hook a
      // TRAINED scorer plugs into
      // ([[QualityModels.perceptronQuality]] adapts a trained dense
      // perceptron; any row-local Column program qualifies). Must be a
      // pure per-row function so the batch and incremental forms stay
      // observationally equal; null scores fail the gate and land in
      // the audit ledger as quality drops, like every other score.
      qualityExpr: Option[(Column, Column) => Column] = None)

  /** `kept` is the curated corpus (id, text — text REDACTED);
    * `stageCounts` is the per-stage survivor accounting (empty unless
    * requested — each count is an extra action); `audit` (present iff
    * `withAudit`) is the drop ledger: one row per REMOVED document,
    * (id, stage, kept_id) where `stage` names the first pipeline stage
    * that dropped it (quality | repetition | decontaminate | exact_dup
    * | near_dup) and `kept_id` is the surviving document that superseded
    * it (dedup stages only; null for the filters). `kept.ids ∪ audit.ids`
    * partitions the input ids — every document is either in the corpus
    * or in the ledger with a reason, which is the provenance question
    * ("where did my document go") a 100 TB curation run gets asked. */
  final case class CurateResult(kept: DataFrame,
                                stageCounts: Seq[(String, Long)],
                                audit: Option[DataFrame] = None)

  /** [[preFilter]]'s product: the decontaminated (id, text) frame, the
    * scored frame (pass-flag accounting), and the ids the
    * decontamination stage removed outright (lazy plans — they cost
    * nothing unless acted on). */
  private[operators] final case class PreFiltered(decon: DataFrame,
                                                  scored: DataFrame,
                                                  deconDropped: DataFrame)

  /** Stages 1–3 (quality + repetition filter, PII redaction,
    * decontamination) as a (id, redacted text) frame — row-local against
    * a static eval set, so shared verbatim by the batch [[curate]] and
    * the incremental [[CurationStore]]. `scored` (with the pass flags)
    * is returned alongside for the survivor accounting.
    *
    * `stageForAudit` materializes the two frames the AUDIT arms re-read
    * (the scored frame and the decontamination drop ids): without it,
    * each audit arm re-runs the tokenize→score scan (quality and
    * repetition arms) and the eval-gram join (decontaminate arm) —
    * measured as the dominant re-execution in an audited ingest. The
    * staged scored frame also serves the redaction input and the
    * survivor accounting, so the expensive per-row scoring runs exactly
    * once per audited run. Unaudited runs skip both stagings (the arms
    * are never acted on — staging would be pure cost). */
  private[operators] def preFilter(docs: DataFrame, idCol: String,
      textCol: String, evalTexts: Option[DataFrame], evalTextCol: String,
      cfg: CurateConfig, stage: DataFrame => DataFrame,
      stageForAudit: Boolean = false)
      : PreFiltered = {
    // the pipeline's per-row work (tokenize → score → redact → excise)
    // is the expensive part, and a SMALL corpus often arrives as one
    // parquet file = one scan partition, serializing all of it on one
    // core while 31 idle (measured: 4s single-threaded for 5k docs at
    // sf0.1). Widen tight layouts up to the session's parallelism — a
    // driver-side branch on the plan's partition count, so a
    // warehouse-scale input (partitions >> cores) keeps its layout and
    // pays no exchange. The widened frame is materialized EAGERLY:
    // a bare repartition is porous (Catalyst pushes the deterministic
    // score filter below the exchange, right back onto the one-task
    // scan — measured, the whole win disappears); the checkpoint is a
    // real barrier, and at ≤ a few MB it costs nothing.
    // TWO gates, both driver-side metadata reads: partition count (the
    // serialization symptom) AND the optimizer's size estimate (the
    // same stats read BigQueryWarehouse.load sizes its route by). A
    // few-partition input is NOT always small — non-splittable
    // compressed files, or a frame coalesced upstream, can carry many
    // GB in two partitions, and eagerly checkpointing those would
    // materialize the lot to executor memory/disk where the stage
    // pipeline streams. Above the cap, keep the layout: the per-row
    // work is slower on few cores but never explodes storage.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val srcParts = docs.rdd.getNumPartitions
    val estBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    val widened = if (srcParts < math.min(par, 32) &&
        estBytes <= BigInt(256L << 20))
      docs.repartition(par).localCheckpoint(true)
    else docs
    val base = widened.select(col(idCol).as("id"), col(textCol).as("text"))
    // one tokenization feeds both scores (lambda-capture rule: tokens
    // bound to a column first, scores staged off it)
    val scoredRaw = base
      .select(col("id"), col("text"),
        TextFunctions.tokens(col("text")).as("__toks"))
      .select(col("id"), col("text"),
        cfg.qualityExpr
          .map(f => f(col("text"), col("__toks")))
          .getOrElse(TextFunctions.qualityScoreFromTokens(col("text"),
            col("__toks")))
          .as("__q"),
        TextFunctions.duplicateNgramFraction(col("__toks"), cfg.repN)
          .as("__rep"))
    val scored = if (stageForAudit) stage(scoredRaw) else scoredRaw
    val redactedRaw = scored
      .filter(qPass(cfg) && rPass(cfg))
      .select(col("id"), TextFunctions.redactPii(col("text")).as("text"))
    // decontamination reads the redacted corpus TWICE (the n-gram side
    // of the contamination join and the anti-join left side) — stage it
    // first or the tokenize→score→redact chain runs twice per action
    val redacted =
      if (evalTexts.isDefined) stage(redactedRaw) else redactedRaw
    val (decon, deconDropped) = evalTexts match {
      case Some(ev) if cfg.surgicalDecon =>
        // minSpan = n: every shared gram is excised, so the REMOVED text
        // is exactly what the drop policy would have flagged. Untouched
        // docs bypass the excision (anti-join) so their bytes are
        // identical to the non-surgical path's survivors.
        // the span plan (positioned gram hashes + eval semi-join +
        // island-merge window) is read three times below — spanIds'
        // semi-join, the excision span side, spanIds' anti-join — so
        // stage it like `redacted`, or it re-executes per reference
        val spans = stage(Decontamination.contaminationSpans(redacted, "id",
          "text", ev, evalTextCol, cfg.deconN, minSpan = cfg.deconN))
        val spanIds = spans.select("id").distinct()
        val excised = Dedup.exciseSpans(
            redacted.join(spanIds, Seq("id"), "left_semi"), "id", "text",
            spans)
          .filter(length(col("text")) > 0)
          .select("id", "text")
        // dropped = docs whose every token sat inside an excised span
        // (the excision emptied them) — flagged docs minus the excised
        // survivors
        val dropped = spanIds.join(excised.select("id"), Seq("id"), "left_anti")
        (redacted.join(spanIds, Seq("id"), "left_anti")
          .unionByName(excised), dropped)
      case Some(ev) =>
        // audited runs read the flagged ids TWICE (the anti-join here
        // and the ledger's decontaminate arm) — stage the ids-only
        // frame so the eval-gram join runs once
        val contaminatedRaw = Decontamination.contaminatedIds(redacted,
          "id", "text", ev, evalTextCol, cfg.deconN)
        val contaminated =
          if (stageForAudit) stage(contaminatedRaw) else contaminatedRaw
        (redacted.join(contaminated, Seq("id"), "left_anti"), contaminated)
      case None => (redacted, redactedRaw.select("id").limit(0))
    }
    PreFiltered(decon, scored, deconDropped)
  }

  /** Host-reputation gate for [[curate]] / [[CurationStore]]: keep only
    * documents whose `keyCol` value is a node the link graph promotes —
    * rank_fp strictly above `minRankFp` in `ranks`, a PRECOMPUTED
    * [[Graph.pageRank]] output (compute the ranks once per crawl epoch,
    * amortized across every curation run, the [[Graph.authorityGate]]
    * contract). Dropped docs land in the audit ledger under stage
    * "authority" with no winner — the provenance answer for "where did
    * my host go". Like `evalTexts`, the ranks table is STATIC input, so
    * gating stays a pure per-doc predicate and the batch ≡ incremental
    * curation contract is preserved; the comparison runs on the exact
    * fixed-point rank, so the kept set is deterministic. The gate runs
    * FIRST — a reputation drop is the cheapest filter in the chain (an
    * ids-only semi-join, no tokenization), so at crawl scale it should
    * shed whole hosts before any per-row text work. */
  final case class AuthorityGate(ranks: DataFrame, keyCol: String,
                                 minRankFp: Long) {
    private[operators] def promoted: DataFrame =
      ranks.filter(col("rank_fp") > minRankFp)
        .select(col("node").as(keyCol))
    private[operators] def keep(docs: DataFrame): DataFrame =
      docs.join(promoted, Seq(keyCol), "left_semi")
    private[operators] def droppedIds(docs: DataFrame,
                                      idCol: String): DataFrame =
      docs.join(promoted, Seq(keyCol), "left_anti")
        .select(col(idCol).as("id"))
  }

  /** Run the full curation pipeline over `docs`. Ids must be integral
    * and unique (connected components requires integral labels).
    * `evalTexts` enables the decontamination stage; `withCounts` adds
    * the survivor accounting (three extra jobs: one aggregate over the
    * scored scan, one count of the decontaminated set, one of the kept
    * set — the exact-dedup count is free off the checkpoint);
    * `authority` prepends the host-reputation stage (see
    * [[AuthorityGate]] — `docs` must then carry its key column). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             evalTexts: Option[DataFrame] = None,
             evalTextCol: String = "text",
             cfg: CurateConfig = CurateConfig(),
             withCounts: Boolean = false,
             withAudit: Boolean = false,
             stage: DataFrame => DataFrame = _.localCheckpoint(true),
             authority: Option[AuthorityGate] = None)
      : CurateResult =
    // the pipeline's transforms are string-heavy over ~KB texts; size
    // the scan batches to heap-per-slot FOR THIS CALL (the staged
    // checkpoints execute every wide scan inside it) and restore after
    graft.core.WideScan.withScanSizing(docs.sparkSession) {
    val gated = authority.map(_.keep(docs)).getOrElse(docs)
    val pf = preFilter(gated, idCol, textCol, evalTexts, evalTextCol, cfg,
      stage, stageForAudit = withAudit)
    val scored = pf.scored
    // the audit's exact-dup loser scan is a second read of the
    // decontaminated frame — materialize it once rather than re-running
    // the redaction/anti-join chain per consumer
    val decon = if (withAudit) stage(pf.decon) else pf.decon
    // audited: one staged ids-only hash window serves BOTH the exact
    // keep set and the loser arm (see Dedup.exactIdWindow — the text
    // column stays out of the window shuffle and the hashing runs once)
    val exactHashed =
      if (withAudit) Some(stage(Dedup.exactIdWindow(decon, "id", "text")))
      else None
    val exact = stage(exactHashed match {
      case Some(h) => decon.join(
        h.filter(col("__rn") === 1).select("id"), Seq("id"), "left_semi")
      case None => Dedup.exact(decon, "id", "text")
    })
    val mh = cfg.minhash
    // the near-dup plan reads its tokenize→shingle→hash staging three
    // times (banding + both verification joins) — materialize the
    // combined (id, mins, hset) pass once and let the pair plan read it
    val mhStaged = stage(Dedup.minhashCombined(exact, "id", "text",
      mh.shingleN, mh.bands, mh.rowsPerBand, mh.seed))
    val pairs = Dedup.minhashPortablePairsFrom(mhStaged, mh.bands,
      mh.rowsPerBand, mh.threshold, mh.maxBucket)
    // pairs → clusters → keep the min-id doc per near-dup component
    // (comp IS the component's min id, so "drop" = label rows where
    // comp < id; docs in no pair never appear in labels and are kept)
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val kept = exact.join(
      labels.filter(col("comp") < col("id")).select("id"),
      Seq("id"), "left_anti")
    val counts =
      if (!withCounts) Nil
      else {
        // one aggregate scan covers gate survivors + both filter
        // stages; the decon count re-runs only the staged-redacted
        // anti-join; the exact and kept counts read checkpointed frames
        val qr = scored.agg(
          count(lit(1)).as("nin"),
          count(when(qPass(cfg), lit(1))).as("nq"),
          count(when(qPass(cfg) && rPass(cfg), lit(1))).as("nr")).head()
        val nDec = decon.count()
        val nEx = exact.count()
        val nKept = kept.count()
        // with an authority gate, "input" is the PRE-gate count (one
        // extra job) and the scored scan's row count becomes the gate's
        // survivor line — every stage still reads "rows surviving it"
        val head = authority match {
          case Some(_) => Seq("input" -> docs.count(),
            "authority" -> qr.getLong(0))
          case None => Seq("input" -> qr.getLong(0))
        }
        head ++ Seq("quality" -> qr.getLong(1),
          "repetition" -> qr.getLong(2), "decontaminate" -> nDec,
          "exact_dedup" -> nEx, "near_dedup" -> nKept)
      }
    val audit =
      if (!withAudit) None
      else {
        val idType = decon.schema("id").dataType
        val noWinner = lit(null).cast(idType).as("kept_id")
        def row(ids: DataFrame, stageName: String) = ids
          .select(col("id"), lit(stageName).as("stage"), noWinner)
        // each doc appears at most once: every arm filters on "survived
        // all earlier stages" by construction (the pipeline is a chain)
        val authorityDropped = authority match {
          case Some(a) => row(a.droppedIds(docs, idCol), "authority")
          case None => row(scored.select("id").limit(0), "authority")
        }
        val qualityDropped = row(scored.filter(!qPass(cfg)), "quality")
        val repDropped =
          row(scored.filter(qPass(cfg) && !rPass(cfg)), "repetition")
        val deconDropped = row(pf.deconDropped, "decontaminate")
        val exactDropped = exactHashed.get.filter(col("__rn") > 1)
          .select(col("id"), lit("exact_dup").as("stage"),
            col("__win").cast(idType).as("kept_id"))
        val nearDropped = labels.filter(col("comp") < col("id"))
          .select(col("id"), lit("near_dup").as("stage"),
            col("comp").cast(idType).as("kept_id"))
        Some(authorityDropped.unionByName(qualityDropped)
          .unionByName(repDropped)
          .unionByName(deconDropped).unionByName(exactDropped)
          .unionByName(nearDropped))
      }
    CurateResult(kept, counts, audit)
    }

  /** One ingest's delta: `kept` = batch docs entering the curated corpus
    * (id, redacted text); `retracted` = ids of PREVIOUSLY kept docs that
    * lost their component-minimum status because the batch's pairs
    * merged their component with a lower-id one. The curated corpus
    * after n ingests is ∪ keptᵢ − ∪ retractedᵢ (retraction is monotone:
    * component minima only decrease). */
  /** `audit` (present iff the ingest requested it): the batch's drop
    * ledger — one row (id, stage, kept_id) per batch document the ingest
    * did NOT keep, same stage vocabulary as [[CurateResult.audit]].
    * `kept_id` is the PROXIMATE winner at drop time: for an in-batch
    * exact dup the batch's min-id copy, for a store-known text the id
    * that first ingested it, for a near-dup the component minimum as of
    * this ingest. Following kept_id chains across ingests reaches the
    * ultimate survivor; retractions of PREVIOUS batches' winners are the
    * `retracted` half, not audit rows. batch ids = kept ∪ audit ids
    * (disjoint), per ingest. */
  final case class CurateDelta(kept: DataFrame, retracted: DataFrame,
                               audit: Option[DataFrame] = None)

  /** Incremental curation — the production form of [[curate]]: per-batch
    * ingest against persisted state instead of a full-corpus recompute.
    * State under `root` (all ids + hashes + labels, never raw text
    * beyond the redacted survivors' shingle hashes):
    *
    *  - an exact-dedup hash store (128-bit text hash pairs, bucketed) —
    *    membership = "an identical doc was already kept";
    *  - a [[MinhashStore]] over the exact survivors — near-dup pairs of
    *    each batch against everything curated so far;
    *  - the current (id, comp) component labels and the survivor id
    *    list, updated by [[Dedup.connectedComponentsIncremental]].
    *
    * CONTRACT: batch ids strictly increase across ingests (enforced) —
    * that makes "first ingested" and "min id" agree, so the kept set
    * after any prefix of ingests equals [[curate]] on the union of those
    * batches (oracle-verified, q70). Retractions are REAL under this
    * contract: a new doc can bridge two earlier components, dethroning
    * the higher-id component's winner — consumers must apply both halves
    * of the delta.
    *
    * CRASH SEMANTICS: one ingest performs several state writes (hash
    * store, signature store, labels, survivors, max-id marker) — all of
    * them inside ONE [[graft.sources.StoreTxn]] transaction, including
    * the embedded [[MinhashStore.ingest]] (which joins the enclosing
    * transaction rather than committing its own). The component labels
    * are written as a versioned state directory and the max-id marker
    * rides in the commit record itself, so "marker advanced" IS "ingest
    * committed". A crash anywhere mid-ingest rolls back on the next
    * open and a blind retry converges — no external snapshot-restore
    * discipline, no duplicated signatures. */
  final class CurationStore(spark: org.apache.spark.sql.SparkSession,
                            root: String, name: String,
                            cfg: CurateConfig = CurateConfig(),
                            evalTexts: Option[DataFrame] = None,
                            evalTextCol: String = "text",
                            authority: Option[AuthorityGate] = None,
                            stage: DataFrame => DataFrame =
                              _.localCheckpoint(true)) {
    private val wh = new graft.sources.Warehouse(spark, root)
    private[graft] def storeRoot: String = root
    private val mh = new MinhashStore(wh, s"${name}_cur", cfg.minhash)
    private val exactSpec = StoreCompaction.TableSpec(
      s"active:$name:cur_exact", s"${name}_cur_exact", Seq("__h1", "__h2"),
      // compaction doubles as the schema upgrade for stores created
      // before the owner-id column: backfill a null owner so post-
      // compact ingests append the full 3-column row again
      transform = df =>
        if (df.columns.contains("id")) df
        else df.withColumn("id", lit(null).cast("long")))
    private def exactTable = StoreCompaction.active(root, exactSpec)
    private val labelsState = s"${name}_labels"
    private val survivorsPath = s"$root/state/${name}_survivors"
    // survivors fold lives as VERSIONED state once compacted (a fixed
    // append path cannot be rewritten transactionally); reads and
    // appends resolve the committed version, falling back to the
    // original append path before the first compact
    private val survivorsState = s"${name}_survivors_fold"
    private def survivorsLoc: (String, String) = // (path, root-relative)
      graft.sources.StoreTxn.stateVersion(root, survivorsState) match {
        case Some(v) =>
          (s"$root/state/$survivorsState/v$v", s"state/$survivorsState/v$v")
        case None => (survivorsPath, s"state/${name}_survivors")
      }
    private val maxIdKey = s"${name}_maxid"

    /** Highest id any COMMITTED ingest has seen (None before the first).
      * The marker lives in the transaction's commit record, so it is
      * readable iff the WHOLE ingest published — the "did that ingest
      * finish?" signal the streaming wrapper
      * ([[graft.streaming.Streaming.curateBatch]]) keys its redelivery
      * skip on. */
    def maxIngestedId: Option[Long] =
      graft.sources.StoreTxn.getKv(root, maxIdKey).map(_.toLong)

    /** `beforeCommit` runs with the materialized delta AFTER all delta
      * computation but BEFORE the ingest's transaction commits. A sink
      * that persists the delta there is durable before the max-id
      * marker publishes (the marker IS part of the commit record), so
      * "marker advanced" implies "delta landed" — the property the
      * streaming wrapper's redelivery skip relies on. Failures inside
      * `beforeCommit` roll the whole ingest back like any other
      * mid-ingest failure. */
    def ingest(batch: DataFrame, idCol: String, textCol: String,
               beforeCommit: CurateDelta => Unit = _ => (),
               withAudit: Boolean = false)
        : CurateDelta = {
      import spark.implicits._
      Pipeline.requireIntegralId(batch.schema, idCol, "CurationStore")
      // roll back any crashed prior ingest BEFORE the orphan scan below:
      // its partial artifacts are legitimate rollback targets, not
      // orphans, and must not trip the no-commit-record check on a
      // blind retry
      graft.sources.StoreTxn.recoverIfIdle(spark, root)
      // id-monotonicity guard — a violation would silently flip exact-
      // dedup winners (store membership means "first ingested", the
      // full-corpus semantics mean "min id"; the contract makes them agree)
      val bounds = batch.agg(min(col(idCol)).cast("long"),
        max(col(idCol)).cast("long")).head()
      if (bounds.isNullAt(0)) // empty batch: nothing to do, state untouched
        return CurateDelta(spark.emptyDataset[(Long, String)]
          .toDF("id", "text"), spark.emptyDataset[Long].toDF("id"),
          if (withAudit) Some(spark.emptyDataset[(Long, String, Option[Long])]
            .toDF("id", "stage", "kept_id"))
          else None)
      val prevMax = maxIngestedId.getOrElse {
        // no committed ingest on record — any existing store artifact
        // is then an orphan: a pre-transactional (legacy) layout or a
        // corrupted root. Trusting "never ingested" would re-append
        // its exact hashes and signatures (the double-posting the
        // marker exists to prevent) and reset every component label,
        // so refuse instead of silently starting over on top of it.
        val orphans = Seq(
          survivorsPath,
          s"$root/state/${name}_maxid",
          s"$root/state/$labelsState",
          s"$root/warehouse/${exactSpec.base}",
          s"$root/warehouse/${name}_cur_mh_sig")
          .filter(p => new java.io.File(p).exists())
        require(orphans.isEmpty,
          s"CurationStore '$name' at $root has store artifacts but no " +
            s"committed ingest record (${orphans.mkString(", ")}) — a " +
            "pre-transactional store cannot be ingested over; rebuild " +
            "under a fresh root (or restore this one from snapshot)")
        Long.MinValue
      }
      require(bounds.getLong(0) > prevMax,
        s"batch ids must exceed all previously ingested ids " +
          s"(batch min ${bounds.getLong(0)} <= store max $prevMax)")

      // wide-string scans all execute inside the transaction's staged
      // materializations — tighten scan sizing for the call, restore after
      graft.core.WideScan.withScanSizing(spark) {
      graft.sources.StoreTxn.transact(spark, root) {
      val txn = graft.sources.StoreTxn.current(root)
      // host-reputation gate first (the curate ordering): the ranks are
      // static input like evalTexts, so the batch ≡ full-corpus
      // equivalence survives — every batch is gated by the same
      // predicate the one-shot run applies
      val gatedBatch = authority.map(_.keep(batch)).getOrElse(batch)
      val pf =
        preFilter(gatedBatch, idCol, textCol, evalTexts, evalTextCol, cfg,
          stage, stageForAudit = withAudit)
      // the audit's exact-loser pass re-reads the decontaminated frame —
      // materialize it once rather than re-running the redaction chain
      val decon = if (withAudit) stage(pf.decon) else pf.decon
      // exact dedup vs the hash store: in-batch winner per 128-bit text
      // hash, then membership anti-join (bucketed on the hash pair, so
      // the store side never shuffles). Hash-only membership carries the
      // same negligible collision odds as Dedup.exact(verify = false).
      // AUDITED runs stage ONE ids-only hash window
      // ([[Dedup.exactIdWindow]]) that serves the batch winners, the
      // in-batch loser arm AND the store-dup arm — the old shape re-ran
      // the hash+window (with the text column in the window shuffle)
      // once per consumer.
      val exactHashed =
        if (withAudit) Some(stage(Dedup.exactIdWindow(decon, "id", "text")))
        else None
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("__h1", "__h2").orderBy(col("id"))
      val batchWinners = exactHashed match {
        case Some(h) => decon.join(
          h.filter(col("__rn") === 1).select("id", "__h1", "__h2"),
          Seq("id"))
        case None => decon
          .withColumn("__h1", xxhash64(col("text")))
          .withColumn("__h2", xxhash64(lit(0x9e3779b9L), col("text")))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
      val storeExact =
        if (wh.exists(exactTable)) Some(wh.readBucketed(exactTable))
        else None
      val fresh = stage(storeExact match {
        case Some(st) =>
          batchWinners.join(st, Seq("__h1", "__h2"), "left_anti")
        case None => batchWinners
      })
      val survivors = fresh.select("id", "text")
      // near-dup pairs of the batch survivors vs everything curated —
      // the embedded store's ingest JOINS this transaction (same root).
      // Its two signature-table appends depend only on the staged batch
      // frames and nothing below reads those tables, so they run on a
      // FORKED thread under the label/delta work and join before
      // commit; the failure path joins too (a rollback must never race
      // a still-running append — the Par.fork contract)
      val (pairs, mhAppend) = mh.ingestParts(survivors, "id", "text")
      val joinMhAppend = graft.core.Par.fork(mhAppend())
      try {
      val prevLabels =
        graft.sources.StoreTxn.stateDir(root, labelsState) match {
          case Some(p) => spark.read.parquet(p)
          case None    => spark.emptyDataset[(Long, Long)].toDF("id", "comp")
        }
      val labels = Dedup.connectedComponentsIncremental(prevLabels, pairs,
        "id_a", "id_b") // internally checkpointed — safe to version below
      val nowDropped = labels.filter(col("comp") < col("id")).select("id")
      val prevDropped = prevLabels.filter(col("comp") < col("id")).select("id")
      val (survDir, survRel) = survivorsLoc
      val oldSurvivors =
        if (new java.io.File(survDir).exists())
          spark.read.parquet(survDir)
        else spark.emptyDataset[Long].toDF("id")
      // deltas materialized BEFORE the state writes below — their plans
      // read the state paths this ingest is about to replace/extend
      val keptPlan = survivors
        .join(nowDropped, Seq("id"), "left_anti")
      val retractedPlan = oldSurvivors
        .join(nowDropped, Seq("id"), "left_semi")
        .join(prevDropped, Seq("id"), "left_anti")
      // the ledger must materialize BEFORE the state writes too: the
      // store-dup arm reads the pre-append exact table, the near-dup arm
      // this ingest's labels — both replaced by the writes below
      val auditPlan =
        if (!withAudit) None
        else {
          def ledger(ids: DataFrame, stageName: String) = ids
            .select(col("id").cast("long").as("id"),
              lit(stageName).as("stage"),
              lit(null).cast("long").as("kept_id"))
          val inBatchDup = exactHashed.get.filter(col("__rn") > 1)
            .select(col("id").cast("long").as("id"),
              lit("exact_dup").as("stage"),
              col("__win").cast("long").as("kept_id"))
          val storeDup = storeExact match {
            case Some(st) =>
              // pre-owner-column stores (no id recorded) audit with a
              // null winner rather than failing the read
              val owned =
                if (st.columns.contains("id")) st
                else st.withColumn("id", lit(null).cast("long"))
              exactHashed.get.filter(col("__rn") === 1)
                .select(col("id"), col("__h1"), col("__h2"))
                .join(owned.select(col("__h1"), col("__h2"),
                  col("id").as("__owner")), Seq("__h1", "__h2"))
                .select(col("id").cast("long").as("id"),
                  lit("exact_dup").as("stage"),
                  col("__owner").cast("long").as("kept_id"))
            case None => spark.emptyDataset[(Long, String, Option[Long])]
              .toDF("id", "stage", "kept_id")
          }
          val nearDup = labels.filter(col("comp") < col("id"))
            .join(survivors.select("id"), Seq("id"), "left_semi")
            .select(col("id").cast("long").as("id"),
              lit("near_dup").as("stage"),
              col("comp").cast("long").as("kept_id"))
          val authorityRows = authority match {
            case Some(a) => ledger(a.droppedIds(batch, idCol), "authority")
            case None => ledger(pf.scored.select("id").limit(0), "authority")
          }
          Some(authorityRows
            .unionByName(ledger(pf.scored.filter(!qPass(cfg)), "quality"))
            .unionByName(
              ledger(pf.scored.filter(qPass(cfg) && !rPass(cfg)),
                "repetition"))
            .unionByName(ledger(pf.deconDropped, "decontaminate"))
            .unionByName(inBatchDup).unionByName(storeDup)
            .unionByName(nearDup))
        }
      // the three delta materializations read only pre-write state and
      // staged frames — independent of each other (and of the forked
      // signature appends), so they overlap (guide: fill idle capacity
      // with concurrent independent jobs)
      val ((kept, retracted), audit) = graft.core.Par.both(
        graft.core.Par.both(keptPlan.localCheckpoint(true),
          retractedPlan.localCheckpoint(true)),
        auditPlan.map(_.localCheckpoint(true)))
      beforeCommit(CurateDelta(kept, retracted, audit))
      // labels are overwrite-shaped → a fresh versioned directory the
      // commit record publishes (an in-place overwrite could not be
      // rolled back); survivors append under the transaction's snapshot
      // the owner id rides with each hash pair so later ingests can
      // attribute a store-dup drop to the document that holds the text.
      // A store created before the owner column existed has a 2-column
      // table — append with ITS schema (a 3-column append throws
      // column-arity in the catalog); [[compact]] upgrades such a table
      // in place, after which appends carry the owner again.
      val freshOut =
        if (storeExact.exists(st => !st.columns.contains("id")))
          fresh.select("__h1", "__h2")
        else fresh.select("__h1", "__h2", "id")
      // the three state writes target disjoint directories and read
      // staged frames — overlap them (Par rationale: each is a
      // sub-second fixed-cost write; txn registration happens on THIS
      // thread before the writes start)
      val labelsDir = txn.stateVersionDir(labelsState)
      txn.touchPath(survRel)
      graft.core.Par.both(
        labels.write.parquet(labelsDir),
        graft.core.Par.both(
          survivors.select("id").write.mode("append").parquet(survDir),
          wh.appendBucketed(exactTable, freshOut,
            Seq("__h1", "__h2"), cfg.minhash.nStoreBuckets)))
      // the forked signature appends must be durably done before the
      // marker publishes (commit is all-or-nothing per table set)
      joinMhAppend()
      txn.putKv(maxIdKey, math.max(bounds.getLong(1), prevMax).toString)
      CurateDelta(kept, retracted, audit)
      } catch { case e: Throwable =>
        // a rollback must never race the forked appends: join (again —
        // idempotent) before the transaction's failure path runs
        try joinMhAppend()
        catch { case w: Throwable => if (w ne e) e.addSuppressed(w) }
        throw e
      }
      }
      }
    }

    /** Rewrite every fragmented layout of this store into fresh compact
      * generations — the embedded MinHash store's two tables, the
      * exact-hash membership table, and the survivors id log (every
      * ingest appends one file set to each; a long-lived maintenance
      * sink otherwise pays per-file read overhead that grows with
      * stream age). Rows identical everywhere. Three transactions, not
      * one: each is idempotent maintenance, a crash between them leaves
      * a partially-compacted-but-consistent store, and nesting them
      * would run [[StoreCompaction]]'s post-commit generation sweep
      * before the outer commit actually published. */
    def compact(): Unit = {
      graft.sources.StoreTxn.recoverIfIdle(spark, root)
      if (wh.exists(s"${name}_cur_mh_sig") ||
          graft.sources.StoreTxn.getKv(root, s"active:${name}_cur:mh_sig")
            .isDefined)
        mh.compact(spark)
      if (wh.exists(exactTable))
        StoreCompaction.compact(spark, wh, s"CurationStore '$name'",
          Seq(exactSpec), cfg.minhash.nStoreBuckets)
      val (survDir, _) = survivorsLoc
      if (new java.io.File(survDir).exists()) {
        graft.sources.StoreTxn.transact(spark, root) {
          val txn = graft.sources.StoreTxn.current(root)
          spark.read.parquet(survDir)
            .repartition(math.max(1, cfg.minhash.nStoreBuckets / 4))
            .write.parquet(txn.stateVersionDir(survivorsState))
        }
        // the commit above republished survivors under a fresh version
        // (superseded versions GC'd by the commit); the original append
        // path is now unreachable — sweep whatever remains of it.
        // Resolved AFTER the commit and keyed on the PLAIN path (not
        // "did this compact fold it"): a crash between a previous
        // compact's commit and its sweep leaves the stale directory
        // behind with survivorsLoc already pointing at the version, and
        // a this-run-only condition would never reclaim it
        if (survivorsLoc._1 != survivorsPath &&
            new java.io.File(survivorsPath).exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).toSeq.flatten.foreach(rm)
            f.delete(); ()
          }
          rm(new java.io.File(survivorsPath))
        }
      }
    }

    /** Uniform signature for the maintenance-sink trigger. */
    def compact(sparkSession: org.apache.spark.sql.SparkSession): Unit =
      compact()
  }
}
