package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Thresholds and sketch parameters for [[curate]]. Defaults match the
    * oracle-verified per-stage queries; tune per corpus. */
  final case class CurateConfig(
      minQuality: Double = 0.42,
      maxRepetition: Double = 0.06,
      repN: Int = 2,
      deconN: Int = 5,
      minhash: MinhashConfig =
        MinhashConfig(shingleN = 3, bands = 8, rowsPerBand = 2,
          threshold = 0.5))

  /** `kept` is the curated corpus (id, text — text REDACTED);
    * `stageCounts` is the per-stage survivor accounting (empty unless
    * requested — each count is an extra action). */
  final case class CurateResult(kept: DataFrame,
                                stageCounts: Seq[(String, Long)])

  /** Run the full curation pipeline over `docs`. Ids must be integral
    * and unique (connected components requires integral labels).
    * `evalTexts` enables the decontamination stage; `withCounts` adds
    * the survivor accounting (three extra jobs: one aggregate over the
    * scored scan, one count of the decontaminated set, one of the kept
    * set — the exact-dedup count is free off the checkpoint). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             evalTexts: Option[DataFrame] = None,
             evalTextCol: String = "text",
             cfg: CurateConfig = CurateConfig(),
             withCounts: Boolean = false,
             stage: DataFrame => DataFrame = _.localCheckpoint(true))
      : CurateResult = {
    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    // one tokenization feeds both scores (lambda-capture rule: tokens
    // bound to a column first, scores staged off it)
    val scored = base
      .select(col("id"), col("text"),
        TextFunctions.tokens(col("text")).as("__toks"))
      .select(col("id"), col("text"),
        TextFunctions.qualityScoreFromTokens(col("text"), col("__toks"))
          .as("__q"),
        TextFunctions.duplicateNgramFraction(col("__toks"), cfg.repN)
          .as("__rep"))
    val qPass = col("__q") >= cfg.minQuality
    val rPass = col("__rep") <= cfg.maxRepetition
    val redactedRaw = scored.filter(qPass && rPass)
      .select(col("id"), TextFunctions.redactPii(col("text")).as("text"))
    // decontamination reads the redacted corpus TWICE (the n-gram side
    // of the contamination join and the anti-join left side) — stage it
    // first or the tokenize→score→redact chain runs twice per action
    val redacted =
      if (evalTexts.isDefined) stage(redactedRaw) else redactedRaw
    val decon = evalTexts match {
      case Some(ev) => redacted.join(
        Dedup.contaminatedIds(redacted, "id", "text", ev, evalTextCol,
          cfg.deconN),
        Seq("id"), "left_anti")
      case None => redacted
    }
    val exact = stage(Dedup.exact(decon, "id", "text"))
    val mh = cfg.minhash
    val pairs = Dedup.minhashPortablePairs(exact, "id", "text",
      mh.shingleN, mh.bands, mh.rowsPerBand, mh.threshold, mh.seed,
      mh.maxBucket)
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
        // one aggregate scan covers input + both filter stages; the
        // decon count re-runs only the staged-redacted anti-join; the
        // exact and kept counts read checkpointed frames
        val qr = scored.agg(
          count(lit(1)).as("nin"),
          count(when(qPass, lit(1))).as("nq"),
          count(when(qPass && rPass, lit(1))).as("nr")).head()
        val nDec = decon.count()
        val nEx = exact.count()
        val nKept = kept.count()
        Seq("input" -> qr.getLong(0), "quality" -> qr.getLong(1),
          "repetition" -> qr.getLong(2), "decontaminate" -> nDec,
          "exact_dedup" -> nEx, "near_dedup" -> nKept)
      }
    CurateResult(kept, counts)
  }
}
