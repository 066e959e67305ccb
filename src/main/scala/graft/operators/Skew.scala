package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join/group keys at 100 TB scale.
  *
  * AQE's skew-join split (spark.sql.adaptive.skewJoin) is the first line
  * of defense and needs no code. These combinators cover the cases AQE
  * can't rewrite: broadcast-ineligible skewed equi-joins where one side
  * must be replicated, and huge collect-style aggregations.
  *
  * Salting is DETERMINISTIC (a hash of row content, never rand() or
  * partition ids) so replays, speculative retries, and the exactly-once
  * append semantics stay reproducible.
  *
  * Pass `idCol` — a row-unique column like a document or order id —
  * whenever one exists: it spreads EVERY hot key perfectly, including
  * the adversarial case of a hot key whose rows are bit-identical.
  * Without it the salt hashes the whole row, so identical rows
  * co-locate on one salt and a 100%-duplicate hot key degrades to the
  * unsalted plan (documented trade for determinism).
  */
object Skew {

  /** Deterministic salt in [0, salts): hash of `idCol` when given, hash
    * of every column otherwise. */
  private[operators] def saltExpr(df: DataFrame, idCol: Option[String],
                                  salts: Int): Column = {
    val cols = idCol match {
      case Some(id) =>
        require(df.columns.contains(id), s"idCol '$id' not in ${df.columns.mkString(",")}")
        Seq(col(id))
      case None => df.columns.toIndexedSeq.map(col)
    }
    pmod(xxhash64(cols: _*), lit(salts))
  }

  /** Salted inner equi-join: the skewed `left` side gets a deterministic
    * salt in [0, salts); `right` is replicated once per salt value. The
    * join key becomes (keys..., salt), splitting each hot key's rows
    * across `salts` reducers. Right-side replication costs |right|×salts
    * rows — use when `right` is too big to broadcast but far smaller
    * than the skewed side. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int = 16, idCol: Option[String] = None): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val saltedLeft =
      left.withColumn("__salt", saltExpr(left, idCol, salts).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys where the aggregate is
    * algebraic (sum/count/min/max): partial per (keys, salt), then final
    * merge per keys. Spark's map-side partial aggregation usually covers
    * this; the explicit form helps when upstream partitioning defeats it
    * (e.g. after an exploding join). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16, idCol: Option[String] = None): DataFrame =
    df.withColumn("__salt", saltExpr(df, idCol, salts))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
        sum(col("__n")).as("n"))
}
