package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * `df.sample()` draws from a partition-seeded RNG: the selected rows
  * change with partitioning, task retries, and engine — unusable for
  * reproducible train/test splits or auditable data mixing. These
  * operators key every decision on the 60-bit md5-derived portable hash
  * of a stable row id, so a row's fate is a pure function of its id:
  * identical across runs, partitionings, engines (DuckDB-oracle-able),
  * and INCREMENTAL — re-running over a grown dataset keeps every
  * previous decision, the property a 100 TB pipeline needs to avoid
  * re-shuffling its training set on every ingest.
  *
  * All per-row work is a map-side filter (no shuffle); the mixture
  * computation is one small aggregate broadcast back.
  */
object Sampling {

  /** 2^60 — the portable hash is 15 hex chars = 60 bits, uniform. */
  val hashSpace: Double = math.pow(2.0, 60)

  private def keep(idCol: Column, fraction: Column): Column =
    TextFunctions.portableHash(idCol.cast("string")) < (fraction * lit(hashSpace)).cast("long")

  /** Deterministic Bernoulli(fraction) sample keyed on `idCol`. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    df.filter(keep(col(idCol), lit(fraction)))
  }

  /** Stratified deterministic sample: per-stratum fractions (strata not
    * listed are dropped — the reference semantics of sampleBy). */
  def hashSampleBy(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double]): DataFrame = {
    require(fractions.nonEmpty, "need at least one stratum fraction")
    fractions.foreach { case (s, f) =>
      require(f >= 0 && f <= 1, s"fraction for stratum '$s' must be in [0,1], got $f")
    }
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit(f)).otherwise(acc)
    }
    df.filter(keep(col(idCol), frac))
  }

  /** EXACT-count stratified sample: the `n` hash-lowest rows per stratum
    * — deterministic and reproducible like [[hashSampleBy]], but
    * row-exact where fractions are only exact in expectation (an eval
    * set of "exactly 1000 docs per source" is this, not a rate). A row
    * leaves the sample only when new rows hash below it, so samples are
    * near-stable as the corpus grows. One shuffle keyed by stratum; the
    * per-stratum sort is window-ranked (spill-capable). For extreme
    * strata (billions of rows, tiny n) the two-pass variant — approx
    * hash threshold, then filter + exact rank under it — avoids ranking
    * the whole stratum; at that point the filter prunes ~all rows. */
  def exactSampleBy(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      n: Int): DataFrame = {
    require(n >= 0, s"n must be >= 0, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(TextFunctions.portableHash(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n).drop("__rn")
  }

  /** Reproducible train/test split: adds a `split` column ("test" for
    * the hash-lowest `testFraction` of ids, else "train"). A row never
    * migrates between splits as the dataset grows. */
  def trainTestSplit(df: DataFrame, idCol: String, testFraction: Double): DataFrame = {
    require(testFraction >= 0 && testFraction <= 1,
      s"testFraction must be in [0,1], got $testFraction")
    df.withColumn(
      "split",
      when(keep(col(idCol), lit(testFraction)), "test").otherwise("train"))
  }

  /** Deterministic uniform in (0, 1) derived from the portable hash of
    * `idCol` (salted so different operators draw independent streams). */
  private def uniform(idCol: Column, salt: String): Column =
    (TextFunctions.portableHash(concat(lit(s"$salt:"), idCol.cast("string")))
      .cast("double") + lit(0.5)) / lit(hashSpace)

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * each row draws key `-ln(u) / w` with `u` a DETERMINISTIC uniform
    * derived from the portable hash of its id; the `k` smallest keys are
    * an exact weight-proportional sample without replacement. The draw is
    * a pure function of (id, weight), so the sample is reproducible
    * across runs, partitionings, and engines — the property `rand()`
    * based weighted sampling loses on task retry.
    *
    * This is the mixture-sampling workhorse: weight = quality score (or
    * token count) and the sample is the training slice. Global variant:
    * one map-side key computation + `TakeOrderedAndProject` (per-partition
    * top-k, then k·partitions rows to one reducer — no full sort, no
    * single-partition shuffle of the data). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    df.filter(col(weightCol) > 0)
      .withColumn("es_key", esKey(col(idCol), col(weightCol)))
      .orderBy(col("es_key").asc, col(idCol).asc)
      .limit(k)
  }

  /** Per-stratum weighted sampling without replacement: the `k` smallest
    * A-ES keys within each stratum. One shuffle keyed by stratum; the
    * per-stratum rank is window-ranked (spill-capable), same shape as
    * [[exactSampleBy]]. */
  def weightedSampleBy(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("es_key").asc, col(idCol).asc)
    df.filter(col(weightCol) > 0)
      .withColumn("es_key", esKey(col(idCol), col(weightCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Per-group QUALITY cap (the CommonCrawl per-domain cap): rank every
    * row inside its group by (quality desc, id asc — deterministic) and
    * keep the best `cap`. Unlike the sampling ops above this is a
    * policy filter, not a draw: the same rows survive on every run.
    *
    * One shuffle keyed by the group column; row_number is rank-limited
    * by WindowGroupLimit (partial limits before the exchange), so a hot
    * domain never materializes its full membership on one reducer. */
  def capPerGroup(
      df: DataFrame,
      groupCol: String,
      qualityCol: String,
      idCol: String,
      cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    df.withColumn("group_rank", row_number().over(w))
      .filter(col("group_rank") <= cap)
  }

  /** The A-ES key `-ln(u)/w` (exponential with rate `w`): smallest-k by
    * this key = weight-proportional sample without replacement. */
  def esKey(idCol: Column, weightCol: Column): Column =
    -log(uniform(idCol, "es")) / weightCol.cast("double")

  /** Token-BUDGETED weighted sampling: rows are drawn per stratum in
    * A-ES key order (weight-proportional, deterministic) until the
    * stratum's cumulative token count reaches `tokenBudget` — the
    * materialization step of a data-mixture plan ([[mixtureRates]]
    * computes rates; this cuts the actual training slice to a token
    * budget). The first row that crosses the budget is still included,
    * so every non-empty stratum yields at least one document. One
    * shuffle keyed by stratum; the running sum is a window over the
    * stratum, spill-capable. */
  def weightedSampleByTokenBudget(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      weightCol: String,
      tokenCountCol: String,
      tokenBudget: Long): DataFrame = {
    require(tokenBudget >= 0, s"tokenBudget must be >= 0, got $tokenBudget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("es_key").asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.filter(col(weightCol) > 0)
      .withColumn("es_key", esKey(col(idCol), col(weightCol)))
      .withColumn("__cum", sum(col(tokenCountCol)).over(w))
      // strictly-before tokens < budget ⇒ keep (boundary doc included)
      .filter(col("__cum") - col(tokenCountCol) < tokenBudget)
      .drop("__cum")
  }

  /** Data-mixing rates: given per-row token counts, a stratum column
    * (e.g. source), target mixture weights, and a total token budget,
    * compute each stratum's deterministic sampling rate
    * `min(1, weight·budget / stratum_tokens)` plus its expected token
    * yield — the planning step of an LLM data-mixture pipeline.
    * One partial-aggregated pass; output is one row per stratum. */
  def mixtureRates(
      df: DataFrame,
      strataCol: String,
      tokenCountCol: String,
      weights: Map[String, Double],
      tokenBudget: Long): DataFrame = {
    require(weights.nonEmpty, "need at least one mixture weight")
    weights.foreach { case (s, w) =>
      require(w >= 0, s"weight for stratum '$s' must be >= 0, got $w")
    }
    require(tokenBudget >= 0, s"tokenBudget must be >= 0, got $tokenBudget")
    df.groupBy(col(strataCol).as("stratum"))
      .agg(sum(col(tokenCountCol)).cast("long").as("stratum_tokens"))
      .withColumn(
        "weight",
        weights.foldLeft(lit(0.0)) { case (acc, (stratum, wt)) =>
          when(col("stratum") === stratum, lit(wt)).otherwise(acc)
        })
      .withColumn(
        "sample_rate",
        round(least(lit(1.0), col("weight") * tokenBudget / col("stratum_tokens")), 6))
      .withColumn(
        "expected_tokens",
        round(col("sample_rate") * col("stratum_tokens")).cast("long"))
      .select(col("stratum"), col("stratum_tokens"), round(col("weight"), 6).as("weight"),
        col("sample_rate"), col("expected_tokens"))
  }
}
