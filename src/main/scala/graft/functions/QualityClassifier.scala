package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fasttext-style document quality classifier, trained and served
  * entirely as DataFrame ops: hashed bag-of-ngrams features → logistic
  * regression fit with full-batch gradient descent.
  *
  * The pipeline pattern (weak supervision): heuristic rules
  * ([[TextFunctions.gopherRules]]) label a corpus sample, the linear
  * model distills them into a smooth score that generalizes past the
  * hard thresholds — the standard recipe for web-scale quality filtering
  * where human labels don't exist at volume.
  *
  * Scale shape (100 TB): the feature table is one explode + two
  * aggregates per pass; each GD iteration broadcasts the weight vector
  * (numBuckets doubles — KBs) and reduces the gradient with map-side
  * partial aggregation. Nothing driver-side ever exceeds the weight
  * vector itself. At production scale you train on a SAMPLE (the model
  * has numBuckets parameters; millions of rows saturate it) and serve
  * the broadcast-join scoring pass over the full corpus.
  */
object QualityClassifier {

  /** Trained model: weight per hash bucket + bias, with the training
    * loss trajectory (for tests and monitoring). */
  case class Model(
      weights: Array[Double],
      bias: Double,
      lossHistory: Seq[Double]) {
    def numBuckets: Int = weights.length
  }

  /** Hashed term COUNTS (id, bucket, c): the tokenize→explode→hash→
    * count subtree every member of the classifier family starts from —
    * the dominant cost of serving. Cached through StagingCache keyed by
    * the analyzed plan's semantic hash (the [[centroidClassifier]] xu
    * convention): the d36 softmax serve and the d65 perceptron serve
    * consume this IDENTICAL table over the full corpus in one session,
    * and uncached each pays its own corpus tokenize. Sample-side calls
    * (training) get their own small entries under distinct hashes. */
  def hashedTermCounts(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numBuckets: Int,
      bigrams: Boolean = true): DataFrame = {
    val terms =
      if (bigrams) concat(col("__toks"), TextFunctions.allShinglesOf(col("__toks"), 2))
      else col("__toks")
    val counts = df
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("id"), explode(terms).as("term"))
      .groupBy(
        col("id"),
        pmod(TextFunctions.portableHash(col("term")), lit(numBuckets)).cast("int").as("bucket"))
      .agg(count(lit(1)).as("c"))
    graft.sources.StagingCache.getOrElseUpdate(
      df.sparkSession,
      s"termCounts:D=$numBuckets:bg=$bigrams:" +
        s"plan=${counts.queryExecution.analyzed.semanticHash()}")(counts)
  }

  /** Hashed term-frequency features: (id, bucket, x) with
    * x = occurrences/n_terms, bucket = portable md5 hash mod
    * `numBuckets`. With `bigrams` the term set is tokens ∪ word
    * bigrams (fasttext's subword trick at the phrase level). */
  def hashedFeatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numBuckets: Int,
      bigrams: Boolean = true): DataFrame = {
    val counts = hashedTermCounts(df, textCol, idCol, numBuckets, bigrams)
    val totals = counts.groupBy(col("id")).agg(sum(col("c")).as("n"))
    counts
      .join(totals, Seq("id"))
      .select(col("id"), col("bucket"), (col("c").cast("double") / col("n")).as("x"))
  }

  private def weightsDf(spark: SparkSession, w: Array[Double]): DataFrame =
    broadcast(
      spark.createDataFrame(w.toIndexedSeq.zipWithIndex.map { case (wv, i) => (i, wv) })
        .toDF("bucket", "w"))

  private val eps = 1e-12

  /** Full-batch logistic-regression GD. `labels` is (id, y∈{0,1}).
    * Deterministic up to float-sum ordering; gradients are rounded to 9
    * decimals so repeated runs on the same data converge identically in
    * practice. Two aggregates per iteration (margins by id, gradient by
    * bucket), weights round-trip driver↔cluster as a broadcast table. */
  def train(
      features: DataFrame,
      labels: DataFrame,
      numBuckets: Int,
      iters: Int = 10,
      lr: Double = 20.0,
      biasLr: Double = 0.5): Model = {
    val spark = features.sparkSession
    val feats = features
      .join(labels.select(col("id"), col("y").cast("double").as("y")), Seq("id"))
      .cache()
    val n = math.max(labels.count(), 1L).toDouble
    var w = Array.fill(numBuckets)(0.0)
    var b = 0.0
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    try {
      for (_ <- 1 to iters) {
        val margins = feats
          .join(weightsDf(spark, w), Seq("bucket"))
          .groupBy(col("id"))
          .agg(sum(col("w") * col("x")).as("m"), first(col("y")).as("y"))
          .select(
            col("id"), col("y"),
            (lit(1.0) / (lit(1.0) + exp(-(col("m") + lit(b))))).as("p"))
        // one pass computes loss + bias gradient; a second reduces the
        // per-bucket gradient (both fully partial-aggregated)
        val Array(lossRow) = margins
          .agg(
            avg(-(col("y") * log(col("p") + eps) +
              (lit(1.0) - col("y")) * log(lit(1.0) - col("p") + eps))).as("loss"),
            round(sum(col("p") - col("y")) / n, 9).as("gb"))
          .collect()
        losses += lossRow.getDouble(0)
        val grads = feats
          .join(margins.select(col("id"), (col("p") - col("y")).as("e")), Seq("id"))
          .groupBy(col("bucket"))
          .agg(round(sum(col("e") * col("x")) / n, 9).as("g"))
          .collect()
          .map(r => r.getInt(0) -> r.getDouble(1))
          .toMap
        // the bias sees gradient avg(p−y) (magnitude ~0.5) while weight
        // gradients are tf-damped (x ≈ 1/n_terms) — one shared rate
        // either stalls the weights or makes the bias oscillate, so the
        // bias steps with its own, ~40× smaller rate
        w = w.zipWithIndex.map { case (wv, i) => wv - lr * grads.getOrElse(i, 0.0) }
        b -= biasLr * lossRow.getDouble(1)
      }
      Model(w, b, losses.toSeq)
    } finally feats.unpersist(blocking = false)
  }

  /** Multiclass softmax model: weights(k)(bucket), bias(k). */
  case class MulticlassModel(
      weights: Array[Array[Double]],
      bias: Array[Double],
      lossHistory: Seq[Double]) {
    def numClasses: Int = weights.length
    def numBuckets: Int = weights.head.length
  }

  private def weightsKDf(spark: SparkSession, w: Array[Array[Double]]): DataFrame =
    broadcast(
      spark.createDataFrame(
        for { k <- w.indices; bkt <- w(k).indices } yield (k, bkt, w(k)(bkt)))
        .toDF("k", "bucket", "w"))

  private def biasDf(spark: SparkSession, b: Array[Double]): DataFrame =
    broadcast(
      spark.createDataFrame(b.toIndexedSeq.zipWithIndex.map { case (bv, k) => (k, bv) })
        .toDF("k", "bk"))

  /** Per-(id, k) softmax probabilities for the given parameters:
    * (id, k, m, p) — the shared forward pass of multiclass train and
    * score. One broadcast join (bucket → K weight rows), one aggregate,
    * and an id-partitioned window for the normalizer. */
  private def softmaxProbs(
      features: DataFrame,
      w: Array[Array[Double]],
      b: Array[Double]): DataFrame = {
    val spark = features.sparkSession
    val wId = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
    features
      .join(weightsKDf(spark, w), Seq("bucket"))
      .groupBy(col("id"), col("k"))
      .agg(sum(col("w") * col("x")).as("mw"))
      .join(biasDf(spark, b), Seq("k"))
      .select(col("id"), col("k"), (col("mw") + col("bk")).as("m"))
      // max-shifted for numeric stability, like every softmax ever
      .withColumn("ex", exp(col("m") - max(col("m")).over(wId)))
      .withColumn("p", col("ex") / sum(col("ex")).over(wId))
      .select(col("id"), col("k"), col("m"), col("p"))
  }

  /** Multiclass (softmax) fit — the full fasttext shape. `labels` is
    * (id, y∈[0, numClasses)). Same scale story as [[train]]: the weight
    * MATRIX (numClasses × numBuckets doubles) broadcasts; the gradient
    * reduce is one partial-aggregated groupBy(bucket, k); nothing
    * driver-side exceeds the matrix. */
  /** `tol` > 0 enables early stopping: training ends once the relative
    * per-iteration loss improvement stays below `tol` for two
    * consecutive iterations (deterministic — the loss sequence is a pure
    * function of the data, so the stopping point is too). Iteration
    * count IS the wall-clock here (each iteration is one fixed-overhead
    * driver action over a small sampled table), so stopping at
    * convergence instead of a fixed budget cuts training time directly. */
  def trainMulticlass(
      features: DataFrame,
      labels: DataFrame,
      numBuckets: Int,
      numClasses: Int,
      iters: Int = 15,
      lr: Double = 50.0,
      biasLr: Double = 0.5,
      tol: Double = 0.0): MulticlassModel = {
    val feats = features
      .join(labels.select(col("id"), col("y").cast("int").as("y")), Seq("id"))
      .cache()
    val n = math.max(labels.count(), 1L).toDouble
    var w = Array.fill(numClasses)(Array.fill(numBuckets)(0.0))
    var b = Array.fill(numClasses)(0.0)
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    var belowTol = 0
    try {
      var it = 0
      while (it < iters && belowTol < 2) {
        it += 1
        val errs = softmaxProbs(feats.select(col("id"), col("bucket"), col("x")), w, b)
          .join(feats.select(col("id"), col("y")).distinct(), Seq("id"))
          .select(
            col("id"), col("k"),
            (col("p") - when(col("k") === col("y"), 1.0).otherwise(0.0)).as("e"),
            when(col("k") === col("y"), -log(col("p") + eps)).as("nll"))
          .cache()
        // ONE driver action per iteration: the per-(bucket, k) gradient
        // aggregate and the per-class loss/bias aggregate are unioned
        // into a single collect (bucket = -1 marks the per-class rows).
        // Training is overhead-bound, not data-bound — the sampled
        // feature table is ~1M tiny rows, so job count IS the wall-clock
        // (measured at sf0.1: 3 actions/iter 163 s, 2 = 132 s, 1 = this).
        // Rounding is unchanged, so the fitted model is bit-identical to
        // the multi-action form.
        val kstats = errs.groupBy(col("k"))
          .agg(round(sum(col("e")) / n, 9).as("g"), sum(col("nll")).as("l"))
        val rows = feats
          .join(errs.select(col("id"), col("k"), col("e")), Seq("id"))
          .groupBy(col("bucket"), col("k"))
          .agg(round(sum(col("e") * col("x")) / n, 9).as("g"))
          .select(col("bucket"), col("k"), col("g"), lit(null).cast("double").as("l"))
          .unionByName(
            kstats.select(lit(-1).as("bucket"), col("k"), col("g"), col("l")))
          .collect()
        val (kRows, gradRows) = rows.partition(_.getInt(0) == -1)
        losses += kRows.map(r => if (r.isNullAt(3)) 0.0 else r.getDouble(3)).sum / n
        val gb = kRows.map(r => r.getInt(1) -> r.getDouble(2)).toMap
        val grads = gradRows
          .map(r => (r.getInt(1), r.getInt(0)) -> r.getDouble(2))
          .toMap
        errs.unpersist(blocking = false)
        w = Array.tabulate(numClasses)(k =>
          Array.tabulate(numBuckets)(bkt => w(k)(bkt) - lr * grads.getOrElse((k, bkt), 0.0)))
        b = Array.tabulate(numClasses)(k => b(k) - biasLr * gb.getOrElse(k, 0.0))
        if (tol > 0 && losses.length >= 2) {
          val prev = losses(losses.length - 2)
          val rel = (prev - losses.last) / math.max(math.abs(prev), eps)
          belowTol = if (rel < tol) belowTol + 1 else 0
        }
      }
      MulticlassModel(w, b, losses.toSeq)
    } finally feats.unpersist(blocking = false)
  }

  /** Multiclass serve: (id, predicted, confidence) — argmax class with
    * deterministic class-index tie-break. */
  def scoreMulticlass(
      df: DataFrame,
      textCol: String,
      idCol: String,
      model: MulticlassModel,
      bigrams: Boolean = true): DataFrame = {
    val wId = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("p").desc, col("k").asc)
    softmaxProbs(
      hashedFeatures(df, textCol, idCol, model.numBuckets, bigrams), model.weights, model.bias)
      .withColumn("rn", row_number().over(wId))
      .filter(col("rn") === 1)
      .select(col("id"), col("k").as("predicted"), round(col("p"), 6).as("confidence"))
  }

  /** Score every document: (id, score, predicted). One broadcast join +
    * one aggregate — the production serving pass. */
  def score(
      df: DataFrame,
      textCol: String,
      idCol: String,
      model: Model,
      bigrams: Boolean = true): DataFrame =
    hashedFeatures(df, textCol, idCol, model.numBuckets, bigrams)
      .join(weightsDf(df.sparkSession, model.weights), Seq("bucket"))
      .groupBy(col("id"))
      .agg(sum(col("w") * col("x")).as("m"))
      .select(
        col("id"),
        round(lit(1.0) / (lit(1.0) + exp(-(col("m") + lit(model.bias)))), 6).as("score"))
      .withColumn("predicted", (col("score") >= 0.5).cast("long"))

  /** Nearest-centroid text classifier in HELLINGER space — the
    * ORACLE-GATED member of the classifier family. [[trainMulticlass]]'s
    * softmax needs exp/log, which IEEE leaves implementation-defined
    * beyond ~0.5 ulp, so its trained weights admit no honest cross-engine
    * bit contract (d36 is rows-only for exactly that reason). This model
    * uses ONLY correctly-rounded ops (+ − × ÷ sqrt): per doc, the
    * hashed-token frequency vector under the variance-stabilizing square
    * root — `x_u = round(√(count/n_tokens)·1e6)` — so Euclidean distance
    * becomes Hellinger distance, the natural geometry for multinomial
    * token mixtures; per class, the mean of those integer vectors,
    * re-rounded to integers. Scoring maximizes `2·⟨x_u, c_u⟩ − ‖c_u‖²`
    * (≡ nearest centroid) in EXACT integer arithmetic, so every
    * prediction is a pure function of the corpus, bit-replayable in
    * DuckDB (d63). The honest tradeoff vs d36: the discriminative
    * softmax reaches ~0.86 harness accuracy with no bit contract; this
    * generative centroid reaches ~5× random WITH one — the Bayes rule
    * for mixtures needs log-probabilities, which is precisely the
    * operation the contract excludes.
    *
    * Scale shape: "training" is ONE partial-aggregated groupBy over
    * (class, bucket) — a mergeable-statistics model with no iterations,
    * no driver-side weights, no collect; new data folds in by re-running
    * the aggregate. The centroid table (≤ classes·numBuckets rows) and
    * the class list broadcast; the doc-side work is one sparse
    * counts-shuffle plus a per-(doc, class) integer fold — linear in
    * corpus size. Integer ranges: x_u, c_u ≤ 1e6 (frequencies are ≤ 1),
    * so dots and norms stay ≤ numBuckets·1e12 — inside int64 up to
    * ~9M buckets.
    *
    * Output: (idCol, labelCol, predicted_<labelCol>, correct) per doc,
    * tie-broken by ascending class label. */
  def centroidClassifier(
      df: DataFrame,
      textCol: String,
      idCol: String,
      labelCol: String,
      numBuckets: Int = 1024): DataFrame = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val cnt = df
      .select(
        col(idCol).as("id"), col(labelCol).as("actual"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(
        col("id"), col("actual"),
        pmod(TextFunctions.portableHash(col("term")), lit(numBuckets)).cast("int").as("bucket"))
      .agg(count(lit(1)).as("c"))
    val totals = cnt.groupBy(col("id")).agg(sum(col("c")).as("n"))
    // √frequency in integer micro-units: c/n is one correctly-rounded
    // division, sqrt is correctly rounded by IEEE mandate, and the final
    // round lands on the same long in every conforming engine. Cached
    // through StagingCache (semantic-hash keyed, the mineBitext
    // convention): centroid training AND doc scoring both consume this
    // table, and uncached each would recompute the tokenize→explode→
    // count subtree — the dominant cost of the whole classifier.
    val xu = graft.sources.StagingCache.getOrElseUpdate(
      df.sparkSession,
      s"centroidClf:D=$numBuckets:" +
        s"plan=${cnt.queryExecution.analyzed.semanticHash()}") {
      cnt
        .join(totals, Seq("id"))
        .select(
          col("id"), col("actual"), col("bucket"),
          round(sqrt(col("c").cast("double") / col("n")) * 1e6).cast("long").as("xu"))
    }
    val cls = df.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("n_docs"))
    val cenu = xu
      .groupBy(col("actual").as("label"), col("bucket"))
      .agg(sum(col("xu")).as("s"))
      .join(broadcast(cls), Seq("label"))
      .select(
        col("label"), col("bucket"),
        round(col("s").cast("double") / col("n_docs")).cast("long").as("cu"))
    val nrm = cenu.groupBy(col("label")).agg(sum(col("cu") * col("cu")).as("norm2"))
    val dots = xu
      .join(broadcast(cenu), Seq("bucket"))
      .groupBy(col("id"), col("label"))
      .agg(sum(col("xu") * col("cu")).as("dot"))
    // every doc scores against every class (a doc sharing no bucket with
    // a class still competes with dot 0): |docs|·|classes| rows, linear
    val grid = df.select(col(idCol).as("id"), col(labelCol).as("actual"))
      .crossJoin(broadcast(cls.select(col("label"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("s").desc, col("label").asc)
    grid
      .join(dots, Seq("id", "label"), "left")
      .join(broadcast(nrm), Seq("label"))
      .select(
        col("id"), col("actual"), col("label"),
        (lit(2L) * coalesce(col("dot"), lit(0L)) - col("norm2")).as("s"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select(
        col("id").as(idCol),
        col("actual").as(labelCol),
        col("label").as(s"predicted_$labelCol"),
        when(col("label") === col("actual"), 1L).otherwise(0L).as("correct"))
  }

  /** Fixed-point AVERAGED PERCEPTRON text classifier — the
    * DISCRIMINATIVE oracle-gated member of the classifier family
    * (Freund & Schapire 1999, "Large margin classification using the
    * perceptron algorithm"; the averaging trick per Daumé's CIML
    * exposition — public sources). [[trainMulticlass]]'s softmax (d36)
    * is discriminative but float-bound (exp/log: no cross-engine bit
    * contract); [[centroidClassifier]] (d63) is bit-exact but
    * generative. This model is both discriminative AND exact: features
    * are INTEGER hashed unigram+bigram counts (the d36 feature recipe,
    * plus a constant bias feature at bucket −1), every update is
    * + − × on int64, and the averaged
    * weights are kept SCALED by the step count T (argmax is invariant
    * to the positive 1/T factor), so no division ever happens — the
    * entire train→predict chain is exact integer arithmetic and
    * replays bit-for-bit in a DuckDB recursive CTE (d65).
    *
    * Train/serve split at scale: training is inherently SEQUENTIAL
    * (per-example mistake-driven updates), so it runs driver-side over
    * a deterministic portable-hash sample capped at `sampleCap` docs —
    * the d36 recipe (a numBuckets·classes-parameter model saturates on
    * hundreds of examples; training cost must not scale with the
    * corpus), except the sample filter uses the PORTABLE md5-prefix
    * hash so the oracle draws the identical sample. The collect is
    * bounded by sampleCap × tokens-per-doc. Serving is one broadcast
    * join of the (label, bucket, weight) table + one partial-aggregated
    * fold per (doc, class) — linear in corpus size, the d63 shape.
    *
    * Update rule (multiclass, mistake-driven): ŷ = argmax_k ⟨W_k, x⟩
    * (tie → ascending label); on ŷ ≠ y: W_y += x, W_ŷ −= x, and the
    * averaging accumulators U_y += t·x, U_ŷ −= t·x. Examples are
    * visited in ascending-id order, `epochs` passes, t incrementing
    * every example. Final scores use A_k = T·W_k − U_k ≡ T·avg(W_k).
    *
    * Output: (idCol, labelCol, predicted_<labelCol>, correct) per doc,
    * tie-broken by ascending class label — the d63 contract. */
  def perceptronClassifier(
      df: DataFrame,
      textCol: String,
      idCol: String,
      labelCol: String,
      numBuckets: Int = 1024,
      epochs: Int = 10,
      sampleCap: Long = 240L): DataFrame = {
    require(numBuckets >= 1 && epochs >= 1 && sampleCap >= 1)
    val spark = df.sparkSession

    // unigrams + bigrams, the d36 feature recipe: the harness sources
    // differ mostly in token CO-OCCURRENCE, so unigram-only counts top
    // out near the generative d63 (~0.25 accuracy) while adding bigrams
    // more than doubles held-out accuracy (~0.52, measured sf0.01)
    // the (id, bucket, c) subtree is [[hashedTermCounts]] — shared
    // (via its semantic-hash StagingCache) with the d36 softmax serve,
    // which reads the identical full-corpus table in the same session
    def feats(of: DataFrame): DataFrame =
      hashedTermCounts(of, textCol, idCol, numBuckets, bigrams = true)
        .unionByName(
          of.select(col(idCol).as("id"), lit(-1).cast("int").as("bucket"), lit(1L).as("c")))

    // deterministic portable-hash sample: ~sampleCap docs regardless of
    // corpus size, reproducible in any engine with md5. The corpus count
    // is a pure function of the plan — memoized (ModelCache, semantic-
    // hash key) so repeated serves don't re-run the count action.
    val mod = math.max(1L, graft.sources.ModelCache.getOrElseUpdate(
      spark, s"nrows:plan=${df.queryExecution.analyzed.semanticHash()}")(df.count()) / sampleCap)
    val classes = graft.sources.ModelCache.getOrElseUpdate(
      spark, s"classes:$labelCol:plan=${df.queryExecution.analyzed.semanticHash()}") {
      df.select(col(labelCol).cast("string")).distinct()
        .collect().map(_.getString(0)).sorted.toSeq
    }

    // the trained (scaled) weight table is a pure deterministic function
    // of (corpus plan, params) — memoized per session like the d36
    // softmax model (ModelCache convention), so repeated serves skip the
    // sample collect and the sequential driver-side training replay
    val scaled: Seq[(String, Int, Long)] = graft.sources.ModelCache.getOrElseUpdate(
      spark,
      s"perceptron:$labelCol:D=$numBuckets:e=$epochs:cap=$sampleCap:m=$mod:" +
        s"plan=${df.queryExecution.analyzed.semanticHash()}") {
      val samp =
        df.filter(pmod(TextFunctions.portableHash(col(idCol).cast("string")), lit(mod)) === 0)

      // bounded collect: sampleCap docs × distinct buckets per doc
      val sampRows = feats(samp)
        .join(samp.select(col(idCol).as("id"), col(labelCol).cast("string").as("y")), Seq("id"))
        .orderBy(col("id"), col("bucket"))
        .select(col("id").cast("string"), col("y"), col("bucket"), col("c"))
        .collect()
      val examples: Seq[(String, Array[(Int, Long)])] = {
        val order = scala.collection.mutable.LinkedHashMap
          .empty[String, (String, scala.collection.mutable.ArrayBuffer[(Int, Long)])]
        sampRows.foreach { r =>
          val e = order.getOrElseUpdate(
            r.getString(0), (r.getString(1), scala.collection.mutable.ArrayBuffer.empty))
          e._2 += ((r.getInt(2), r.getLong(3)))
        }
        order.values.map { case (y, fs) => (y, fs.toArray) }.toSeq
      }

      val w = scala.collection.mutable.Map.empty[(String, Int), Long].withDefaultValue(0L)
      val u = scala.collection.mutable.Map.empty[(String, Int), Long].withDefaultValue(0L)
      var t = 1L
      for (_ <- 1 to epochs; (y, fs) <- examples) {
        // argmax with ascending-label tie-break: classes is sorted, so the
        // first strict improvement wins
        var best = classes.head
        var bestS = Long.MinValue
        classes.foreach { k =>
          var s = 0L
          fs.foreach { case (b, c) => s += w((k, b)) * c }
          if (s > bestS) { bestS = s; best = k }
        }
        if (best != y) {
          fs.foreach { case (b, c) =>
            w((y, b)) += c; u((y, b)) += t * c
            w((best, b)) -= c; u((best, b)) -= t * c
          }
        }
        t += 1
      }
      val bigT = t - 1
      (w.keySet ++ u.keySet).toSeq
        .map { case (k, b) => (k, b, bigT * w((k, b)) - u((k, b))) }
        .filter(_._3 != 0L)
    }

    // serve everything: broadcast the tiny weight table, one fold per
    // (doc, class), grid so zero-overlap classes still compete at 0
    val model = broadcast(
      spark.createDataFrame(scaled).toDF("label", "bucket", "a"))
    val dots = feats(df)
      .join(model, Seq("bucket"))
      .groupBy(col("id"), col("label"))
      .agg(sum(col("a") * col("c")).as("s"))
    val cls = broadcast(
      spark.createDataFrame(classes.map(Tuple1(_))).toDF("label"))
    val grid = df.select(col(idCol).as("id"), col(labelCol).cast("string").as("actual"))
      .crossJoin(cls)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("s").desc, col("label").asc)
    grid
      .join(dots, Seq("id", "label"), "left")
      .withColumn("s", coalesce(col("s"), lit(0L)))
      .withColumn("r", row_number().over(win))
      .filter(col("r") === 1)
      .select(
        col("id").as(idCol),
        col("actual").as(labelCol),
        col("label").as(s"predicted_$labelCol"),
        when(col("label") === col("actual"), 1L).otherwise(0L).as("correct"))
  }
}
