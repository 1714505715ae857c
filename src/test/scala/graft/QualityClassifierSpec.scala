package graft

import graft.functions.QualityClassifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityClassifierSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // Linearly separable corpus: "good" docs are wordy English prose,
  // "bad" docs are symbol-heavy repetitive junk — disjoint vocabulary,
  // so a hashed linear model must separate them.
  private lazy val labeled = {
    val good = (0 until 30).map { i =>
      (i.toLong,
        s"the quick brown fox number $i jumps over the lazy dog and " +
          "that was a fine day to be reading some well formed prose with care",
        1L)
    }
    val bad = (30 until 60).map { i =>
      (i.toLong, s"zzz$i qqq ### @@@ ||| zzz qqq ### @@@ ||| zzz qqq ### buy buy buy", 0L)
    }
    (good ++ bad).toDF("doc_id", "text", "label")
  }

  private lazy val feats =
    QualityClassifier.hashedFeatures(labeled, "text", "doc_id", numBuckets = 64)
  private lazy val labels = labeled.select($"doc_id".as("id"), $"label".as("y"))
  private lazy val model =
    QualityClassifier.train(feats, labels, numBuckets = 64, iters = 12, lr = 20.0)

  test("hashed features are tf-normalized per doc") {
    val sums = feats.groupBy($"id").agg(round(sum($"x"), 9).as("s"))
      .select($"s").distinct().as[Double].collect()
    assert(sums.toSeq == Seq(1.0), s"tf fractions must sum to 1 per doc, got ${sums.toSeq}")
  }

  test("training loss decreases and the model separates the classes") {
    val l = model.lossHistory
    assert(l.head > l.last, s"loss should fall: $l")
    assert(l.last < 0.3, s"separable data should reach low loss, got ${l.last}")
    val scored = QualityClassifier.score(labeled, "text", "doc_id", model)
      .join(labels, Seq("id"))
    val acc = scored.filter($"predicted" === $"y").count().toDouble / 60
    assert(acc >= 0.95, s"train accuracy $acc")
  }

  test("training is deterministic across runs (rounded gradients)") {
    val again = QualityClassifier.train(feats, labels, numBuckets = 64, iters = 12, lr = 20.0)
    assert(again.weights.toSeq == model.weights.toSeq && again.bias == model.bias)
  }

  test("multiclass softmax separates three disjoint-vocabulary classes") {
    val docs3 = (0 until 45).map { i =>
      val y = i % 3
      val text = y match {
        case 0 => s"apple banana cherry date elderberry fig grape $i fruit salad bowl"
        case 1 => s"hammer wrench pliers saw drill chisel level $i toolbox garage bench"
        case _ => s"violin cello flute oboe trumpet timpani harp $i orchestra concert hall"
      }
      (i.toLong, text, y.toLong)
    }.toDF("doc_id", "text", "y")
    val feats = QualityClassifier.hashedFeatures(docs3, "text", "doc_id", numBuckets = 64)
    val m = QualityClassifier.trainMulticlass(
      feats, docs3.select($"doc_id".as("id"), $"y"), numBuckets = 64, numClasses = 3,
      iters = 15, lr = 50.0)
    assert(m.lossHistory.head > m.lossHistory.last, s"loss should fall: ${m.lossHistory}")
    val acc = QualityClassifier.scoreMulticlass(docs3, "text", "doc_id", m)
      .join(docs3.select($"doc_id".as("id"), $"y"), Seq("id"))
      .filter($"predicted" === $"y").count() / 45.0
    assert(acc >= 0.95, s"3-class accuracy $acc, losses ${m.lossHistory}")
  }

  test("tol stops training at convergence; tol=0 runs the full budget") {
    val docs2 = (0 until 20).map { i =>
      (i.toLong, if (i % 2 == 0) s"alpha beta gamma $i" else s"delta epsilon zeta $i",
        (i % 2).toLong)
    }.toDF("doc_id", "text", "y")
    val feats = QualityClassifier.hashedFeatures(docs2, "text", "doc_id", numBuckets = 32)
    val labels = docs2.select($"doc_id".as("id"), $"y")
    // an absurdly loose tolerance: any iteration counts as converged, so
    // training stops after the minimum 2-consecutive window
    val early = QualityClassifier.trainMulticlass(
      feats, labels, numBuckets = 32, numClasses = 2, iters = 15, lr = 50.0, tol = 1e9)
    assert(early.lossHistory.length < 15,
      s"early stop never fired: ${early.lossHistory.length} iterations")
    val full = QualityClassifier.trainMulticlass(
      feats, labels, numBuckets = 32, numClasses = 2, iters = 15, lr = 50.0)
    assert(full.lossHistory.length == 15, "tol=0 must run the full budget")
    // the shared prefix of the two runs is identical (stopping changes
    // where training ends, never what each iteration computes)
    assert(full.lossHistory.take(early.lossHistory.length) == early.lossHistory)
  }

  test("scoring an unseen doc uses only the broadcast weight table") {
    val unseen = Seq(
      (100L, "a fine day reading prose with the quick brown fox and the lazy dog"),
      (101L, "zzz qqq ### @@@ ||| zzz buy buy")).toDF("doc_id", "text")
    val s = QualityClassifier.score(unseen, "text", "doc_id", model)
      .orderBy($"id").as[(Long, Double, Long)].collect()
    assert(s(0)._3 == 1L, s"wordy unseen doc should score good: ${s.toSeq}")
    assert(s(1)._3 == 0L, s"junk unseen doc should score bad: ${s.toSeq}")
    // plan shape: broadcast join of the weight table, no shuffle of it
    val plan = QualityClassifier.score(unseen, "text", "doc_id", model)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("centroid classifier separates disjoint-vocab classes perfectly") {
    // three classes with disjoint vocabularies: Hellinger nearest
    // centroid must recover every label, including for docs whose token
    // MIX differs from their class centroid
    val docs3 = Seq(
      (0L, "apple pear plum apple", "fruit"),
      (1L, "pear pear plum", "fruit"),
      (2L, "plum apple", "fruit"),
      (10L, "iron zinc gold gold", "metal"),
      (11L, "gold iron", "metal"),
      (12L, "zinc zinc iron gold", "metal"),
      (20L, "oak elm fir", "tree"),
      (21L, "fir oak oak oak", "tree"),
      (22L, "elm fir", "tree")).toDF("doc_id", "text", "source")
    val out = QualityClassifier
      .centroidClassifier(docs3, "text", "doc_id", "source", numBuckets = 64)
    assert(out.count() === 9L)
    assert(out.agg(org.apache.spark.sql.functions.sum($"correct")).head.getLong(0) === 9L)
  }

  test("centroid classifier beats random on the harness mixture signal") {
    // the generative model's honest ceiling on the harness corpus is
    // well below d36's discriminative softmax (that's the price of its
    // bit-exact oracle contract) but must stay a clear multiple of the
    // 1/20 random baseline
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = QualityClassifier.centroidClassifier(d, "text", "doc_id", "source")
    val (n, ok) = out
      .agg(org.apache.spark.sql.functions.count($"correct"),
        org.apache.spark.sql.functions.sum($"correct"))
      .as[(Long, Long)].head()
    val acc = ok.toDouble / n
    assert(acc >= 2.5 / 20.0, s"accuracy $acc not a clear multiple of random (0.05)")
  }

  test("perceptron separates disjoint-vocab classes perfectly") {
    // linearly separable by construction: the mistake-driven updates
    // must converge to zero training error within the epoch budget
    val docs3 = Seq(
      (0L, "apple pear plum apple", "fruit"),
      (1L, "pear pear plum", "fruit"),
      (2L, "plum apple", "fruit"),
      (10L, "iron zinc gold gold", "metal"),
      (11L, "gold iron", "metal"),
      (12L, "zinc zinc iron gold", "metal"),
      (20L, "oak elm fir", "tree"),
      (21L, "fir oak oak oak", "tree"),
      (22L, "elm fir", "tree")).toDF("doc_id", "text", "source")
    val out = QualityClassifier
      .perceptronClassifier(docs3, "text", "doc_id", "source", numBuckets = 64, epochs = 10)
    assert(out.count() === 9L)
    assert(out.agg(org.apache.spark.sql.functions.sum($"correct")).head.getLong(0) === 9L)
  }

  test("perceptron is deterministic and at least matches the generative d63 ceiling") {
    // the discriminative model must not fall below the generative
    // classifier it complements (d63's gate is 2.5x random; hold the
    // perceptron to a strictly higher bar) and must replay identically
    // across runs — the property its DuckDB bit-oracle relies on
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def run() = QualityClassifier
      .perceptronClassifier(d, "text", "doc_id", "source",
        numBuckets = 1024, epochs = 4, sampleCap = 240L)
    val out = run()
    val (n, ok) = out
      .agg(org.apache.spark.sql.functions.count($"correct"),
        org.apache.spark.sql.functions.sum($"correct"))
      .as[(Long, Long)].head()
    val acc = ok.toDouble / n
    assert(acc >= 5.0 / 20.0, s"accuracy $acc below the 5x-random floor")
    val a = out.orderBy($"doc_id").collect().map(_.toSeq)
    val b = run().orderBy($"doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b), "perceptron training is not deterministic")
  }

  test("hashedTermCounts is staged: repeated calls share one cached table") {
    // the r13 serve-path optimization: d36's softmax serve and d65's
    // perceptron serve read the IDENTICAL (id, bucket, c) table; the
    // StagingCache memo (semantic-hash keyed) must hand back the same
    // cached frame, and a semantically different input must not collide
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val c1 = QualityClassifier.hashedTermCounts(d, "text", "doc_id", 64)
    val c2 = QualityClassifier.hashedTermCounts(d, "text", "doc_id", 64)
    assert(c1 eq c2, "same plan + params must return the memoized cached table")
    val c3 = QualityClassifier.hashedTermCounts(d, "text", "doc_id", 32)
    assert(!(c1 eq c3), "different numBuckets must not share a cache entry")
    val c4 = QualityClassifier
      .hashedTermCounts(d.filter($"doc_id" % 2 === 0), "text", "doc_id", 64)
    assert(!(c1 eq c4), "different input plan must not share a cache entry")
    // and the counts themselves are what the unstaged subtree computes
    val direct = d
      .select($"doc_id".as("id"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.concat(
            graft.functions.TextFunctions.tokens($"text"),
            graft.functions.TextFunctions.allShingles($"text", 2))).as("term"))
      .groupBy($"id",
        org.apache.spark.sql.functions.pmod(
          graft.functions.TextFunctions.portableHash($"term"),
          org.apache.spark.sql.functions.lit(64)).cast("int").as("bucket"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("c"))
    assert(c1.exceptAll(direct).isEmpty && direct.exceptAll(c1).isEmpty,
      "staged counts differ from the direct subtree")
  }
}
