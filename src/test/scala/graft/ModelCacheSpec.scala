package graft

import graft.functions.Similarity
import graft.sources.{ModelCache, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ANN query family (d15/d26/d27/d31) trains identical models from the
  * same corpus; `cacheKey` memoizes the trained arrays (kilobytes) so one
  * training pass serves the whole family. These tests lock (a) hit = same
  * instance, no retraining, (b) caching never changes answers. */
class ModelCacheSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.load(spark, dir, "embeddings").cache()

  test("cacheKey memoizes trained models across calls (same instance, keyed by params)") {
    val key = Some("modelcache-spec")
    val a = Similarity.trainIvfCentroids(emb, "vec_id", "embedding", 8,
      iters = 1, sampleN = 500, cacheKey = key)
    assert(ModelCache.contains(spark, "ivf_cents:modelcache-spec:k=8:it=1:n=500"))
    val b = Similarity.trainIvfCentroids(emb, "vec_id", "embedding", 8,
      iters = 1, sampleN = 500, cacheKey = key)
    assert(a eq b, "second call with the same key must return the cached instance")
    // different params -> different key -> fresh training
    val c = Similarity.trainIvfCentroids(emb, "vec_id", "embedding", 4,
      iters = 1, sampleN = 500, cacheKey = key)
    assert(!(a eq c) && c.length == 4)
  }

  test("pq code cache never reuses codes across differing training params") {
    // the encoded-codes StagingCache key must mirror the FULL pq_books
    // suffix: a caller sharing cacheKey/nSub/kSub but differing in a
    // TRAINING param (iters here) trains a different codebook, so its
    // codes must be a fresh encode — reusing the other caller's codes
    // would silently score against the wrong book
    val qs = emb.filter(col("vec_id") < 3)
    def run(iters: Int) =
      Similarity.pqTopK(emb, qs, "vec_id", "embedding", 3,
        nSub = 8, kSub = 8, shortlist = 20, iters = iters, sampleN = 500,
        cacheKey = Some("modelcache-params")).count()
    run(1)
    run(2)
    val codesKey = (it: Int) => s"pq_codes:modelcache-params:s=8:k=8:it=$it:n=500:u=true"
    assert(
      graft.sources.StagingCache.contains(spark, codesKey(1)) &&
        graft.sources.StagingCache.contains(spark, codesKey(2)),
      "varying a training param must produce a fresh encode under its own key")
  }

  test("ModelCache builds for different keys do not serialize") {
    // per-key futures, not a value map under one lock: while key A's
    // (distributed, slow) build is in flight, key B's build must proceed
    val gate = new java.util.concurrent.CountDownLatch(1)
    val started = new java.util.concurrent.CountDownLatch(1)
    val tA = new Thread(() =>
      ModelCache.getOrElseUpdate(spark, "mc-conc-a") { started.countDown(); gate.await(); 1 })
    tA.start()
    started.await()
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val tB = new Thread(() => {
      ModelCache.getOrElseUpdate(spark, "mc-conc-b")(2); done.set(true)
    })
    tB.start()
    tB.join(10000)
    assert(done.get, "build for an unrelated key blocked behind an in-flight build")
    gate.countDown()
    tA.join(10000)
    assert(ModelCache.contains(spark, "mc-conc-a") && ModelCache.contains(spark, "mc-conc-b"))
  }

  test("shared models do not change answers: cached ivf-pq == uncached ivf-pq") {
    val qs = emb.filter(col("vec_id") < 5)
    def run(key: Option[String]) =
      Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding", 3,
        nLists = 8, nProbe = 4, nSub = 8, kSub = 8, iters = 1, cacheKey = key)
        .orderBy("query_id", "rank").collect().map(_.toSeq)
    val fresh = run(None)
    val cachedOnce = run(Some("modelcache-eq"))
    val cachedTwice = run(Some("modelcache-eq")) // second call hits both memos
    assert(fresh.sameElements(cachedOnce))
    assert(fresh.sameElements(cachedTwice))
  }
}
