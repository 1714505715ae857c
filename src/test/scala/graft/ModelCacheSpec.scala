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
