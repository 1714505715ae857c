package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: probe a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] with a long key —
  * `bloom_might_contain(bloom_bytes, key)`.
  *
  * The sketch rides as a BROADCAST handle, not as expression bytes and
  * not as a Literal child. The two rejected designs are both measured
  * failures:
  *   - a multi-MB binary Literal in the tree makes every optimizer pass
  *     that compares or canonicalizes expressions walk the whole array
  *     (the `typedLit` codebook trap in NOTES.md — a ~8 MB bloom
  *     literal turned a 9 s dedup into 450 s);
  *   - bytes as a plain expression field ship inside the task binary,
  *     so EVERY CONCURRENT TASK deserializes and holds its own copy of
  *     the bytes AND its own decoded BitArray — at a 100M-key sketch
  *     (~120 MB) and 32 task slots that is ~7.7 GB of transient heap,
  *     the measured OOM of the round-12 `stream 250 10000 dedup_fold`
  *     gate. The same multiplication costs a 32-core executor the same
  *     way at cluster scale.
  * With a broadcast, the bytes land ONCE per executor in the block
  * manager, and [[BloomMightContain.bloomFor]] memoizes ONE decoded
  * filter per JVM per sketch (small LRU keyed by (SparkEnv, broadcast id); the
  * decode runs under the cache lock precisely so a stage's worth of
  * tasks can't all decode in parallel). Per-probe cost is unchanged:
  * each task instance resolves the shared filter once (transient lazy)
  * and then probes it directly inside whole-stage codegen.
  *
  * The registry builder still accepts a foldable binary first argument
  * (`call_function("bloom_might_contain", lit(bytes), col)`): it
  * evaluates the bytes at analysis time, broadcasts them (memoized by
  * array identity per context, so a serve loop re-constructing over the
  * SAME byte array reuses one broadcast; a mutated sketch — fresh array
  * per streaming batch — correctly gets a fresh one), and the Literal
  * never enters the resolved plan. Evicted/unreferenced broadcasts are
  * reclaimed by Spark's ContextCleaner once no plan holds them.
  *
  * Probe semantics match the build half (public
  * `DataFrameStatFunctions.bloomFilter`, raw `putLong`): do NOT mix with
  * Spark's internal `BloomFilterAggregate`, which pre-hashes keys with
  * xxhash64.
  *
  * A bloom filter can return false POSITIVES but never false negatives,
  * so `false` proves the key is not in the indexed set — callers prune on
  * `false` and verify the (rare) `true`s with an exact join.
  */
case class BloomMightContain(bloomBcast: Broadcast[Array[Byte]], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  // keep the broadcast handle out of treeString/explain output
  override def flatArguments: Iterator[Any] = Iterator(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (bloomBcast == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: bloom-filter broadcast must be set")
    else if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  // one shared-filter resolution per task instance, then direct probes
  @transient private lazy val bloom: BloomFilter =
    BloomMightContain.bloomFor(bloomBcast)

  /** Public so generated code can call it through the plan reference. */
  def mightContainLong(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(v: Any): Any =
    mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, v => s"$ref.mightContainLong($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {

  /** Decoded-filter cache, ONE per JVM per sketch. Keyed by
    * (SparkEnv, broadcast id), NOT broadcast id alone: broadcast ids are
    * a per-SparkContext counter starting at 0, so after a same-JVM
    * context stop/restart (test suites, local tooling) a NEW context's
    * sketch can collide with a cached entry's id and a probe would
    * silently answer from the OLD context's filter — false negatives on
    * an expression whose contract is "false proves absence". The SparkEnv
    * instance is fresh per context on the driver and lives exactly as
    * long as the app on an executor, so the pair is collision-free in
    * both places — while still being ONE key per executor JVM, which is
    * what keeps the decode-once guarantee (the Broadcast WRAPPER object
    * is deserialized per task, so instance identity would decode per
    * task slot — the 32 × 240 MB OOM this cache exists to prevent).
    * Tiny LRU: a streaming dedup holds one live sketch (plus the
    * previous batch's during handover); anything older is dead weight. */
  private val bloomCacheMax = 2
  private val bloomCache =
    scala.collection.mutable.ListBuffer.empty[(AnyRef, Long, BloomFilter)]

  /** The shared decoded filter for `b` — decode-once-per-JVM. The
    * decode runs under the lock deliberately: the alternative is every
    * task slot of the first stage decoding a multi-100MB BitArray in
    * parallel, which is the OOM this design removes. */
  private[graft] def bloomFor(b: Broadcast[Array[Byte]]): BloomFilter =
    bloomCache.synchronized {
      val env: AnyRef = org.apache.spark.SparkEnv.get
      bloomCache.indexWhere(e => (e._1 eq env) && e._2 == b.id) match {
        case i if i >= 0 =>
          val hit = bloomCache.remove(i)
          bloomCache.prepend(hit)
          hit._3
        case _ =>
          val bf = BloomFilter.readFrom(new ByteArrayInputStream(b.value))
          bloomCache.prepend((env, b.id, bf))
          if (bloomCache.length > bloomCacheMax) bloomCache.remove(bloomCacheMax)
          bf
      }
    }

  /** Broadcast memo keyed by (context, byte-array IDENTITY): a serve
    * loop constructing repeatedly over one held sketch reuses one
    * broadcast; a per-batch re-serialized sketch (fresh array) gets a
    * fresh one. The BYTES are held via WeakReference — the memo must not
    * be the thing keeping a 100M-key (~120 MB serialized) sketch alive
    * after every plan and caller reference is gone; once the caller
    * drops its array the entry can never match again (identity key), so
    * it is swept at the next insert and the Broadcast handle becomes
    * GC-reachable garbage for the ContextCleaner. Stopped contexts are
    * swept at insert too (the pruneMemo rule). */
  private val bcastMemoMax = 2
  private val bcastMemo = scala.collection.mutable.ListBuffer
    .empty[(SparkContext, java.lang.ref.WeakReference[Array[Byte]], Broadcast[Array[Byte]])]
  private[graft] var broadcastsCreated = 0 // spec hook

  private def broadcastBytes(bytes: Array[Byte]): Broadcast[Array[Byte]] = {
    val sc = SparkSession.active.sparkContext
    bcastMemo.synchronized {
      bcastMemo.indexWhere(e => (e._1 eq sc) && (e._2.get eq bytes)) match {
        case i if i >= 0 =>
          val hit = bcastMemo.remove(i)
          bcastMemo.prepend(hit)
          hit._3
        case _ =>
          val b = sc.broadcast(bytes)
          broadcastsCreated += 1
          bcastMemo.filterInPlace(e => !e._1.isStopped && e._2.get != null)
          bcastMemo.prepend((sc, new java.lang.ref.WeakReference(bytes), b))
          if (bcastMemo.length > bcastMemoMax) bcastMemo.remove(bcastMemoMax)
          b
      }
    }
  }

  /** Register `bloom_might_contain(bloom, key)`; idempotent like
    * [[CosineSimilarity.register]]. The first argument must be a
    * foldable binary expression (e.g. `lit(bytes)`); it is evaluated
    * ONCE here, at analysis time, broadcast, and never enters the
    * resolved plan. Call through `functions.call_function` so the bytes
    * ride as a Column. */
  def register(spark: SparkSession): Unit = {
    val ident = FunctionIdentifier("bloom_might_contain")
    if (!spark.sessionState.functionRegistry.functionExists(ident)) {
      spark.sessionState.functionRegistry.registerFunction(
        ident,
        new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "bloom_might_contain takes exactly 2 arguments")
          val bloomExpr = children.head
          require(
            bloomExpr.foldable && bloomExpr.dataType == BinaryType,
            "bloom_might_contain: first argument must be a foldable binary (the serialized sketch)")
          val bytes = bloomExpr.eval().asInstanceOf[Array[Byte]]
          require(bytes != null && bytes.nonEmpty,
            "bloom_might_contain: bloom-filter bytes must be non-empty")
          BloomMightContain(broadcastBytes(bytes), children(1))
        })
    }
  }
}
