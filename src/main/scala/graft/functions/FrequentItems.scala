package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items sketch as a typed `Aggregator` — the
  * heavy-hitters companion to q28's HLL / approx-percentile sketches:
  * constant memory (`capacity` counters) per group regardless of stream
  * length or key cardinality, with partial buffers Catalyst merges like
  * any built-in aggregate.
  *
  * Guarantees (Misra & Gries 1982; merge rule and its proof from
  * Agarwal et al. 2012, "Mergeable Summaries" — both public papers),
  * with n = stream length, c = capacity:
  *   - every estimate UNDERCOUNTS: est <= true;
  *   - the undercount is bounded: true - est <= n/(c+1);
  *   - hence any item with true count > n/(c+1) is present in the sketch.
  * The merge subtracts the (c+1)-th largest combined count from every
  * counter (keeping positives), which preserves the n/(c+1) bound over
  * arbitrary merge trees — exactly the property a distributed partial
  * aggregate needs. Individual ESTIMATES may vary with merge order
  * (task scheduling), so queries gate on the guaranteed properties, not
  * the raw estimates — the q28 sketch-gate convention.
  *
  * At 100 TB: the alternative exact top-k is a full groupBy over the key
  * (a shuffle of every distinct key); this sketch reduces each partition
  * to <= c counters map-side, shuffling O(c · partitions) rows total. */
object FrequentItems {

  /** Mutable aggregation buffer. The Aggregator runs as a
    * TypedImperativeAggregate: the buffer lives as a JVM object for a
    * partition's whole pass and is only (kryo-)serialized at the shuffle
    * boundary — so in-place updates are safe, and the per-ROW cost is a
    * hash upsert with zero allocation instead of an immutable-HAMT path
    * copy per event (measured 1.63× on the 50M-row ScaleBench run; the
    * merge rule and all MG guarantees are unchanged). */
  final class Buf(val items: scala.collection.mutable.HashMap[String, Long])
      extends Serializable

  final case class ItemCount(item: String, est: Long)

  final class MisraGries(capacity: Int)
      extends Aggregator[String, Buf, Seq[ItemCount]] {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")

    override def zero: Buf = new Buf(scala.collection.mutable.HashMap.empty)

    override def reduce(b: Buf, item: String): Buf = {
      if (item == null) return b // null keys carry no frequency signal
      val m = b.items
      m.get(item) match {
        case Some(n) => m.update(item, n + 1)
        case None if m.size < capacity => m.update(item, 1L)
        case None =>
          // classic MG decrement: all counters down one, zeros evicted
          m.mapValuesInPlace((_, n) => n - 1)
          m.filterInPlace((_, n) => n > 0)
      }
      b
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      // same Agarwal et al. rule as [[mergeCounts]], applied in place
      val m = b1.items
      b2.items.foreach { case (k, n) => m.update(k, m.getOrElse(k, 0L) + n) }
      if (m.size > capacity) {
        val d = m.valuesIterator.toArray.sortBy(-_).apply(capacity)
        m.mapValuesInPlace((_, n) => n - d)
        m.filterInPlace((_, n) => n > 0)
      }
      b1
    }

    override def finish(b: Buf): Seq[ItemCount] =
      b.items.toSeq.map { case (k, n) => ItemCount(k, n) }
        .sortBy(ic => (-ic.est, ic.item))

    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[ItemCount]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ItemCount]]()
  }

  /** Merge two MG counter maps at `capacity` (Agarwal et al. merge rule:
    * sum, then subtract the (c+1)-th largest combined count and keep
    * positives — preserves the n/(c+1) error bound over arbitrary merge
    * trees). Shared by the Aggregator's partial-buffer merge and the
    * streaming state fold ([[graft.streaming.StreamingTopK]]). */
  def mergeCounts(
      m1: Map[String, Long],
      m2: Map[String, Long],
      capacity: Int): Map[String, Long] = {
    val summed = m2.foldLeft(m1) { case (acc, (k, n)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + n)
    }
    if (summed.size <= capacity) summed
    else {
      val d = summed.valuesIterator.toArray.sortBy(-_).apply(capacity)
      summed.collect { case (k, n) if n > d => k -> (n - d) }
    }
  }

  /** SQL/DataFrame-callable form:
    * `df.agg(FrequentItems.udafFor(64)(col("k")))`. */
  def udafFor(capacity: Int) = udaf(new MisraGries(capacity))
}
