package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch (Misra & Gries, "Finding repeated
  * elements", 1982; the Space-Saving/MG family every streaming system
  * ships) — the FREQUENCY sketch that complements the engine's KMV
  * cardinality sketch (q33).
  *
  * Why it exists at the 100 TB point: an exact top-k over an exploding key
  * space (corpus vocabulary, URL hosts, user agents) needs a shuffle with
  * one state entry per DISTINCT key; the MG sketch keeps a fixed k-entry
  * summary per partition and merges pairwise, so memory is O(k) per task
  * regardless of cardinality, with the classic guarantee: every item with
  * true count > n/(k+1) is IN the summary, and each reported lower-bound
  * count undercounts by at most the sketch's decrement total (≤ n/(k+1)).
  *
  * Determinism caveat — stated, not hidden: unlike the engine's
  * exact-integer aggregates, an MG summary's SET depends on merge order,
  * so this sketch is NOT on the DuckDB hash-match surface; what IS
  * order-independent is the guarantee itself, which HeavyHittersSpec
  * property-checks under randomized partitionings (guaranteed items always
  * present, error bound always honored).
  */
object HeavyHitters {

  /** counters + total decrement weight (the error bound carried along) */
  final case class MgState(counters: Map[String, Long], decremented: Long)

  final case class Hit(item: String, lowerBound: Long)

  /** k-entry Misra-Gries aggregator over a string column. */
  final class MgAggregator(k: Int)
      extends Aggregator[String, MgState, Seq[Hit]] {
    require(k > 0, "MG sketch needs k > 0 counters")

    override def zero: MgState = MgState(Map.empty, 0L)

    override def reduce(s: MgState, item: String): MgState =
      add(s, item, 1L)

    private def add(s: MgState, item: String, w: Long): MgState = {
      val c = s.counters
      if (c.contains(item)) s.copy(counters = c.updated(item, c(item) + w))
      else if (c.size < k) s.copy(counters = c.updated(item, w))
      else {
        // decrement-all by the limiting weight; drop zeros, keep remainder
        val dec = math.min(w, c.values.min)
        val kept = c.map { case (i, n) => i -> (n - dec) }.filter(_._2 > 0)
        val rest = w - dec
        val next = MgState(kept, s.decremented + dec)
        if (rest > 0) add(next, item, rest) else next
      }
    }

    /** pairwise merge: add each of b's counters as weighted items */
    override def merge(a: MgState, b: MgState): MgState = {
      val merged = b.counters.toSeq.sortBy(_._1) // stable fold order
        .foldLeft(a.copy(decremented = a.decremented + b.decremented)) {
          case (s, (item, w)) => add(s, item, w)
        }
      merged
    }

    override def finish(s: MgState): Seq[Hit] =
      s.counters.toSeq.sortBy { case (i, n) => (-n, i) }
        .map { case (i, n) => Hit(i, n) }

    override def bufferEncoder: Encoder[MgState] = Encoders.product[MgState]
    override def outputEncoder: Encoder[Seq[Hit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def sketch(k: Int): MgAggregator = new MgAggregator(k)
}
