package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** One scored candidate neighbor. */
case class Neighbor(id: Long, sim: Double)

/** Bounded top-k aggregator: keeps only the ~k best (sim desc, id asc)
  * neighbors in its buffer, so PARTIAL aggregation caps what each map task
  * shuffles at O(k) rows per group — the piece that makes brute-force knn
  * scale: a 1000-executor scan of a 100 TB corpus shuffles
  * O(queries × k × partitions) neighbors, never O(corpus).
  *
  * (The reference's only top-k is a single-reducer global argmax,
  * `performance_functions/query_3_phase_3.py:17-36`; this is the
  * partial-aggregating generalization Spark's model makes natural.)
  *
  * Runtime shape: Spark's ScalaAggregator is a TypedImperativeAggregate —
  * the ArrayBuffer lives as a plain JVM object per group within a
  * partition (cheap in-place appends) and is serialized (kryo) only
  * across the partial→final shuffle, where it is already compacted to k.
  *
  * Determinism: total order (sim desc, id asc); ties cannot reorder.
  */
class TopKAggregator(k: Int)
    extends Aggregator[Neighbor, ArrayBuffer[Neighbor], Seq[Neighbor]] {

  // NaN sims (e.g. cosine of a zero-norm vector) rank WORST, via a total
  // order — raw Double comparisons make NaN incomparable, which is
  // intransitive and can blow up TimSort ("Comparison method violates
  // its general contract") on buffers past the insertion-sort threshold.
  private def rank(x: Double): Double =
    if (java.lang.Double.isNaN(x)) Double.NegativeInfinity else x

  private def lt(a: Neighbor, b: Neighbor): Boolean = {
    val ra = rank(a.sim)
    val rb = rank(b.sim)
    ra > rb || (ra == rb && a.id < b.id)
  }

  /** Keep the buffer bounded: compact to the k best when it doubles. */
  private def compact(buf: ArrayBuffer[Neighbor]): ArrayBuffer[Neighbor] =
    if (buf.length <= 2 * k) buf
    else {
      val best = buf.sortWith(lt).take(k)
      buf.clear()
      buf ++= best
    }

  override def zero: ArrayBuffer[Neighbor] = ArrayBuffer.empty

  override def reduce(buf: ArrayBuffer[Neighbor], n: Neighbor): ArrayBuffer[Neighbor] =
    compact(buf += n)

  override def merge(a: ArrayBuffer[Neighbor], b: ArrayBuffer[Neighbor]): ArrayBuffer[Neighbor] =
    compact(a ++= b)

  override def finish(buf: ArrayBuffer[Neighbor]): Seq[Neighbor] =
    buf.sortWith(lt).take(k).toList

  override def bufferEncoder: Encoder[ArrayBuffer[Neighbor]] =
    Encoders.kryo[ArrayBuffer[Neighbor]]

  override def outputEncoder: Encoder[Seq[Neighbor]] =
    ExpressionEncoder[Seq[Neighbor]]()
}
