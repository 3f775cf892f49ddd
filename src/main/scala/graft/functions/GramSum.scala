package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact integer Gram-matrix accumulator state: one Long "fast lane" per
  * slot plus a lazily-allocated per-slot BigInteger spill. Adds ride plain
  * Long arithmetic with a branchless overflow test; a slot that would
  * overflow moves its running value into the spill and restarts the fast
  * lane at zero — so the state stays EXACT at any scale (the 100 TB
  * safety the old DECIMAL(38,0) shuffle bought) while the per-element hot
  * path is a single add. The same chunked fast/slow idiom as
  * MRPipeline's spill-safe combine.
  */
final class GramBuf(val m: Int) extends Serializable {
  val fast: Array[Long] = new Array[Long](m)
  var slow: Array[BigInteger] = _ // null until first spill

  @inline def add(p: Int, t: Long): Unit = {
    val a = fast(p)
    val s = a + t
    // Hacker's Delight §2-13: signed-add overflow iff operands share the
    // sign the sum lost
    if (((a ^ s) & (t ^ s)) < 0L) spill(p, a, t) else fast(p) = s
  }

  private def spill(p: Int, a: Long, t: Long): Unit = {
    if (slow == null) slow = new Array[BigInteger](m)
    val prev = if (slow(p) == null) BigInteger.ZERO else slow(p)
    slow(p) = prev.add(BigInteger.valueOf(a)).add(BigInteger.valueOf(t))
    fast(p) = 0L
  }

  def addBig(p: Int, t: BigInteger): Unit = {
    if (slow == null) slow = new Array[BigInteger](m)
    val prev = if (slow(p) == null) BigInteger.ZERO else slow(p)
    slow(p) = prev.add(t)
  }

  /** Exact current value of a slot (spill + fast lane). */
  def value(p: Int): BigInteger = {
    val s = if (slow == null || slow(p) == null) BigInteger.ZERO else slow(p)
    s.add(BigInteger.valueOf(fast(p)))
  }
}

/** Upper-triangle Gram + linear sums + count of quantized vectors, as ONE
  * typed aggregate instead of a d(d+1)/2-terms-per-row explode.
  *
  * Slot layout (shared with SimilarityQueries.pcaSolve): i·d+j for the
  * pair sum Σ qᵢ·qⱼ (j ≥ i; the lower triangle stays zero), d²+i for the
  * linear sum Σ qᵢ, and d²+d for the row count. Output is the BigInteger
  * byte form per slot, so the driver-side eigensolve reads the exact
  * integers the old DECIMAL(38,0) shuffle produced — bit-identical sums,
  * two orders of magnitude fewer aggregate rows (one buffer per
  * partition vs d(d+1)/2+d+1 exploded structs per INPUT row). Partial
  * aggregation is the Aggregator contract itself: per-partition reduce,
  * one ~35 KB buffer per partition to the final merge.
  *
  * Inputs with |q| beyond √(Long.MaxValue) take a per-row BigInteger
  * path so products can never overflow silently; in-range rows pay one
  * long multiply + one checked add per slot.
  */
final case class GramSumAgg(d: Int)
    extends Aggregator[Array[Long], GramBuf, Array[Array[Byte]]] {

  private val m = d * d + d + 1
  // largest |x| whose square still fits a signed 64-bit long
  private val SafeAbs = 3037000499L

  override def zero: GramBuf = new GramBuf(m)

  override def reduce(b: GramBuf, q: Array[Long]): GramBuf = {
    require(q.length == d, s"expected $d-dim vector, got ${q.length}")
    var safe = true
    var k = 0
    while (k < d && safe) { val a = math.abs(q(k)); safe = a <= SafeAbs; k += 1 }
    if (safe) {
      var i = 0
      while (i < d) {
        val xi = q(i)
        val base = i * d
        var j = i
        while (j < d) { b.add(base + j, xi * q(j)); j += 1 }
        b.add(d * d + i, xi)
        i += 1
      }
    } else {
      // out-of-range magnitudes: exact BigInteger row (rare by design)
      var i = 0
      while (i < d) {
        val xi = BigInteger.valueOf(q(i))
        val base = i * d
        var j = i
        while (j < d) {
          b.addBig(base + j, xi.multiply(BigInteger.valueOf(q(j)))); j += 1
        }
        b.addBig(d * d + i, xi)
        i += 1
      }
    }
    b.add(d * d + d, 1L)
    b
  }

  override def merge(b1: GramBuf, b2: GramBuf): GramBuf = {
    var p = 0
    while (p < m) {
      b1.add(p, b2.fast(p))
      if (b2.slow != null && b2.slow(p) != null) b1.addBig(p, b2.slow(p))
      p += 1
    }
    b1
  }

  override def finish(b: GramBuf): Array[Array[Byte]] =
    Array.tabulate(m)(p => b.value(p).toByteArray)

  override def bufferEncoder: Encoder[GramBuf] = Encoders.kryo[GramBuf]
  override def outputEncoder: Encoder[Array[Array[Byte]]] =
    ExpressionEncoder[Array[Array[Byte]]]()
}
