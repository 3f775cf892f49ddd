package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for embedding math over `array<float>` columns —
  * everything is built from codegen'd higher-order functions
  * (`zip_with` / `aggregate` / `transform`), no UDFs, so vector arithmetic
  * stays inside WholeStageCodegen and scales linearly with the scan.
  *
  * Floats are widened to double BEFORE any arithmetic and folded strictly
  * left-to-right, which is the same evaluation order DuckDB's
  * `list_dot_product` uses — that makes cosine values bit-comparable
  * between engine and oracle.
  */
object VectorFunctions {

  /** `array<float>` → `array<double>` (widen once, before arithmetic). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential left-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (computed fully — inputs need not be unit-norm). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Guarded cosine from a precomputed dot and norm product. Under
    * Spark's default ANSI mode a double division by zero THROWS (it does
    * not return NULL), so every cosine over possibly-zero-norm vectors
    * must branch before dividing: zero norms yield NULL — the same value
    * DuckDB's unguarded division produces — instead of aborting. */
  def cosineOrNull(dotv: Column, denom: Column): Column =
    when(denom > 0, dotv / denom)

  /** Deterministic ±1.0 hyperplane for sign-random-projection LSH, derived
    * at PLAN-BUILD time from the shared md5 hash: component d of plane j
    * is +1.0 iff bit 0 of `Md5Bits.hash60("j,d")` is set. Engine-agnostic
    * — the DuckDB oracle rebuilds the identical planes from `md5(j||','||d)`
    * — and embedded as a literal array, so every executor sees the same
    * hyperplanes with zero broadcast and zero per-row hashing. */
  def srpPlane(plane: Int, dims: Int): Seq[Double] =
    (0 until dims).map { d =>
      if ((Md5Bits.hash60(s"$plane,$d") & 1L) == 1L) 1.0 else -1.0
    }

  /** One sign-random-projection bit: sign of v · plane_i, the dot folded
    * left-to-right like every other dot in the stack (oracle parity with
    * DuckDB's `list_dot_product(v, plane)`). Projection >= 0 → bit 1
    * (zero vectors get all-ones, same rule on both engines). */
  def srpBit(v: Column, plane: Int, dims: Int): Column =
    when(dot(v, typedlit(srpPlane(plane, dims))) >= 0, lit(1L)).otherwise(lit(0L))

  /** `nBits`-bit sign-random-projection sketch packed into one long.
    * Hamming distance between sketches estimates angular distance.
    * NULL or wrong-dimension vector → NULL sketch (it must not silently
    * collide with the zero vector's sketch in bucketed candidate
    * generation; a short vector would zip-pad with nulls mid-fold). */
  def srpSketch(v: Column, nBits: Int, dims: Int): Column =
    when(v.isNull || size(v) =!= dims, lit(null).cast("long"))
      .otherwise((0 until nBits).map(i => shiftleft(srpBit(v, i, dims), i))
        .reduce(_.bitwiseOR(_)))

  // ── int8 scalar quantization ─────────────────────────────────────────
  // 4× storage/scan reduction for a 100 TB embedding corpus: each vector
  // keeps a per-vector scale (max|x|/127) and rounds components to
  // tinyint. Per-vector (not global) scaling bounds the relative error
  // regardless of vector magnitude; reconstruction error per component
  // is <= scale/2.

  /** Per-vector quantization scale: max |x| / 127 (0-vectors → scale 1
    * so dequantization stays total). */
  def i8Scale(v: Column): Column = {
    val m = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    when(m > 0, m / 127.0).otherwise(lit(1.0))
  }

  /** Quantize to `array<tinyint>` given the scale from [[i8Scale]]. */
  def quantizeI8(v: Column, scale: Column): Column =
    transform(v, x => round(x / scale).cast("tinyint"))

  /** Dequantize back to `array<double>`. */
  def dequantizeI8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)
}
