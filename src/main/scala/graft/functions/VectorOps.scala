package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Vector math over `array<float>` embedding columns (north-star
 * "similarity search" operator family; the reference itself has no
 * expression engine, SURVEY.md §2.8). The scalar kernels dispatch to
 * native codegen'd Catalyst expressions ([[VectorKernels]]) — no UDFs,
 * whole-stage codegen spans the similarity hot loop.
 *
 * All math is double-precision with sequential accumulation so results
 * are reproducible bit-for-bit across engines and runs.
 */
object VectorOps {

  /** Σ aᵢ·bᵢ with sequential (index-order) accumulation.
    * Dispatches to the codegen'd [[VectorKernels.FloatVecDot]]
    * (registered by GraftSession) — double accumulation in index order,
    * bit-identical to the HOF formulation it replaced. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Driver-side fold rounding: floor(x·10^s + 0.5)/10^s — every step
    * is an IEEE double op, so ANY engine that mirrors the same three
    * ops literally (multiply, add, floor, divide) reproduces it
    * bit-for-bit. Library round() calls must NOT be mixed into a
    * hash-gated fold: Spark rounds the shortest decimal repr while
    * DuckDB rounds the binary value, and they disagree on
    * …4999-vs-…5 tie inputs (q_holt found one on day 9). */
  def foldRound(x: Double, scale: Int): Double = {
    val p = math.pow(10.0, scale)
    math.floor(x * p + 0.5) / p
  }

  /** Column twin of [[foldRound]] for engine-side hash-gated rounding:
    * `floor(x·10^s + 0.5)/10^s` as a Catalyst expression. Library
    * `round(DOUBLE, n)` is engine-dependent on tie inputs (Spark rounds
    * the shortest decimal repr, DuckDB the binary value — and DuckDB's
    * behavior has shifted across its own versions), so every hashed
    * double that needs rounding goes through this form, mirrored
    * literally as `floor(x * 1eN + 0.5) / 1eN` in the oracle SQL. */
  def foldRound(c: Column, scale: Int): Column = {
    val p = math.pow(10.0, scale)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** ‖a‖₂ */
  def norm(a: Column): Column = call_function("graft_norm", a)

  /** Cosine similarity; 0-vector-safe (returns null on zero norm). */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column = call_function("graft_l2sq", a, b)

  /**
   * Random-hyperplane (SimHash) signature of an embedding: `planes`
   * sign bits packed into a long. Hyperplane components are ±1 derived
   * from a splitmix-style deterministic hash of (plane, dim) — no
   * stored model, identical on every executor, and the dot with a ±1
   * plane is just a signed sum.
   *
   * The sign matrix is one literal array-of-arrays column and the dot
   * products run through `zip_with`/`aggregate`, keeping the expression
   * tree O(1) in planes×dims — an unrolled sum (planes×dims terms)
   * makes whole-stage codegen emit megabytes of source and stalls the
   * driver for minutes.
   */
  def hyperplaneSignature(vec: Column, planes: Int, dims: Int): Column = {
    require(planes <= 63, "signature packs into one long")
    // native codegen'd kernel (VectorKernels.HyperplaneSig) — the HOF
    // formulation (transform × zip_with × aggregate) evaluated
    // planes×dims interpreted lambdas per row and dominated every
    // signature-based query's cost. Same splitmix64 sign scheme, same
    // accumulation order → identical signatures.
    call_function("graft_hyperplane", vec, lit(planes), lit(dims))
  }

  /** Hamming distance between two packed signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
