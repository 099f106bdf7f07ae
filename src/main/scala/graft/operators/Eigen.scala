package graft.operators

/** Deterministic symmetric eigendecomposition for MODEL-SIZED matrices
  * (the PCA step of an embedding pipeline: a dim×dim covariance is a
  * few KB however large the corpus — 64×64 here — so the
  * decomposition is a driver-side scalar, exactly like the collected
  * k-means quantizer; the DISTRIBUTED work is the one-pass covariance
  * aggregation and the projection scan, never this).
  *
  * Classical cyclic Jacobi (Golub & Van Loan §8.5): sweep the strict
  * upper triangle in FIXED row-major order, each rotation zeroing one
  * off-diagonal entry. Every arithmetic step is a pure function of the
  * input matrix with a fixed iteration order and a fixed sweep count —
  * no pivot-by-magnitude, no convergence-dependent early exit — so two
  * builds of the same covariance produce bit-identical eigenpairs (the
  * determinism the oracle-export contract needs). Cyclic Jacobi
  * converges quadratically once sweeps pass ~log(n); SWEEPS = 24 on a
  * 64×64 leaves off-diagonal mass at numerical zero (spec-gated
  * ‖Av − λv‖ ≤ 1e-9·‖A‖).
  *
  * Output is canonicalized: eigenpairs sorted by descending eigenvalue
  * (ties by ascending original column index — deterministic), each
  * vector's SIGN fixed so its largest-|coordinate| entry (lowest index
  * on exact ties) is positive. Eigenvectors of a symmetric matrix are
  * only defined up to sign; the canonical form makes the exported
  * model reproducible.
  */
object Eigen {

  val Sweeps = 24

  /** @param a symmetric n×n (row-major, NOT mutated)
    * @return (eigenvalues desc, eigenvectors as rows aligned with the
    *         eigenvalues, canonical sign) */
  def jacobi(a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a.length
    require(n > 0 && a.forall(_.length == n), "square matrix required")
    val m = Array.tabulate(n, n)((i, j) => a(i)(j))
    // v starts as I; accumulates the product of rotations — COLUMNS of
    // v are the eigenvectors of the original matrix
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < Sweeps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = m(p)(q)
          if (apq != 0.0) {
            // Jacobi rotation angle: the numerically stable t = s/c
            // formulation (Golub & Van Loan alg. 8.4.1). For extreme
            // theta (denormal apq vs a large diagonal gap) theta² would
            // overflow to Inf and yield t = 0 — a no-op rotation that
            // never zeroes the entry; the standard large-theta limit
            // t = 1/(2θ) covers that branch, computed as apq/(dq−dp)
            // WITHOUT the theta intermediate (round-14 advice: when
            // theta itself overflows to ±Inf — huge diagonal gap over a
            // denormal apq — 1/(2θ) is again exactly 0, reproducing the
            // no-op; the re-associated quotient stays finite there).
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t =
              if (math.abs(theta) > 1.0e153) apq / (m(q)(q) - m(p)(p))
              else if (theta >= 0) 1.0 / (theta + math.sqrt(1.0 + theta * theta))
              else 1.0 / (theta - math.sqrt(1.0 + theta * theta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var k = 0
            while (k < n) {
              val mkp = m(k)(p)
              val mkq = m(k)(q)
              m(k)(p) = c * mkp - s * mkq
              m(k)(q) = s * mkp + c * mkq
              k += 1
            }
            k = 0
            while (k < n) {
              val mpk = m(p)(k)
              val mqk = m(q)(k)
              m(p)(k) = c * mpk - s * mqk
              m(q)(k) = s * mpk + c * mqk
              val vkp = v(k)(p)
              val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // canonical order: eigenvalue desc, tie by original column index
    val order = (0 until n).sortBy(j => (-m(j)(j), j))
    val values = order.map(j => m(j)(j)).toArray
    val vectors = order.map { j =>
      val col = Array.tabulate(n)(i => v(i)(j))
      // canonical sign: largest-|coordinate| entry positive (lowest
      // index wins exact-|.| ties)
      var best = 0
      var i = 1
      while (i < n) {
        if (math.abs(col(i)) > math.abs(col(best))) best = i
        i += 1
      }
      if (col(best) < 0) col.map(x => -x) else col
    }.toArray
    (values, vectors)
  }
}
