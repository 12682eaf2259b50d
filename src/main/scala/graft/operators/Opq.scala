package graft.operators

/** Optimized Product Quantization (Ge et al., CVPR 2013 "Optimized
  * Product Quantization for Approximate Nearest Neighbor Search"): learn
  * an orthogonal rotation R so the PQ subspaces carry BALANCED variance
  * before quantization. Plain PQ cuts the vector into m fixed coordinate
  * blocks; on an anisotropic corpus (real text embeddings — decaying
  * eigen-spectrum) one block hoards the energy and its k centroids
  * saturate while the rest quantize noise. Rotating first spreads the
  * spectrum across blocks, multiplying the effective codebook size at
  * IDENTICAL code bytes.
  *
  * Everything here is DRIVER-LOCAL arithmetic on the bounded training
  * sample (≤ TrainSampleCap × Dim floats — the same `train()` economics
  * as [[Similarity.pqCodebook]]): at any corpus size the cluster's share
  * is the sample selection; the rotation itself is a Dim×Dim matrix the
  * encode expression ships as a codegen reference object.
  *
  * Two stages, both deterministic (no RNG):
  *  1. Parametric init (OPQ-P): eigendecompose the sample covariance
  *     (cyclic Jacobi — no external linalg dependency), then allocate
  *     eigen-directions to subspaces greedily balancing the per-subspace
  *     log-variance product — the allocation that minimizes the Gaussian
  *     distortion bound.
  *  2. Non-parametric refinement (OPQ-NP): alternate (a) PQ codebook
  *     training in the rotated space with (b) the orthogonal-Procrustes
  *     rotation update R ← polar(X̂ Xᵀ), the polar factor computed by
  *     the Newton iteration Q ← (Q + Q⁻ᵀ)/2 (quadratic convergence;
  *     64×64 inverse by Gauss-Jordan).
  *
  * On the shipped near-isotropic corpus the learned R is necessarily
  * ~rotation-invariant in effect (nothing to balance — recall unchanged,
  * spec-asserted); on an anisotropic corpus it is the recall lever
  * (RecallSweep `opq` mode; numbers in [[Similarity]] scaladoc).
  */
private[graft] object Opq {

  /** y = R·x for a flat row-major d×d rotation — double accumulation,
    * identical to the PqRotate expression's eval (training sees exactly
    * the floats the encoder will).
    */
  def rotate(r: Array[Double], v: Array[Float]): Array[Float] = {
    val d = v.length
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      val base = i * d
      while (j < d) { s += r(base + j) * v(j).toDouble; j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    out
  }

  /** Mean squared reconstruction error of an (already-rotated) sample
    * under a codebook — the quantity OPQ minimizes; orthogonality makes
    * it equal to the error measured in the original space.
    */
  def mse(sample: Array[Array[Float]], cb: Array[Float],
          m: Int, k: Int, dsub: Int): Double = {
    var tot = 0.0
    for (v <- sample) {
      val rec = reconstruct(v, cb, m, k, dsub)
      var i = 0
      while (i < v.length) {
        val diff = v(i).toDouble - rec(i)
        tot += diff * diff
        i += 1
      }
    }
    tot / sample.length
  }

  /** Train rotation + codebook. `pqTrain` is the caller's Lloyd routine
    * ([[Similarity.trainPqLocal]]) so assignment arithmetic stays the
    * single source of truth shared with the PqEncode expression.
    */
  def train(sample: Array[Array[Float]], m: Int, k: Int, dsub: Int,
            pqTrain: Array[Array[Float]] => Array[Float],
            npIters: Int): (Array[Double], Array[Float]) = {
    val d = m * dsub
    var r = parametricInit(sample, m, dsub)
    var it = 0
    while (it < npIters) {
      val rotated = sample.map(rotate(r, _))
      val cb = pqTrain(rotated)
      // M = Σ x̂ xᵀ over the sample (x̂ = reconstruction in rotated
      // space); the Procrustes optimum for min‖Rx − x̂‖ is polar(M)
      val mMat = Array.ofDim[Double](d, d)
      var si = 0
      while (si < sample.length) {
        val x = sample(si)
        val rec = reconstruct(rotated(si), cb, m, k, dsub)
        var i = 0
        while (i < d) {
          val ri = mMat(i)
          val recI = rec(i)
          var j = 0
          while (j < d) { ri(j) += recI * x(j).toDouble; j += 1 }
          i += 1
        }
        si += 1
      }
      polar(mMat).foreach { p => r = flatten(p) }
      it += 1
    }
    (r, pqTrain(sample.map(rotate(r, _))))
  }

  /** Eigenvalue-allocation init: rows of R are covariance eigenvectors,
    * grouped so each subspace's log-variance sum is balanced (greedy:
    * next-largest eigenvalue goes to the non-full subspace with the
    * smallest running sum — the multiway number-partitioning heuristic).
    */
  private def parametricInit(sample: Array[Array[Float]], m: Int, dsub: Int): Array[Double] = {
    val d = m * dsub
    val n = sample.length
    val mean = new Array[Double](d)
    for (v <- sample; i <- 0 until d) mean(i) += v(i).toDouble / n
    val cov = Array.ofDim[Double](d, d)
    for (v <- sample) {
      var i = 0
      while (i < d) {
        val di = v(i).toDouble - mean(i)
        var j = i
        while (j < d) { cov(i)(j) += di * (v(j).toDouble - mean(j)) / n; j += 1 }
        i += 1
      }
    }
    for (i <- 0 until d; j <- 0 until i) cov(i)(j) = cov(j)(i)
    val (eig, vecs) = jacobiEigen(cov)
    val order = (0 until d).sortBy(i => -eig(i))
    // Balance per-subspace log-variance SUMS by LPT greedy. The raw
    // logs are negative whenever λ < 1 (always, on normalized data),
    // and greedy-min-sum on negative items degenerates: the bucket
    // holding the largest λ has the most-negative sum, so it swallows
    // every following direction → contiguous PCA blocks ≈ plain PQ
    // (measured: 1.5% MSE gain instead of ~2×). Shifting every log to
    // be ≥ 0 fixes the trajectory without changing the objective —
    // buckets end with equal counts, so a constant shift moves all
    // final sums identically.
    val logs = order.map(i => math.log(math.max(eig(i), 1e-12)))
    val shift = -logs.min
    val logSum = new Array[Double](m)
    val fill = new Array[Int](m)
    val alloc = Array.fill(m)(new Array[Int](dsub))
    for ((idx, oi) <- order.zipWithIndex) {
      var best = -1
      for (mi <- 0 until m if fill(mi) < dsub)
        if (best < 0 || logSum(mi) < logSum(best)) best = mi
      alloc(best)(fill(best)) = idx
      fill(best) += 1
      logSum(best) += logs(oi) + shift
    }
    val r = new Array[Double](d * d)
    for (mi <- 0 until m; s <- 0 until dsub) {
      val row = mi * dsub + s
      val col = alloc(mi)(s)
      // row of R = eigenvector `col` (columns of `vecs`), so y = R x
      // projects x onto the allocated principal directions
      for (j <- 0 until d) r(row * d + j) = vecs(j)(col)
    }
    r
  }

  /** Per-subspace argmin-L2 decode — the same double-diff arithmetic as
    * PqEncode.nullSafeEval, composed with centroid lookup.
    */
  private def reconstruct(v: Array[Float], cb: Array[Float],
                          m: Int, k: Int, dsub: Int): Array[Double] = {
    val out = new Array[Double](m * dsub)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val base = ((mi * k) + ki) * dsub
        var d2 = 0.0
        var di = 0
        while (di < dsub) {
          val diff = v(mi * dsub + di).toDouble - cb(base + di)
          d2 += diff * diff
          di += 1
        }
        if (d2 < bestD) { bestD = d2; best = ki }
        ki += 1
      }
      val b = ((mi * k) + best) * dsub
      var di = 0
      while (di < dsub) { out(mi * dsub + di) = cb(b + di).toDouble; di += 1 }
      mi += 1
    }
    out
  }

  // ---- dense d×d linear algebra (driver-local, deterministic) ---------

  private def flatten(a: Array[Array[Double]]): Array[Double] = {
    val d = a.length
    val out = new Array[Double](d * d)
    for (i <- 0 until d; j <- 0 until d) out(i * d + j) = a(i)(j)
    out
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix V with eigenvectors as COLUMNS,
    * A = V Λ Vᵀ). Destroys `a`.
    */
  private[operators] def jacobiEigen(a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-14 && sweep < 64) {
      for (p <- 0 until d; q <- p + 1 until d if math.abs(a(p)(q)) > 1e-18) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) match {
          case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (j <- 0 until d) {
          val apj = a(p)(j); val aqj = a(q)(j)
          a(p)(j) = c * apj - s * aqj
          a(q)(j) = s * apj + c * aqj
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** Polar factor of M by the Newton iteration Q ← (Q + Q⁻ᵀ)/2 —
    * converges quadratically to the nearest orthogonal matrix for
    * invertible M. None when M is (numerically) singular, in which case
    * the caller keeps its previous rotation.
    */
  private[operators] def polar(mIn: Array[Array[Double]]): Option[Array[Array[Double]]] = {
    val d = mIn.length
    // scale toward unit spectral radius for fast convergence
    var norm = 0.0
    for (i <- 0 until d; j <- 0 until d) norm = math.max(norm, math.abs(mIn(i)(j)))
    if (norm == 0.0) return None
    var q = Array.tabulate(d, d)((i, j) => mIn(i)(j) / (norm * d))
    var it = 0
    while (it < 60) {
      val inv = invert(q).getOrElse(return None)
      val next = Array.tabulate(d, d)((i, j) => 0.5 * (q(i)(j) + inv(j)(i)))
      var delta = 0.0
      for (i <- 0 until d; j <- 0 until d) delta = math.max(delta, math.abs(next(i)(j) - q(i)(j)))
      q = next
      if (delta < 1e-13) return Some(q)
      it += 1
    }
    Some(q)
  }

  /** Gauss-Jordan inverse with partial pivoting; None on a ~0 pivot. */
  private def invert(mIn: Array[Array[Double]]): Option[Array[Array[Double]]] = {
    val d = mIn.length
    val a = Array.tabulate(d, 2 * d)((i, j) =>
      if (j < d) mIn(i)(j) else if (j - d == i) 1.0 else 0.0)
    for (col <- 0 until d) {
      var piv = col
      for (i <- col + 1 until d) if (math.abs(a(i)(col)) > math.abs(a(piv)(col))) piv = i
      if (math.abs(a(piv)(col)) < 1e-12) return None
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val pv = a(col)(col)
      for (j <- 0 until 2 * d) a(col)(j) /= pv
      for (i <- 0 until d if i != col) {
        val f = a(i)(col)
        if (f != 0.0) for (j <- 0 until 2 * d) a(i)(j) -= f * a(col)(j)
      }
    }
    Some(Array.tabulate(d, d)((i, j) => a(i)(j + d)))
  }
}
