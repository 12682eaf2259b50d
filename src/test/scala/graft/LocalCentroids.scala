package graft

/** Test-shared independent replica of the curation family's centroid
  * machinery (seeded stride init → Lloyd rounds → cosine argmax
  * assignment), written from collected rows — never by calling the
  * operator's own trainer. Dim-generic: the fuzz specs plant low-dim
  * corpora.
  */
object LocalCentroids {

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Seeded stride init + `iters` Lloyd rounds (raw-dot argmax,
    * strict-greater / ascending-id ties, per-dim double mean in
    * vec_id order, `.toFloat`), returning (id, vector, norm).
    */
  def lloyd(corpus: Seq[(Long, Array[Float])], iters: Int): Seq[(Int, Array[Float], Double)] = {
    val sorted = corpus.sortBy(_._1)
    val d = sorted.head._2.length
    val total = sorted.size.toLong
    val stride = math.max(graft.operators.Similarity.IvfCentroidMod.toLong,
      math.round(math.sqrt(total.toDouble)))
    var cents: Seq[(Int, Array[Float])] = sorted
      .filter(v => v._1 % stride == 3L % stride)
      .map(v => (v._1.toInt, v._2))
    for (_ <- 1 to iters) {
      val byId = cents.sortBy(_._1)
      val sums = Array.fill(byId.size)(new Array[Double](d))
      val cnts = new Array[Long](byId.size)
      for ((_, e) <- sorted) {
        var best = 0; var bestScore = Double.NegativeInfinity
        for (ci <- byId.indices) {
          val sc = dot(e, byId(ci)._2)
          if (sc > bestScore) { bestScore = sc; best = ci }
        }
        var j = 0
        while (j < d) { sums(best)(j) += e(j).toDouble; j += 1 }
        cnts(best) += 1
      }
      cents = byId.indices.filter(cnts(_) > 0).map { ci =>
        (byId(ci)._1, Array.tabulate(d)(j => (sums(ci)(j) / cnts(ci)).toFloat))
      }
    }
    cents.map { case (id, v) => (id, v, math.sqrt(dot(v, v))) }
  }

  /** Brute cosine argmax assignment (score desc, centroid id asc):
    * (vec_id, label, cell, unrounded score).
    */
  def assign(corpus: Seq[(Long, Array[Float], Int)],
             cents0: Seq[(Int, Array[Float], Double)]): Seq[(Long, Int, Int, Double)] = {
    val cents = cents0.sortBy(_._1)
    corpus.map { case (id, e, lab) =>
      val nrm = math.sqrt(dot(e, e))
      var bestId = cents.head._1
      var bestScore = Double.NegativeInfinity
      for ((cid, ce, cnrm) <- cents) {
        val sc = dot(e, ce) / (nrm * cnrm)
        if (sc > bestScore) { bestScore = sc; bestId = cid }
      }
      (id, lab, bestId, bestScore)
    }
  }
}
