package graft.kernels

/** Top-k motif and discord extraction over a matrix profile
  * (ref: /root/reference/matrixprofile/algorithms/top_k_motifs.py,
  * top_k_discords.py). Iterative exclusion-zone suppression is inherently
  * sequential per series; distribution happens across series.
  */
object TopK {

  final case class Motif(motifs: (Long, Long), neighbors: Array[Long])

  /** Top-k discords: descending traversal of a stable argsort with
    * exclusion-zone suppression (ref top_k_discords.py:94-155).
    */
  def mpTopKDiscords(mpIn: Array[Double], ez: Int, k: Int = 3): Array[Long] = {
    val tmp = mpIn.clone()
    val n = tmp.length
    val order = Core.argsort(tmp).reverse
    val found = scala.collection.mutable.ArrayBuffer.empty[Long]
    var oi = 0
    while (oi < order.length && found.length < k) {
      val idx = order(oi)
      if (!tmp(idx).isInfinite) {
        found += idx.toLong
        if (ez > 0) {
          val start = math.max(0, idx - ez)
          val end = math.min(n, idx + ez)
          var j = start
          while (j < end) { tmp(j) = Double.PositiveInfinity; j += 1 }
        }
      }
      oi += 1
    }
    found.toArray
  }

  /** Top-k motifs with MASS neighbor re-query
    * (ref top_k_motifs.py:174-314). Mutates copies only.
    */
  def mpTopKMotifs(ts: Array[Double], mpIn: Array[Double], mpiIn: Array[Long],
      w: Int, ez: Int, k: Int = 3, maxNeighbors: Int = 10,
      radius: Double = 3.0): Seq[Motif] = {
    val dataLen = ts.length
    val mp = mpIn.clone()
    val motifs = scala.collection.mutable.ArrayBuffer.empty[Motif]
    var ki = 0
    var done = false
    while (ki < k && !done) {
      val minIdx = Core.argmin(mp)
      val minDist = mp(minIdx)
      // mpi = -1 means the profile row never matched (e.g. NaN-poisoned
      // series); the reference would negative-index into ts here — treat as
      // "nothing left to find" instead
      if (Core.isNanInf(minDist) || mpiIn(minIdx) < 0) done = true
      else {
        val firstIdx = math.min(minIdx.toLong, mpiIn(minIdx))
        val secondIdx = math.max(minIdx.toLong, mpiIn(minIdx))
        val query = java.util.Arrays.copyOfRange(ts, firstIdx.toInt, firstIdx.toInt + w)
        val dp = Mass2.mass2(ts, query)
        // exclude already-suppressed regions (top_k_motifs.py:252-254)
        var j = 0
        while (j < dp.length) {
          if (Core.isNanInf(mp(j))) dp(j) = Double.PositiveInfinity
          j += 1
        }
        for (idx <- Seq(firstIdx, secondIdx)) {
          Core.applyExclusionZone(ez, isJoin = false, w, dataLen, idx.toInt, dp)
          Core.applyExclusionZone(ez, isJoin = false, w, dataLen, idx.toInt, mp)
        }
        val neighbors = scala.collection.mutable.ArrayBuffer.empty[Long]
        var ni = 0
        var nDone = false
        while (ni < maxNeighbors && !nDone) {
          val nIdx = Core.argmin(dp)
          val nDist = dp(nIdx)
          if (Core.isNanInf(nDist) || !(radius * minDist >= nDist)) nDone = true
          else {
            neighbors += nIdx.toLong
            Core.applyExclusionZone(ez, isJoin = false, w, dataLen, nIdx, dp)
            Core.applyExclusionZone(ez, isJoin = false, w, dataLen, nIdx, mp)
          }
          ni += 1
        }
        motifs += Motif((firstIdx, secondIdx), neighbors.toArray)
      }
      ki += 1
    }
    motifs.toSeq
  }

  final case class PmpMotif(motifs: ((Int, Long), (Int, Long)),
      neighbors: Array[(Int, Long)])

  /** PMP top-k motifs: global argmin over (window-row, col), neighbors by
    * MASS re-query on the winning row's window (ref top_k_motifs.py:16-171).
    * `pmp` rows must be Euclidean, padded to series length with ∞.
    */
  def pmpTopKMotifs(ts: Array[Double], pmp: Array[Array[Double]],
      pmpi: Array[Array[Long]], windows: Array[Int],
      exclusionZone: Option[Int] = None, k: Int = 3, maxNeighbors: Int = 10,
      radius: Double = 3.0): Seq[PmpMotif] = {
    val dataLen = ts.length
    val tmp = pmp.map(row => row.map(v => if (Core.isNanInf(v)) Double.PositiveInfinity else v))
    val profileLen = if (tmp.nonEmpty) tmp(0).length else 0
    val motifs = scala.collection.mutable.ArrayBuffer.empty[PmpMotif]
    var ki = 0
    var done = false
    while (ki < k && !done) {
      var bestR = 0; var bestC = 0; var best = Double.PositiveInfinity
      for (r <- tmp.indices; c <- tmp(r).indices)
        if (tmp(r)(c) < best) { best = tmp(r)(c); bestR = r; bestC = c }
      if (best.isInfinite || best.isNaN) done = true
      else {
        val w = windows(bestR)
        val ez = exclusionZone.getOrElse(math.floor(w / 2.0).toInt)
        val firstIdx = math.min(bestC.toLong, pmpi(bestR)(bestC))
        val secondIdx = math.max(bestC.toLong, pmpi(bestR)(bestC))
        val query = java.util.Arrays.copyOfRange(ts, firstIdx.toInt, firstIdx.toInt + w)
        val dpShort = Mass2.mass2(ts, query)
        val dp = Array.fill(profileLen)(Double.PositiveInfinity)
        System.arraycopy(dpShort, 0, dp, 0, math.min(dpShort.length, profileLen))
        var j = 0
        while (j < profileLen) {
          if (Core.isNanInf(pmp(bestR)(j))) dp(j) = Double.PositiveInfinity
          j += 1
        }
        for (idx <- Seq(firstIdx, secondIdx)) {
          Core.applyExclusionZone(ez, isJoin = false, w, dataLen, idx.toInt, dp)
          Core.applyExclusionZone(ez, isJoin = false, w, dataLen, idx.toInt, tmp(bestR))
        }
        val neighbors = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
        var ni = 0
        var nDone = false
        while (ni < maxNeighbors && !nDone) {
          val nIdx = Core.argmin(dp)
          val nDist = dp(nIdx)
          if (Core.isNanInf(nDist) || !(radius * best >= nDist)) nDone = true
          else {
            neighbors += ((bestR, nIdx.toLong))
            Core.applyExclusionZone(ez, isJoin = false, w, dataLen, nIdx, dp)
            Core.applyExclusionZone(ez, isJoin = false, w, dataLen, nIdx, tmp(bestR))
          }
          ni += 1
        }
        motifs += PmpMotif(((bestR, firstIdx), (bestR, secondIdx)), neighbors.toArray)
      }
      ki += 1
    }
    motifs.toSeq
  }

  /** PMP top-k discords: global argmax over (window-row, col) with row-wise
    * exclusion (ref top_k_discords.py:16-91). `pmp` rows are Euclidean.
    */
  def pmpTopKDiscords(pmp: Array[Array[Double]], windows: Array[Int],
      exclusionZone: Option[Int] = None, k: Int = 3): Array[(Int, Int)] = {
    val tmp = pmp.map(_.clone())
    for (row <- tmp; j <- row.indices)
      if (Core.isNanInf(row(j))) row(j) = Double.NegativeInfinity

    var ez = exclusionZone
    val found = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var ki = 0
    var done = false
    while (ki < k && !done) {
      var bestR = 0; var bestC = 0; var best = Double.NegativeInfinity
      for (r <- tmp.indices; c <- tmp(r).indices)
        if (tmp(r)(c) > best) { best = tmp(r)(c); bestR = r; bestC = c }
      if (best == Double.NegativeInfinity) done = true
      else {
        found += ((bestR, bestC))
        val window = windows(bestR)
        val zone = ez.getOrElse(math.floor(window / 2.0).toInt)
        if (ez.isEmpty) ez = Some(zone)
        val n = tmp(bestR).length
        var j = math.max(0, bestC - zone)
        val end = math.min(n, bestC + zone)
        while (j < end) { tmp(bestR)(j) = Double.NegativeInfinity; j += 1 }
      }
      ki += 1
    }
    found.toArray
  }
}
