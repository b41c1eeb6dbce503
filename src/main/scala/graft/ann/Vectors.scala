package graft.ann

import graft.text.TextStats.mix64

/**
 * Vector primitives for similarity search over an embedding column
 * (`Array[Float]`): cosine, and deterministic random-hyperplane LSH bucket
 * keys for the scale path (bucketed candidate generation instead of a full
 * cross join).
 */
object Vectors {

  def dot(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Seq[Float]): Double = math.sqrt(dot(a, a))

  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val na = norm(a); val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim). */
  private def plane(seed: Long, p: Int, d: Int): Double = {
    val h = mix64(seed ^ (p.toLong << 32) ^ d.toLong)
    // map to (-1, 1)
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** Sign-bit LSH key over `nPlanes` hyperplanes (one int bucket). */
  def lshKey(v: Seq[Float], nPlanes: Int, seed: Long): Int = {
    var key = 0
    var p = 0
    while (p < nPlanes) {
      var s = 0.0; var d = 0
      while (d < v.length) { s += v(d) * plane(seed, p, d); d += 1 }
      if (s >= 0) key |= (1 << p)
      p += 1
    }
    key
  }

  /** Multi-probe neighbor buckets: the key plus all 1-bit flips (recall boost). */
  def lshProbes(key: Int, nPlanes: Int): Array[Int] =
    Array(key) ++ Array.tabulate(nPlanes)(b => key ^ (1 << b))

  private def cellScore(v: Seq[Float], c: Int, seed: Long): Double = {
    var s = 0.0; var d = 0
    while (d < v.length) { s += v(d) * plane(seed, c, d); d += 1 }
    s
  }

  /** IVF-style coarse quantizer: the cell is the argmax over `nCells`
    * seeded directions (a deterministic stand-in for k-means centroids —
    * same dataflow shape: assign once, search only probed cells). Ties
    * break to the lowest cell index. */
  def ivfCell(v: Seq[Float], nCells: Int, seed: Long): Int = {
    var best = 0; var bestS = Double.NegativeInfinity
    var c = 0
    while (c < nCells) {
      val s = cellScore(v, c, seed)
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }

  /** Query-side probe list: the `probes` best cells by the same score,
    * descending (IVF nprobe). */
  def ivfProbes(v: Seq[Float], nCells: Int, probes: Int, seed: Long): Array[Int] = {
    val scored = Array.tabulate(nCells)(c => (cellScore(v, c, seed), c))
    scored.sortBy { case (s, c) => (-s, c) }.take(math.min(probes, nCells)).map(_._2)
  }
}
