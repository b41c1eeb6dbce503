package graft.dedup

import graft.text.TextStats.mix64

/**
 * Near-duplicate detection primitives for corpus curation at 100 TB scale:
 * word-shingling, MinHash signatures, LSH banding, SimHash, and n-gram
 * Jaccard. All deterministic (seeded 2-universal hash family via splitmix64)
 * so results are reproducible across cluster sizes.
 *
 * The scale path is MinHash+LSH: shingle -> signature (one pass) -> explode
 * to (band_id, band_hash) -> shuffle once on the band key -> candidate pairs
 * within buckets only (never the O(n²) cross join).
 */
object MinHash {

  /** k-word shingles, lowercased, whitespace-tokenized. */
  def shingles(text: String, k: Int): Array[String] = {
    val toks = graft.text.TextStats.tokenize(text)
    if (toks.length < k) { if (toks.isEmpty) Array.empty else Array(toks.mkString(" ")) }
    else Array.tabulate(toks.length - k + 1)(i => toks.slice(i, i + k).mkString(" "))
  }

  private def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L // FNV offset basis
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 0x100000001b3L; i += 1 }
    h
  }

  /** MinHash signature of `numPerm` permutations over k-shingles. */
  def signature(text: String, k: Int, numPerm: Int): Array[Long] = {
    val sh = shingles(text, k)
    val sig = Array.fill(numPerm)(Long.MaxValue)
    sh.foreach { s =>
      val base = hashString(s)
      var i = 0
      while (i < numPerm) {
        val h = mix64(base + i * 0x9e3779b97f4a7c15L)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** LSH band keys: `bands` hashes, each over `rows = numPerm/bands` sig slots.
    * Two docs share a band key iff their signature agrees on that whole band. */
  def bandKeys(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    Array.tabulate(bands) { b =>
      var h = b.toLong * 0x9e3779b97f4a7c15L
      var r = 0
      while (r < rows) { h = mix64(h ^ sig(b * rows + r)); r += 1 }
      // carry the band id in the low bits so keys from different bands never collide
      (h & ~0xffL) | (b.toLong & 0xffL)
    }
  }

  /** Estimated Jaccard from two signatures. */
  def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** Exact Jaccard over k-shingle sets. */
  def ngramJaccard(t1: String, t2: String, k: Int): Double = {
    val s1 = shingles(t1, k).toSet
    val s2 = shingles(t2, k).toSet
    if (s1.isEmpty && s2.isEmpty) return 1.0
    val inter = s1.intersect(s2).size
    val union = s1.size + s2.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** 64-bit SimHash over word tokens (sign aggregation of token hashes). */
  def simhash64(text: String): Long = {
    val toks = graft.text.TextStats.tokenize(text)
    if (toks.isEmpty) return 0L
    val acc = new Array[Int](64)
    toks.foreach { t =>
      val h = mix64(hashString(t))
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (acc(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
