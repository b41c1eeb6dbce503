package graft.text

/**
 * Text-analysis primitives for large-scale corpus curation over the crawled
 * pages / `documents` table: language id, quality scoring, token counting,
 * document fingerprinting. All pure, deterministic, codegen-friendly via
 * simple UDF registration (no external models — n-gram/stopword heuristics).
 */
object TextStats {

  // Small stopword inventories for the synthetic corpus languages.
  private val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as", "are", "this"),
    "de" -> Set("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von", "mit", "nicht", "auf", "für", "im"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "de", "des", "du", "que", "pour", "dans", "sur", "pas"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "un", "una", "de", "del", "que", "para", "en", "por", "no"),
  )
  private val langOrder = Seq("en", "de", "fr", "es")

  def tokenize(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Whitespace token count. */
  def tokenCountWs(text: String): Int = tokenize(text).length

  // BPE-ish pre-tokenizer (GPT-2 style pattern, simplified): contractions,
  // letter runs, digit runs, punctuation runs, whitespace runs.
  private val bpeRe =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+".r

  /** BPE-style pre-token count (proxy for LLM token budget accounting). */
  def tokenCountBpe(text: String): Int =
    if (text == null) 0 else bpeRe.findAllIn(text).length

  /** CJK codepoint fraction. */
  def cjkRatio(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    var cjk = 0; var total = 0
    text.codePoints().forEach { cp =>
      if (!Character.isWhitespace(cp)) {
        total += 1
        val b = Character.UnicodeScript.of(cp)
        if (b == Character.UnicodeScript.HAN || b == Character.UnicodeScript.HIRAGANA ||
          b == Character.UnicodeScript.KATAKANA || b == Character.UnicodeScript.HANGUL) cjk += 1
      }
    }
    if (total == 0) 0.0 else cjk.toDouble / total
  }

  /** n-gram/stopword language id over {en,de,fr,es,zh}; "und" if no signal. */
  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    if (cjkRatio(text) > 0.2) return "zh"
    val toks = tokenize(text)
    if (toks.isEmpty) return "und"
    var best = "und"; var bestHits = 0
    langOrder.foreach { lang =>
      val sw = stopwords(lang)
      var hits = 0
      toks.foreach(t => if (sw.contains(t)) hits += 1)
      if (hits > bestHits) { best = lang; bestHits = hits }
    }
    best
  }

  /** Heuristic quality score in [0,1]: length band, punctuation ratio,
    * stopword ratio, mean word length band. Deterministic arithmetic only. */
  def qualityScore(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    val n = text.length
    val toks = tokenize(text)
    if (toks.isEmpty) return 0.0
    val lenScore = math.min(1.0, n / 500.0) * (if (n > 100000) 0.5 else 1.0)
    var punct = 0
    text.foreach(c => if (!c.isLetterOrDigit && !c.isWhitespace) punct += 1)
    val punctRatio = punct.toDouble / n
    val punctScore = if (punctRatio > 0.3) 0.0 else 1.0 - punctRatio / 0.3
    val allSw: Set[String] = stopwords.values.reduce(_ ++ _)
    val swRatio = toks.count(allSw.contains).toDouble / toks.length
    val swScore = math.min(1.0, swRatio / 0.2)
    val meanWord = toks.map(_.length).sum.toDouble / toks.length
    val wordScore = if (meanWord >= 2.5 && meanWord <= 10.0) 1.0 else 0.3
    val s = 0.3 * lenScore + 0.25 * punctScore + 0.2 * swScore + 0.25 * wordScore
    math.rint(s * 1e6) / 1e6
  }

  /** 64-bit rolling polynomial fingerprint of the whitespace-normalized text. */
  def fingerprint64(text: String): Long = {
    if (text == null) return 0L
    val norm = HtmlScanner.collapseWs(text).toLowerCase
    var h = 1125899906842597L // prime seed
    var i = 0
    while (i < norm.length) { h = 31L * h + norm.charAt(i); i += 1 }
    h
  }

  /** splitmix64 — the mixer used across hashing here and in dedup. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
