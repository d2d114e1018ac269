package graft.analysis

import graft.functions.VectorOps

/**
 * Tokenizer + feature-hashed sparse vectorizer.
 *
 * Re-implements (fresh, Spark-first) the text-analysis semantics of
 * kreeben/resin `StringAnalyzer.cs`:
 *  - splitWords          ≙ StringAnalyzer.SplitWords (252-309): Unicode
 *    data-category segmentation, math symbols emitted as standalone tokens.
 *  - tokenizeIntoVectors ≙ StringAnalyzer.TokenizeIntoVectors (614-701):
 *    512-dim sparse feature-hash vector per token, L2-normalized.
 *  - isNumberToken       ≙ StringAnalyzer.IsNumberToken (414-429)
 *  - isLongitudeLatitudeToken ≙ StringAnalyzer.IsLongitudeLatitudeToken (436-591)
 *  - compare / compareToUnitVector ≙ StringAnalyzer.Compare (745-757)
 *
 * Everything here is a pure function of its arguments — trivially parallel
 * inside `Dataset.flatMap`, no shared state, no driver round-trips.
 *
 * Note on Unicode categories: the reference uses .NET's `UnicodeCategory`
 * ordinal values when hashing per-char category features. Java's
 * `Character.getType` uses a different numbering, so we map explicitly to
 * keep the same feature identity for the same input text.
 */
object TextAnalyzer {

  val DefaultDims = 512
  val DefaultIdentityAngle = 0.9

  /** One token: label + sparse vector (sorted indices, parallel values). */
  final case class TokenVec(label: String, indices: Array[Int], values: Array[Double])

  // Java Character.getType constant -> .NET UnicodeCategory ordinal.
  private val JavaToNetCategory: Array[Int] = {
    val m = new Array[Int](31)
    m(Character.UNASSIGNED) = 29          // OtherNotAssigned
    m(Character.UPPERCASE_LETTER) = 0
    m(Character.LOWERCASE_LETTER) = 1
    m(Character.TITLECASE_LETTER) = 2
    m(Character.MODIFIER_LETTER) = 3
    m(Character.OTHER_LETTER) = 4
    m(Character.NON_SPACING_MARK) = 5
    m(Character.COMBINING_SPACING_MARK) = 6
    m(Character.ENCLOSING_MARK) = 7
    m(Character.DECIMAL_DIGIT_NUMBER) = 8
    m(Character.LETTER_NUMBER) = 9
    m(Character.OTHER_NUMBER) = 10
    m(Character.SPACE_SEPARATOR) = 11
    m(Character.LINE_SEPARATOR) = 12
    m(Character.PARAGRAPH_SEPARATOR) = 13
    m(Character.CONTROL) = 14
    m(Character.FORMAT) = 15
    m(Character.SURROGATE) = 16
    m(Character.PRIVATE_USE) = 17
    m(Character.CONNECTOR_PUNCTUATION) = 18
    m(Character.DASH_PUNCTUATION) = 19
    m(Character.START_PUNCTUATION) = 20
    m(Character.END_PUNCTUATION) = 21
    m(Character.INITIAL_QUOTE_PUNCTUATION) = 22
    m(Character.FINAL_QUOTE_PUNCTUATION) = 23
    m(Character.OTHER_PUNCTUATION) = 24
    m(Character.MATH_SYMBOL) = 25
    m(Character.CURRENCY_SYMBOL) = 26
    m(Character.MODIFIER_SYMBOL) = 27
    m(Character.OTHER_SYMBOL) = 28
    m
  }

  private def netCategory(c: Char): Int = JavaToNetCategory(Character.getType(c))

  /** "Data" chars form words: letters, digits, numbers, symbols (not punctuation/space). */
  def isData(c: Char): Boolean = Character.getType(c) match {
    case Character.UPPERCASE_LETTER | Character.LOWERCASE_LETTER |
         Character.LETTER_NUMBER | Character.MODIFIER_LETTER |
         Character.TITLECASE_LETTER | Character.OTHER_LETTER |
         Character.CURRENCY_SYMBOL | Character.DECIMAL_DIGIT_NUMBER |
         Character.MATH_SYMBOL | Character.MODIFIER_SYMBOL |
         Character.OTHER_NUMBER | Character.OTHER_SYMBOL => true
    case _ => false
  }

  def isMath(c: Char): Boolean = Character.getType(c) == Character.MATH_SYMBOL

  /**
   * Split into words: data chars accumulate, math symbols flush + emit as
   * standalone single-char tokens, everything else is a separator.
   */
  def splitWords(source: String): List[String] = {
    if (source == null || source.isEmpty) return Nil
    val words = List.newBuilder[String]
    val buf = new java.lang.StringBuilder(64)
    var i = 0
    while (i < source.length) {
      val c = source.charAt(i)
      if (isData(c)) {
        if (isMath(c)) {
          if (buf.length > 0) { words += buf.toString; buf.setLength(0) }
          words += String.valueOf(c)
        } else buf.append(c)
      } else if (buf.length > 0) { words += buf.toString; buf.setLength(0) }
      i += 1
    }
    if (buf.length > 0) words += buf.toString
    words.result()
  }

  // ----------------------------------------------------------------- hashing

  private final val FnvOffset = -3750763034362895579L // 14695981039346656037 unsigned
  private final val FnvPrime = 1099511628211L
  private final val KnuthSeed = -6148914691236517115L // 12297829382473034501 unsigned

  /** FNV-1a over UTF-16 code units, reduced to a dimension by unsigned modulo. */
  private def fnv(cs: Array[Char], from: Int, len: Int): Long = {
    var h = FnvOffset
    var i = from
    val end = from + len
    while (i < end) { h ^= cs(i).toLong; h *= FnvPrime; i += 1 }
    h
  }

  def hashToIndex(s: String, dims: Int): Int = {
    var h = FnvOffset
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= FnvPrime; i += 1 }
    java.lang.Long.remainderUnsigned(h, dims.toLong).toInt
  }

  private def idx(cs: Array[Char], from: Int, len: Int, dims: Int): Int =
    java.lang.Long.remainderUnsigned(fnv(cs, from, len), dims.toLong).toInt

  /** Knuth multiplicative rolling hash, used to stabilize tiny tokens. */
  private def rollingHash64(cs: Array[Char], len: Int): Long = {
    var h = 0L
    var i = 0
    while (i < len) { h = (h ^ cs(i).toLong) * KnuthSeed; i += 1 }
    h
  }

  /** Per-dims precomputed feature-group base offsets (hash of group prefixes). */
  private final case class Offsets(dims: Int) {
    val bg: Int = hashToIndex("bg:", dims)
    val sg1: Int = hashToIndex("sg1:", dims)
    val triStart: Int = hashToIndex("tri:start:", dims)
    val triEnd: Int = hashToIndex("tri:end:", dims)
    val vc: Int = hashToIndex("vc:", dims)
    val uc: Int = hashToIndex("uc:", dims)
    val first: Int = hashToIndex("first:", dims)
    val last: Int = hashToIndex("last:", dims)
    val featNumber: Int = hashToIndex("feat:number:", dims)
    val featGeo: Int = hashToIndex("feat:geo:", dims)
    val caseLower: Int = hashToIndex("case:lower", dims)
    val caseMixed: Int = hashToIndex("case:mixed", dims)
    val caseUpper: Int = hashToIndex("case:upper", dims)
    val caseTitle: Int = hashToIndex("case:title", dims)
    val isTok: Int = hashToIndex("is", dims)
    val notTok: Int = hashToIndex("not", dims)
    val lenBuckets: Array[Int] = Array("len:0", "len:1", "len:2", "len:3",
      "len:4", "len:5-8", "len:9-16", "len:17+").map(hashToIndex(_, dims))
  }

  private val offsetsCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Offsets]()

  private def offsets(dims: Int): Offsets =
    offsetsCache.computeIfAbsent(dims, d => Offsets(d))

  private def lenBucket(len: Int): Int =
    if (len <= 4) len
    else if (len <= 8) 5
    else if (len <= 16) 6
    else 7

  // ------------------------------------------------------------ vectorization

  /**
   * Vectorize one word into a 512-dim (default) L2-normalized sparse vector.
   * Feature families and weights mirror StringAnalyzer.cs:614-701:
   * char-ordinal base (assignment), char 3-5-grams +1.0, positional bigrams
   * +0.75, skip-1-grams +0.5, boundary trigrams +0.65, first/last char +0.75,
   * length bucket +0.5, vowel/consonant pattern +0.5, rolling hash (len<=3)
   * +0.8, case +0.5 / per-char category +0.25, numeric/geo flags +0.6.
   */
  def vectorizeToken(label: String, dims: Int = DefaultDims): TokenVec = {
    val off = offsets(dims)
    val cs = label.toCharArray
    val len = cs.length
    val buf = new Array[Double](dims)

    // Base character ordinals at positional indices (assignment, not add).
    var i = 0
    while (i < len && i < dims) { buf(i) = cs(i).toDouble; i += 1 }

    // Char n-grams, n = 3..5.
    var n = 3
    while (n <= 5) {
      i = 0
      while (i + n <= len) { buf(idx(cs, i, n, dims)) += 1.0; i += 1 }
      n += 1
    }

    // Position-aware bigrams and skip-1-grams (position packed as two chars).
    val span4 = new Array[Char](4)
    i = 0
    while (i + 1 < len) {
      span4(0) = cs(i); span4(1) = cs(i + 1)
      span4(2) = (i & 0xFF).toChar; span4(3) = ((i >> 8) & 0xFF).toChar
      buf((off.bg + idx(span4, 0, 4, dims)) % dims) += 0.75
      i += 1
    }
    i = 0
    while (i + 2 < len) {
      span4(0) = cs(i); span4(1) = cs(i + 2)
      span4(2) = (i & 0xFF).toChar; span4(3) = ((i >> 8) & 0xFF).toChar
      buf((off.sg1 + idx(span4, 0, 4, dims)) % dims) += 0.5
      i += 1
    }

    // Boundary trigrams ('_'-padded below length 3).
    val span3 = new Array[Char](3)
    if (len >= 3) {
      span3(0) = cs(0); span3(1) = cs(1); span3(2) = cs(2)
      buf((off.triStart + idx(span3, 0, 3, dims)) % dims) += 0.65
      span3(0) = cs(len - 3); span3(1) = cs(len - 2); span3(2) = cs(len - 1)
      buf((off.triEnd + idx(span3, 0, 3, dims)) % dims) += 0.65
    } else if (len == 2) {
      span3(0) = cs(0); span3(1) = cs(1); span3(2) = '_'
      buf((off.triStart + idx(span3, 0, 3, dims)) % dims) += 0.65
      span3(0) = '_'; span3(1) = cs(0); span3(2) = cs(1)
      buf((off.triEnd + idx(span3, 0, 3, dims)) % dims) += 0.65
    } else if (len == 1) {
      span3(0) = cs(0); span3(1) = '_'; span3(2) = '_'
      buf((off.triStart + idx(span3, 0, 3, dims)) % dims) += 0.65
      span3(0) = '_'; span3(1) = '_'; span3(2) = cs(0)
      buf((off.triEnd + idx(span3, 0, 3, dims)) % dims) += 0.65
    }

    // First/last character emphasis.
    if (len > 0) {
      val c1 = new Array[Char](1)
      c1(0) = cs(0)
      buf((off.first + idx(c1, 0, 1, dims)) % dims) += 0.75
      c1(0) = cs(len - 1)
      buf((off.last + idx(c1, 0, 1, dims)) % dims) += 0.75
    }

    // Token length bucket.
    buf(off.lenBuckets(lenBucket(len))) += 0.5

    // Vowel/consonant pattern.
    if (len > 0) {
      val vcBuf = new Array[Char](len)
      i = 0
      while (i < len) {
        vcBuf(i) =
          if (Character.isLetter(cs(i))) { if (isVowel(cs(i))) 'V' else 'C' }
          else 'X'
        i += 1
      }
      buf((off.vc + idx(vcBuf, 0, len, dims)) % dims) += 0.5
    }

    // Rolling-hash anchor for tiny tokens.
    if (len <= 3) {
      val rh = rollingHash64(cs, len)
      buf(java.lang.Long.remainderUnsigned(rh, dims.toLong).toInt) += 0.8
    }

    // Case features.
    if (len > 0) {
      val lower = label.toLowerCase(java.util.Locale.ROOT)
      val upper = label.toUpperCase(java.util.Locale.ROOT)
      val isAllLower = lower == label
      val isAllUpper = upper == label
      val isTitle = Character.isLetter(cs(0)) && Character.isUpperCase(cs(0))
      buf(if (isAllLower) off.caseLower else off.caseMixed) += 0.5
      if (isAllUpper) buf(off.caseUpper) += 0.5
      if (isTitle) buf(off.caseTitle) += 0.5

      // Per-char Unicode-category distribution (two-digit .NET ordinal).
      val catSpan = new Array[Char](2)
      i = 0
      while (i < len) {
        val cat = netCategory(cs(i))
        catSpan(0) = ('0' + (cat % 10)).toChar
        catSpan(1) = ('0' + ((cat / 10) % 10)).toChar
        buf((idx(catSpan, 0, 2, dims) + off.uc) % dims) += 0.25
        i += 1
      }
    }

    // Numeric and geo hint features (always present: is/not buckets).
    val dNum = (off.featNumber + (if (isNumberToken(label)) off.isTok else off.notTok)) % dims
    val dGeo = (off.featGeo + (if (isLongitudeLatitudeToken(label)) off.isTok else off.notTok)) % dims
    buf(dNum) += 0.6
    buf(dGeo) += 0.6

    // L2 normalize and compact to sparse form.
    var nnz = 0
    i = 0
    var normSq = 0.0
    while (i < dims) {
      val v = buf(i)
      if (v != 0.0) { nnz += 1; normSq += v * v }
      i += 1
    }
    val norm = math.sqrt(normSq)
    val indices = new Array[Int](nnz)
    val values = new Array[Double](nnz)
    var k = 0
    i = 0
    while (i < dims) {
      if (buf(i) != 0.0) {
        indices(k) = i
        values(k) = if (norm > 0.0) buf(i) / norm else buf(i)
        k += 1
      }
      i += 1
    }
    TokenVec(label, indices, values)
  }

  /** Tokenize a document into labeled sparse vectors (empty tokens dropped). */
  def tokenizeIntoVectors(source: String, dims: Int = DefaultDims): List[TokenVec] =
    splitWords(source).map(vectorizeToken(_, dims))

  /** Identity angle key for one token vector (the lexicon key). */
  def angleOfId(t: TokenVec, dims: Int = DefaultDims): Double =
    VectorOps.angleOfIdentity(t.indices, t.values, dims)

  /** Hashed dimension of the positional-bigram feature — chars `a`,`b` with
    * bigram start offset `pos` — i.e. the exact bucket `vectorizeToken`
    * weights +0.75. Exposed so the token synthesizer targets real
    * dimensions of THIS vectorizer instead of a parallel re-derived hash
    * (≙ TokenSynthesizer.cs:18-31, which re-implements StringAnalyzer's
    * hash for the same purpose). */
  def positionalBigramDim(a: Char, b: Char, pos: Int,
                          dims: Int = DefaultDims): Int = {
    val off = offsets(dims)
    val span = Array(a, b, (pos & 0xFF).toChar, ((pos >> 8) & 0xFF).toChar)
    (off.bg + idx(span, 0, 4, dims)) % dims
  }

  // -------------------------------------------------------- number/geo checks

  def isVowel(c: Char): Boolean = Character.toLowerCase(c) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' => true
    case _ => false
  }

  /**
   * Invariant-culture float pattern: optional sign, digits with optional
   * thousands separators, optional decimal point, optional exponent.
   * (No hex / Infinity / NaN / type suffixes.)
   */
  def isNumberToken(s: String): Boolean = parseInvariantDouble(s).isDefined

  private val NumberRe =
    "^[+-]?(?:[0-9][0-9,]*)?(?:\\.[0-9]*)?(?:[eE][+-]?[0-9]+)?$".r

  def parseInvariantDouble(raw: String): Option[Double] = {
    if (raw == null) return None
    val s = raw.trim
    if (s.isEmpty || !NumberRe.matches(s)) return None
    val noCommas = s.replace(",", "")
    if (!noCommas.exists(Character.isDigit)) return None
    try Some(java.lang.Double.parseDouble(noCommas))
    catch { case _: NumberFormatException => None }
  }

  private def inLatRange(v: Double) = v >= -90.0 && v <= 90.0
  private def inLonRange(v: Double) = v >= -180.0 && v <= 180.0

  /** Parse "12.34" / "12.34N" → (value, hemisphere or ' '). */
  private def parseDecimalWithHemisphere(raw: String): Option[(Double, Char)] = {
    var s = raw.trim
    if (s.isEmpty) return None
    var hemi = ' '
    val last = s.charAt(s.length - 1)
    if ("NnSsEeWw".indexOf(last) >= 0) {
      hemi = Character.toUpperCase(last)
      s = s.substring(0, s.length - 1).trim
    }
    parseInvariantDouble(s).map(v => (v, hemi))
  }

  /**
   * Geo-coordinate detection: decimal pairs ("40.7128,-74.0060",
   * "34.05 -118.24"), hemisphere-suffixed singles ("51.5074N"), DMS
   * (40°42'51"N) and packed DMS (404156°N), with lat/lon range validation.
   */
  def isLongitudeLatitudeToken(raw: String): Boolean = {
    if (raw == null || raw.isEmpty) return false
    val s = raw

    def pairOk(l: String, r: String): Boolean =
      (parseDecimalWithHemisphere(l), parseDecimalWithHemisphere(r)) match {
        case (Some((lat, lh)), Some((lon, rh))) =>
          val latOk = inLatRange(lat) && (lh == ' ' || lh == 'N' || lh == 'S')
          val lonOk = inLonRange(lon) && (rh == ' ' || rh == 'E' || rh == 'W')
          latOk && lonOk
        case _ => false
      }

    val commaIdx = s.indexOf(',')
    if (commaIdx >= 0) {
      if (pairOk(s.substring(0, commaIdx), s.substring(commaIdx + 1))) return true
    } else {
      val spaceIdx = s.indexOf(' ')
      if (spaceIdx > 0 &&
        pairOk(s.substring(0, spaceIdx), s.substring(spaceIdx + 1))) return true
    }

    parseDecimalWithHemisphere(s) match {
      case Some((v, hemi)) =>
        if (hemi == 'N' || hemi == 'S') return inLatRange(v)
        if (hemi == 'E' || hemi == 'W') return inLonRange(v)
        if (inLatRange(v) || inLonRange(v)) return true
      case None =>
    }

    // DMS forms.
    val degIdx = s.indexOf('°')
    if (degIdx > 0) {
      val degPart = s.substring(0, degIdx)
      parseInvariantDouble(degPart.replace(",", "")) match {
        case Some(deg) if !degPart.contains(',') =>
          val likelyLat = deg >= 0 && deg <= 90
          val likelyLon = deg >= 0 && deg <= 180
          val hasMin = s.indexOf('\'') > degIdx
          val hasSec = s.indexOf('"') > degIdx
          if ((hasMin || hasSec) && (likelyLat || likelyLon)) {
            val lastC = Character.toUpperCase(s.charAt(s.length - 1))
            if (lastC == 'N' || lastC == 'S') return likelyLat
            if (lastC == 'E' || lastC == 'W') return likelyLon
            return true
          }
        case _ =>
      }
      // Packed DMS: 5-7 digits DDMMSS / DDDMMSS before the degree sign.
      val packed = s.substring(0, degIdx)
      if (packed.forall(Character.isDigit)) {
        val digitCount = packed.length
        if (digitCount >= 5 && digitCount <= 7) {
          val ss = packed.substring(packed.length - 2).toInt
          val mm = packed.substring(packed.length - 4, packed.length - 2).toInt
          val dd = packed.substring(0, packed.length - 4).toInt
          if (mm < 60 && ss < 60) {
            val decimalDegrees = dd + mm / 60.0 + ss / 3600.0
            val lastC = Character.toUpperCase(s.charAt(s.length - 1))
            if (lastC == 'N' || lastC == 'S') return decimalDegrees <= 90.0
            if (lastC == 'E' || lastC == 'W') return decimalDegrees <= 180.0
            return decimalDegrees <= 180.0
          }
        }
      }
    }
    false
  }

  // ------------------------------------------------------------- comparisons

  /** Cosine similarity of two strings via their first/last token vectors. */
  def compare(str1: String, str2: String, dims: Int = DefaultDims): Double = {
    val tokens = tokenizeIntoVectors(str1, dims) ++ tokenizeIntoVectors(str2, dims)
    if (tokens.isEmpty) return 0.0
    val a = tokens.head
    val b = tokens.last
    VectorOps.cosineSparse(a.indices, a.values, b.indices, b.values)
  }

  /** Angle of a string's first token vector vs the all-ones unit vector. */
  def compareToUnitVector(str: String, dims: Int = DefaultDims): Double = {
    val tokens = tokenizeIntoVectors(str, dims)
    if (tokens.isEmpty) return 0.0
    val t = tokens.head
    val u = 1.0 / math.sqrt(dims.toDouble)
    var dot = 0.0
    var i = 0
    while (i < t.values.length) { dot += t.values(i) * u; i += 1 }
    val norm = VectorOps.l2Norm(t.values)
    if (norm == 0.0) 0.0 else dot / norm
  }
}
