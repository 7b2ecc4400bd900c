package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for
  * suffix stripping", Program 14(3), 1980 — public knowledge, the
  * baseline stemmer of Lucene's EnglishAnalyzer lineage and of every
  * IR textbook), including the two departures Porter's own reference
  * implementations adopted and documented: step 2 maps `bli -> ble`
  * (rather than the paper's `abli -> able`) and adds `logi -> log`.
  *
  * One deterministic Scala definition serves BOTH sides of the
  * engine's analyzer parity discipline: the build plan evaluates it
  * through the codegen'd [[PorterStem]] expression below, and the
  * query side folds terms through the same static method
  * ([[LexicalStore.foldQueryTerms]]'s bucketOf-style parity — there
  * is exactly one stem function, so index-time and query-time can
  * not disagree). The DuckDB oracle consumes the vocabulary-sized
  * (token, stem) mapping the Verify aux dump materializes — this
  * environment's DuckDB cannot load its `fts` extension (zero
  * egress), so the stem itself is pinned by StemmerSpec against the
  * algorithm's published example vectors instead, and the oracle
  * independently re-derives everything downstream of the mapping
  * (tokenization, stopword gate, tf re-aggregation, BM25, ranks).
  *
  * Tokens reaching this in the `english` analyzer chain are already
  * lowercase `[a-z0-9]+` (the folded tier runs first); any other
  * character classifies as a consonant, exactly as the reference
  * implementation treats it. Words of length <= 2 return unchanged.
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    // +2 headroom: setto() can lengthen the word (e.g. "bl" -> "ble")
    val b = java.util.Arrays.copyOf(word.toCharArray, word.length + 2)
    var k = word.length - 1
    var j = 0

    def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** Measure of the stem b[0..j]: the m of [C](VC)^m[V]. */
    def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1 // optional initial C
      if (i > j) return n
      i += 1
      while (true) {
        while (i <= j && !cons(i)) i += 1 // vowels
        if (i > j) return n
        i += 1
        n += 1
        while (i <= j && cons(i)) i += 1 // consonants
        if (i > j) return n
        i += 1
      }
      n
    }

    def vowelInStem(): Boolean = (0 to j).exists(i => !cons(i))

    def doubleC(i: Int): Boolean = i >= 1 && b(i) == b(i - 1) && cons(i)

    /** cvc at i, where the final c is not w, x or y (the *o rule). */
    def cvc(i: Int): Boolean =
      i >= 2 && cons(i) && !cons(i - 1) && cons(i - 2) &&
        b(i) != 'w' && b(i) != 'x' && b(i) != 'y'

    /** True (and sets j) when b[0..k] ends with `s`. */
    def ends(s: String): Boolean = {
      val l = s.length
      if (l > k + 1) return false
      var i = 0
      while (i < l) {
        if (b(k - l + 1 + i) != s.charAt(i)) return false
        i += 1
      }
      j = k - l
      true
    }

    /** Overwrite the suffix after j with `s`. */
    def setTo(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }

    def r(s: String): Unit = if (m() > 0) setTo(s)

    // step 1ab: plurals and -ed / -ing
    if (b(k) == 's') {
      if (ends("sses")) k -= 2
      else if (ends("ies")) setTo("i")
      else if (b(k - 1) != 's') k -= 1
    }
    if (ends("eed")) { if (m() > 0) k -= 1 }
    else if ((ends("ed") || ends("ing")) && vowelInStem()) {
      k = j
      if (ends("at")) setTo("ate")
      else if (ends("bl")) setTo("ble")
      else if (ends("iz")) setTo("ize")
      else if (doubleC(k)) {
        k -= 1
        val ch = b(k)
        if (ch == 'l' || ch == 's' || ch == 'z') k += 1
      }
      else if (m() == 1 && cvc(k)) setTo("e")
    }

    // step 1c: terminal y -> i when the stem has a vowel
    if (ends("y") && vowelInStem()) b(k) = 'i'

    // step 2: double suffixes -> single (m > 0)
    if (k >= 1) b(k - 1) match {
      case 'a' =>
        if (ends("ational")) r("ate")
        else if (ends("tional")) r("tion")
      case 'c' =>
        if (ends("enci")) r("ence")
        else if (ends("anci")) r("ance")
      case 'e' =>
        if (ends("izer")) r("ize")
      case 'l' =>
        if (ends("bli")) r("ble") // departure: paper had abli -> able
        else if (ends("alli")) r("al")
        else if (ends("entli")) r("ent")
        else if (ends("eli")) r("e")
        else if (ends("ousli")) r("ous")
      case 'o' =>
        if (ends("ization")) r("ize")
        else if (ends("ation")) r("ate")
        else if (ends("ator")) r("ate")
      case 's' =>
        if (ends("alism")) r("al")
        else if (ends("iveness")) r("ive")
        else if (ends("fulness")) r("ful")
        else if (ends("ousness")) r("ous")
      case 't' =>
        if (ends("aliti")) r("al")
        else if (ends("iviti")) r("ive")
        else if (ends("biliti")) r("ble")
      case 'g' =>
        if (ends("logi")) r("log") // departure: added after publication
      case _ => ()
    }

    // step 3: -ic-, -full, -ness etc. (m > 0)
    if (k >= 0) b(k) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' =>
        if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' =>
        if (ends("ness")) r("")
      case _ => ()
    }

    // step 4: strip -ant, -ence etc. when m > 1
    if (k >= 1) {
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) ||
          ends("ou") // takes care of -ous
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _ => false
      }
      if (matched && m() > 1) k = j
    }

    // step 5: final -e and -ll tidy-up
    j = k
    if (b(k) == 'e') {
      val a = m()
      if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
    }
    if (b(k) == 'l' && doubleC(k) && m() > 1) k -= 1

    new String(b, 0, k + 1)
  }

  /** UTF8String form for the codegen path. */
  def stemUtf8(s: UTF8String): UTF8String = UTF8String.fromString(stem(s.toString))
}

/** porter_stem(term): the [[PorterStemmer]] kernel as a native
  * codegen expression — one static call in generated code (the
  * NativeHashExprs pattern), so the `english` analyzer's build
  * tokenization stays inside WholeStageCodegen with no ScalaUDF
  * encoder round trip ahead of the tf shuffle. */
case class PorterStem(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"expected STRING input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    PorterStemmer.stemUtf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.PorterStemmer.stemUtf8($t)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object PorterStem {
  /** Column form of [[PorterStem]]. */
  def porterStem(c: Column): Column = shims.toColumn(PorterStem(shims.toExpression(c)))
}
