package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Declarative text-analysis kernels for the training-data pipeline:
  * token counting, quality scoring, stopword-based language ID.
  * Everything here is built-in-function composition (codegen'd, no
  * UDF) and each has an exact DuckDB SQL mirror for the oracle gate.
  */
object TextAnalysis {

  /** Whitespace token count (split on runs of spaces). */
  def tokenCount(c: Column): Column =
    size(split(trim(c), " +"))

  def sqlTokenCount(col: String): String =
    s"len(regexp_split_to_array(trim($col), ' +'))"

  /** BPE-ish subword count: letter runs count ceil(len/4) units,
    * digits and other non-space symbols one each — a cheap, vocabulary
    * -free token estimate with identical regex semantics in both
    * engines. */
  def subwordCount(c: Column): Column = {
    val letterRuns = regexp_extract_all(c, lit("[\\p{L}]+"), lit(0))
    val others = regexp_count(c, lit("[^\\p{L}\\s]"))
    aggregate(letterRuns, lit(0L),
      (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long")) + others.cast("long")
  }

  // outer CAST: DuckDB SUM over integers yields HUGEINT, which pandas
  // renders as float64 — cast back so the column stays BIGINT like Spark
  def sqlSubwordCount(col: String): String =
    s"""CAST((SELECT COALESCE(SUM(CAST(ceil(length(w)/4.0) AS BIGINT)), 0)
         FROM UNNEST(regexp_extract_all($col, '[a-zA-Z]+')) AS t(w))
       + len(regexp_extract_all($col, '[^a-zA-Z \\t\\n]')) AS BIGINT)"""

  /** Stopword lexicons (tiny, deterministic) for language ID. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "est", "pour", "que", "dans"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "个"))

  val Langs: Seq[String] = Seq("de", "en", "es", "fr", "zh") // fixed order

  private def hits(tokens: Column, lang: String): Column =
    size(array_intersect(tokens,
      array(Stopwords(lang).map(lit): _*)))

  /** Per-language stopword hit counts, as named columns. */
  def langHits(text: Column): Map[String, Column] = {
    val toks = split(lower(text), "[^\\p{L}\\p{N}]+")
    Langs.map(l => l -> hits(toks, l)).toMap
  }

  /** argmax over langHits with deterministic first-max-in-Langs-order
    * tie-break; "und" (undetermined) when no stopword hits at all. */
  def langId(text: Column): Column = {
    val h = langHits(text)
    val maxHits = greatest(Langs.map(h): _*)
    val pick = Langs.foldRight(lit("und")) { (l, acc) =>
      when(h(l) === maxHits, lit(l)).otherwise(acc)
    }
    when(maxHits === 0, lit("und")).otherwise(pick)
  }

  /** DuckDB mirror of langId + hit counts. tokcol must be a
    * pre-split lowercase token list column. */
  def sqlLangHits(tokcol: String, lang: String): String = {
    val words = Stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_intersect($tokcol, [$words]))"
  }

  def sqlLangId(tokcol: String): String = {
    val hs = Langs.map(l => sqlLangHits(tokcol, l))
    val maxExpr = s"greatest(${hs.mkString(", ")})"
    val cases = Langs.zip(hs).map { case (l, h) =>
      s"WHEN $h = $maxExpr THEN '$l'"
    }.mkString(" ")
    s"CASE WHEN $maxExpr = 0 THEN 'und' $cases ELSE 'und' END"
  }

  /** Quality features: (n_chars, n_tokens, mean token len, punct
    * ratio, digit ratio) and a composite [0,1] score. Ratios are
    * int/int double divisions — bit-identical across engines. */
  def qualityCols(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val nTok = tokenCount(text)
    val nPunct = regexp_count(text, lit("[.,;:!?]"))
    val nDigit = regexp_count(text, lit("[0-9]"))
    val meanTokLen = (nChars - (nTok - 1)).cast("double") / nTok
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTok,
      "mean_tok_len" -> meanTokLen,
      "punct_ratio" -> nPunct.cast("double") / nChars,
      "digit_ratio" -> nDigit.cast("double") / nChars)
  }
}
