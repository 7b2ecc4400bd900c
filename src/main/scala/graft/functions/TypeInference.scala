package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Heuristic string->type inference (SURVEY.md §2.4 F5; reference
  * /root/reference/sheet_creator_tool.py:98-128): classifies a cell
  * string as integer / float / boolean (en + vi) / date
  * (dd/mm/yyyy or yyyy-mm-dd) / string. Declarative when-chain —
  * codegen'd, no UDF. The same predicates are mirrored in oracle SQL
  * (anchored regexes behave identically in Java regex and RE2).
  */
object TypeInference {

  val IntPat = "^[+-]?[0-9]+$"
  val FloatPat = "^[+-]?[0-9]*\\.[0-9]+$"
  val DateDmyPat = "^[0-9]{1,2}/[0-9]{1,2}/[0-9]{4}$"
  val DateIsoPat = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
  /** en + vi boolean lexicon, as in the reference (:116). */
  val BoolWords = Seq("true", "false", "yes", "no", "đúng", "sai")

  def suggestDataType(c: Column): Column = {
    val t = trim(c)
    when(t.rlike(IntPat), "integer")
      .when(t.rlike(FloatPat), "float")
      .when(lower(t).isin(BoolWords: _*), "boolean")
      .when(t.rlike(DateDmyPat) || t.rlike(DateIsoPat), "date")
      .otherwise("string")
  }

  /** DuckDB mirror of suggestDataType for oracle SQL. */
  def sql(col: String): String = {
    val bools = BoolWords.map(w => s"'$w'").mkString(", ")
    s"""CASE
       WHEN regexp_matches(trim($col), '$IntPat') THEN 'integer'
       WHEN regexp_matches(trim($col), '$FloatPat') THEN 'float'
       WHEN lower(trim($col)) IN ($bools) THEN 'boolean'
       WHEN regexp_matches(trim($col), '$DateDmyPat')
         OR regexp_matches(trim($col), '$DateIsoPat') THEN 'date'
       ELSE 'string' END"""
  }
}
