package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Query, Tables}

/** Spreadsheet point/range read-write semantics (SURVEY.md §2.1
  * S5-S8) over the token grid from TextOps.cells: point lookup,
  * range read pivoted back to grid shape, and the idempotent
  * merge-upsert that replaces the reference's duplicate-id append
  * (indexer.py:56 defect). At scale the merge is a single shuffled
  * full-outer join on the cell key; the point read is a pushed-down
  * filter, not a scan.
  */
object GridOps {

  /** S5 point/column read over a cell frame (doc_id, col_letter,
    * value): a pushed-down filter, never a scan at scale. */
  def pointRead(cells: DataFrame, colLetter: String,
                fromDoc: Long, toDoc: Long): DataFrame =
    cells
      .filter(col("col_letter") === colLetter && col("doc_id").between(fromDoc, toDoc))
      .select(col("doc_id"), col("col_letter"), col("value"))

  /** q70: [[pointRead]] of column C, sheet rows 2..11. */
  private def q70(s: SparkSession, d: String): DataFrame =
    pointRead(TextOps.cells(s, d), "C", 0, 9).orderBy("doc_id")

  private val q70Sql = """
    SELECT doc_id, 'C' AS col_letter, l[3] AS value
    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    WHERE doc_id BETWEEN 0 AND 9 AND len(l) >= 3 AND length(trim(l[3])) > 0
    ORDER BY doc_id"""

  /** S6 range read — filter + pivot back to grid shape (the A1-range
    * `get()` of the reference's toolkit, sheet_creator_tool.py:70-81). */
  def rangeRead(cells: DataFrame, fromDoc: Long, toDoc: Long,
                nCols: Int): DataFrame = {
    val letters = (0 until nCols).map(i => ('A' + i).toChar.toString)
    cells
      .filter(col("doc_id").between(fromDoc, toDoc) && col("colidx") < nCols)
      .groupBy(col("doc_id"))
      .pivot("col_letter", letters)
      .agg(first(col("value")))
  }

  /** q71: [[rangeRead]] A10:D12. */
  private def q71(s: SparkSession, d: String): DataFrame =
    rangeRead(TextOps.cells(s, d), 10, 12, 4).orderBy("doc_id")

  private val q71Sql = """
    SELECT doc_id, l[1] AS A, l[2] AS B, l[3] AS C, l[4] AS D
    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    WHERE doc_id BETWEEN 10 AND 12
    ORDER BY doc_id"""

  /** S7/S8 upsert: merge `updates` (doc_id, colidx, new_value) into a
    * base cell grid via full-outer + coalesce — idempotent overwrite
    * semantics (applying twice yields the same table), one shuffled
    * join on the cell key at scale. */
  def upsert(base: DataFrame, updates: DataFrame): DataFrame =
    base.join(updates, Seq("doc_id", "colidx"), "full_outer")
      .select(col("doc_id"), col("colidx"),
        coalesce(col("new_value"), col("value")).as("value"))

  /** q72: [[upsert]] uppercasing the first 3 cells of docs 0-4. */
  private def q72(s: SparkSession, d: String): DataFrame = {
    val base = TextOps.cells(s, d)
      .select(col("doc_id"), col("colidx"), col("value"))
    val updates = base
      .filter(col("doc_id") < 5 && col("colidx") < 3)
      .select(col("doc_id"), col("colidx"), upper(col("value")).as("new_value"))
    upsert(base, updates)
      .filter(col("doc_id") < 8)
      .orderBy("doc_id", "colidx")
  }

  private val q72Sql = """
    WITH cells AS (
      SELECT doc_id, i-1 AS colidx, l[i] AS value
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
           UNNEST(generate_series(1, len(l))) AS t(i)
      WHERE length(trim(l[i])) > 0
    )
    SELECT doc_id, colidx,
           CASE WHEN doc_id < 5 AND colidx < 3 THEN upper(value) ELSE value END AS value
    FROM cells WHERE doc_id < 8
    ORDER BY doc_id, colidx"""

  /** Index-job report (SURVEY.md §2.6 A1): per user, total events,
    * error count, and the sorted error-id list — the reference's
    * success/failure accumulator as one aggregation. */
  private def q73(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("total"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("failed"),
        concat_ws(",",
          sort_array(collect_list(when(col("event_type") === "error", col("event_id"))))
            .cast("array<string>")).as("error_ids"))
      .orderBy("user_id")

  private val q73Sql = """
    SELECT user_id, COUNT(*) AS total,
           CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS failed,
           COALESCE(array_to_string(list_sort(list(event_id) FILTER (event_type='error')), ','), '') AS error_ids
    FROM events GROUP BY user_id ORDER BY user_id"""

  val queries: Seq[Query] = Seq(
    Query("q70_point_read",   q70, Some(q70Sql)),
    Query("q71_range_read",   q71, Some(q71Sql)),
    Query("q72_upsert_merge", q72, Some(q72Sql)),
    Query("q73_index_report", q73, Some(q73Sql)))
}
