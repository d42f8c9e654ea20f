package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 batch (q294): corpus-TRANSFORMING dedup.
  *
  *  - q294 CCNet-style paragraph dedup with reconstruction
  *    ([[graft.ext.TextDedup.dedupParagraphsKeepFirst]]): split every
  *    document on a separator, keep each distinct paragraph's global
  *    FIRST occurrence (by (doc_id, position) — deterministic), drop
  *    every later repeat, reassemble the documents. The span shelf
  *    ([[graft.ext.TextDedup.dupSpans]]) only REPORTS duplicated
  *    regions; this is the operator that actually rewrites the corpus
  *    — the "remove boilerplate paragraphs" stage of a CCNet-style
  *    curation pipeline. The generated documents have no newlines, so
  *    the gate splits on a common token (" the ") — plenty of short
  *    repeated "paragraphs" across the corpus, which is exactly the
  *    regime the keep-first rule must get deterministically right.
  */
object Extended31 {

  private val Sep = " the "

  def q294(s: SparkSession, dir: String): DataFrame =
    graft.ext.TextDedup.dedupParagraphsKeepFirst(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", Sep)
      .orderBy(col("doc_id"))

  val q294Sql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, '$Sep') AS ps
       |           FROM documents),
       | paras AS (SELECT doc_id,
       |     unnest(generate_series(1, len(ps))) AS pos,
       |     unnest(ps) AS para
       |   FROM d),
       | kept AS (SELECT doc_id, pos, para,
       |     row_number() OVER (PARTITION BY para ORDER BY doc_id, pos)
       |       AS rn
       |   FROM paras),
       | rebuilt AS (SELECT doc_id,
       |     string_agg(para, '$Sep' ORDER BY pos) AS text
       |   FROM kept WHERE rn = 1 GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(r.text, '') AS text
       |FROM d LEFT JOIN rebuilt r USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Name → query, for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q294_paragraph_dedup" -> (q294 _)
  )

  /** Name → DuckDB oracle SQL, for SparkEntry. */
  val oracles: Map[String, String] = Map(
    "q294_paragraph_dedup" -> q294Sql
  )
}
