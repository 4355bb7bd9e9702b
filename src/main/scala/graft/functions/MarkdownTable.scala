package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markdown-table parse — the harness-history report reader
  * (`src/ui/harnessHistory.ts:15-117`): pull `| a | b |` tables out of a
  * markdown column into one relational row per cell.
  *
  * Reproduced semantics:
  *   - only `|`-prefixed lines participate; leading segment dropped, trailing
  *     dropped when blank; cells trimmed (`splitTableLine`);
  *   - first table line = headers (emphasis stripped); `:---:`/`===`
  *     separator rows skipped; all-empty rows skipped;
  *   - cell text: `&nbsp;`/`&#160;` decoded, `*`/`_` emphasis wrappers
  *     stripped (emphasis flag), `[label](href)` links split out;
  *   - placeholder rows ("no runs … captured") classified, not emitted as
  *     data (`kind = 'placeholder'`).
  *
  * Everything is built from array/regexp expressions — no UDF, whole plan
  * stays codegen-friendly; the only shuffle is the per-document window that
  * numbers kept rows. The reference's unbounded emphasis-strip loop becomes
  * a bounded 4-deep unroll (markdown nests `**_x_**` two levels in
  * practice).
  */
object MarkdownTable {

  private val EmphasisRe = "^(\\*+|_+)(.*?)(\\1)$"
  private val LinkRe = "^\\[([^\\]]+)\\]\\(([^)]+)\\)$"

  private def decodeEntities(c: Column): Column =
    regexp_replace(regexp_replace(c, "(?i)&nbsp;", " "), "&#160;", " ")

  /** One emphasis-strip step: `*x*`/`_x_`/`**x**` → trimmed inner. */
  private def stripOnce(c: Column): Column =
    trim(regexp_replace(c, EmphasisRe, "$2"))

  private def stripEmphasis(c: Column): Column =
    stripOnce(stripOnce(stripOnce(stripOnce(c))))

  /** `splitTableLine`: segments between pipes, leading dropped, blank
    * trailing dropped, trimmed. Empty array for non-table lines. */
  private def splitTableLine(line: Column): Column = {
    val segs = transform(split(line, "\\|"), trim(_))
    val shifted = slice(segs, lit(2), greatest(size(segs) - 1, lit(0)))
    val cells = when(size(shifted) > 0 && element_at(shifted, -1) === "",
      slice(shifted, lit(1), size(shifted) - 1)).otherwise(shifted)
    when(startswith(trim(line), lit("|")) && trim(line) =!= "|", cells)
      .otherwise(array().cast("array<string>"))
  }

  private def isSeparator(cells: Column): Column =
    size(cells) > 0 && forall(cells,
      c => regexp_replace(c, "\\s+", "").rlike("^:?[-=]+:?$"))

  /** Parse `mdCol` of `df` into one row per table cell. Output:
    * `idCols ++ (row_idx, col_idx, header, text, href, emphasis, kind)` —
    * `kind` is `cell` or `placeholder`; `row_idx` numbers kept data rows
    * per document (1-based), `header` is the column's header text. */
  def parse(df: DataFrame, mdCol: String, idCols: Seq[String]): DataFrame = {
    val ids = idCols.map(col)
    val lines = filter(
      transform(split(col(mdCol), "\r?\n"), trim(_)),
      l => startswith(l, lit("|")))
    // reference returns null for <2 table lines — represented as no rows
    val tabled = df
      .withColumn("_lines", lines)
      .filter(size(col("_lines")) >= 2)
      .withColumn("_headers",
        transform(splitTableLine(element_at(col("_lines"), 1)),
          h => stripEmphasis(decodeEntities(h))))
      .filter(size(col("_headers")) > 0)
    val dataRows = tabled
      .select(ids :+ col("_headers") :+
        posexplode(slice(col("_lines"), lit(2), greatest(size(col("_lines")) - 1, lit(0))))
          .as(Seq("_line_idx", "_line")): _*)
      .withColumn("_cells", splitTableLine(col("_line")))
      .filter(size(col("_cells")) > 0 && !isSeparator(col("_cells")))
      .withColumn("_parsed", transform(col("_cells"), c => {
        val stripped = stripEmphasis(decodeEntities(c))
        val label = regexp_extract(stripped, LinkRe, 1)
        val href = regexp_extract(stripped, LinkRe, 2)
        struct(
          when(label =!= "", trim(label)).otherwise(stripped).as("text"),
          when(href =!= "", href).as("href"),
          (stripped =!= decodeEntities(c)).as("emphasis"))
      }))
      .filter(!forall(col("_parsed"), p => p.getField("text") === ""))
      .withColumn("_first", lower(element_at(col("_parsed"), 1).getField("text")))
      .withColumn("kind",
        when(col("_first").contains("no runs") && col("_first").contains("captured"),
          "placeholder").otherwise("cell"))
    dataRows
      .withColumn("row_idx",
        when(col("kind") === "cell",
          row_number().over(
            Window.partitionBy((ids :+ col("kind")): _*).orderBy("_line_idx")).cast("long")))
      .select(ids :+ col("_headers") :+ col("row_idx") :+ col("kind") :+
        posexplode(col("_parsed")).as(Seq("col_idx", "cell")): _*)
      .select(ids ++ Seq(
        col("row_idx"), col("col_idx").cast("long").as("col_idx"),
        element_at(col("_headers"), col("col_idx") + 1).as("header"),
        col("cell.text").as("text"), col("cell.href").as("href"),
        col("cell.emphasis").as("emphasis"), col("kind")): _*)
  }
}
