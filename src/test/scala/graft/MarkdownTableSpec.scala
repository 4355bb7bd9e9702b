package graft

import org.apache.spark.sql.functions._
import graft.functions.MarkdownTable

/** Markdown-table parse (`src/ui/harnessHistory.ts:15-117`): header strip,
  * separator skip, emphasis/link/entity cell parsing, placeholder rows,
  * empty-row and non-table-line skipping. */
class MarkdownTableSpec extends SparkSpec {

  import spark.implicits._

  private val md =
    """# Harness history
      |
      || **Run** | _Status_ | Link&nbsp;col |
      || :--- | :---: | ---: |
      || **r1** | pass | [report](http://x/r1) |
      ||  |  |  |
      || r2 | *fail* | plain |
      || no runs captured yet |  |  |
      |not a | table line
      |""".stripMargin

  private lazy val parsed =
    MarkdownTable.parse(Seq(("d1", md)).toDF("doc_id", "md"), "md", Seq("doc_id"))
      .collect()

  test("headers stripped of emphasis/entities; separator and empty rows skipped") {
    val headers = parsed.map(_.getAs[String]("header")).distinct.toSet
    assert(headers === Set("Run", "Status", "Link col"))
    // 2 kept data rows × 3 cells + 1 placeholder row × 3 cells
    assert(parsed.count(_.getAs[String]("kind") == "cell") === 6)
  }

  test("cells: emphasis flag, link split, row numbering in document order") {
    val cells = parsed.filter(_.getAs[String]("kind") == "cell")
      .map(r => (r.getAs[Long]("row_idx"), r.getAs[String]("header"),
        r.getAs[String]("text"), r.getAs[String]("href"), r.getAs[Boolean]("emphasis")))
    assert(cells.contains((1L, "Run", "r1", null, true)))
    assert(cells.contains((1L, "Status", "pass", null, false)))
    assert(cells.contains((1L, "Link col", "report", "http://x/r1", false)))
    assert(cells.contains((2L, "Run", "r2", null, false)))
    assert(cells.contains((2L, "Status", "fail", null, true)))
  }

  test("placeholder row classified, not numbered") {
    val ph = parsed.filter(_.getAs[String]("kind") == "placeholder")
    assert(ph.nonEmpty)
    assert(ph.forall(r => r.isNullAt(r.fieldIndex("row_idx"))))
    assert(ph.head.getAs[String]("text") === "no runs captured yet")
  }

  test("documents without a table parse to zero rows") {
    val none = MarkdownTable.parse(
      Seq(("d2", "just text\n| lonely"), ("d3", null.asInstanceOf[String]))
        .toDF("doc_id", "md"), "md", Seq("doc_id"))
    assert(none.count() === 0L)
  }
}
