package graft.stats

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Release-dashboard wiki document (reference:
  * R/dashboard_markdown_generator.R:1-67 renders
  * templates/dashboardTemplate.Rmd into the release folder's wiki).
  *
  * The distributed part is the [[Dashboard]] aggregations feeding each
  * section; this sink renders their driver-small results into one
  * markdown document with the template's section structure — the same
  * split as the reference, where R knits kable tables out of already-
  * aggregated frames. Like [[graft.sources.CbioSinks]], the final text
  * emit is a few KB on the driver.
  */
object DashboardWiki {

  /** GitHub/kable-style pipe table of a driver-small aggregate. The
    * guard is a contract, not a limit: anything bigger than `maxRows`
    * is not a dashboard table and indicates an unaggregated frame was
    * passed in.
    */
  def mdTable(df: DataFrame, maxRows: Int = 1000): String = {
    val cols = df.columns
    val rows = df
      .select(cols.toIndexedSeq.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
      .limit(maxRows + 1)
      .collect()
    require(rows.length <= maxRows,
      s"mdTable: aggregate exceeds $maxRows rows — not a dashboard table")
    val header = cols.mkString("| ", " | ", " |")
    val rule = cols.map(_ => "---").mkString("| ", " | ", " |")
    // escape the two things that break a pipe table: '|' (cell
    // delimiter) and embedded line breaks (row delimiter)
    val body = rows.map(_.toSeq.map(v => v.toString
        .replace("|", "\\|")
        .replace("\r\n", "<br>").replace("\n", "<br>").replace("\r", "<br>"))
      .mkString("| ", " | ", " |"))
    (Seq(header, rule) ++ body).mkString("\n")
  }

  /** Render the dashboard wiki (template section order:
    * dashboardTemplate.Rmd:274 sample/variant counts, :320 retraction
    * policy, :402 failed annotations, :437-472 clinical-attribute
    * distributions, :491 null cancer types, :504 missing variant
    * counts).
    */
  def render(release: String,
             releaseContent: DataFrame,
             failedAnnotations: DataFrame,
             attributeDistributions: Seq[(String, DataFrame)],
             retraction: Option[DataFrame] = None,
             nullCancerTypes: Option[DataFrame] = None,
             missingVariantCounts: Option[DataFrame] = None): String = {
    val sb = new StringBuilder
    // single-quoted YAML scalar: quotes double, line breaks flatten —
    // a release id must not be able to produce invalid front matter
    val safeTitle = release.replace("'", "''")
      .replace("\r", " ").replace("\n", " ")
    sb ++= s"---\ntitle: '$safeTitle'\n---\n"

    sb ++= "\n## Sample and Variant Count per center\n\n"
    sb ++= mdTable(releaseContent)
    sb ++= "\n"

    sb ++= "\n## GENIE Retraction Policy\n\n"
    sb ++= "Samples retracted from the current release are listed below.\n"
    retraction.foreach { r => sb ++= "\n"; sb ++= mdTable(r); sb ++= "\n" }

    sb ++= "\n### Genome nexus failed annotations summary\n\n"
    // the template fixes the two column labels (dashboardTemplate.Rmd:420)
    val fa = if (failedAnnotations.columns.length == 2)
      failedAnnotations.toDF("Center", "Number of failed annotations")
    else failedAnnotations
    sb ++= mdTable(fa)
    sb ++= "\n"

    sb ++= "\n## Distribution of Clinical Attributes\n"
    attributeDistributions.foreach { case (attr, df) =>
      sb ++= s"\n### $attr\n\n"
      sb ++= mdTable(df)
      sb ++= "\n"
    }
    nullCancerTypes.foreach { df =>
      sb ++= "\n### Cancer Type (Null)\n\n"
      sb ++= mdTable(df)
      sb ++= "\n"
    }

    missingVariantCounts.foreach { df =>
      sb ++= "\n## Missing Variant Counts\n\n"
      sb ++= mdTable(df)
      sb ++= "\n"
    }
    sb.result()
  }

  /** Write the rendered document (driver-side, like the reference's
    * rmarkdown::render output stored next to the release).
    */
  def write(content: String, outFile: String): Unit = {
    Option(Paths.get(outFile).getParent).foreach(Files.createDirectories(_))
    Files.write(Paths.get(outFile), content.getBytes(StandardCharsets.UTF_8))
  }
}
