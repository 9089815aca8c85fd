package graft.formats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.rules.{RowRule, Rules, ValidationResult}

/** SEG + SV format validators (SURVEY §2.2 P22, P14; reference seg.py,
  * structural_variant.py). Small rule sets; same one-pass battery.
  */
object SegFormat {

  val requiredColumns: Seq[String] = Seq(
    "ID", "CHROM", "LOC.START", "LOC.END", "NUM.MARK", "SEG.MEAN")

  def rowRules(center: String): Seq[RowRule] = {
    val key = col("ID")
    Seq(
      RowRule("id_prefix", "error",
        Rules.badIdentifier(col("ID"), s"GENIE-$center"), key,
        s"Seg: ID must start with GENIE-$center ({count} rows, e.g. {example})",
        requires = Seq("ID")),
      RowRule("chrom_domain", "error",
        Rules.badChromosome(col("CHROM"), allowChrPrefix = true), key,
        "Seg: CHROM must be 1-22, X, Y, MT ({count} rows, e.g. {example})",
        requires = Seq("CHROM")),
      RowRule("loc_integers", "error",
        Rules.notInteger(col("`LOC.START`")) || Rules.notInteger(col("`LOC.END`")), key,
        "Seg: LOC.START/LOC.END must be integer ({count} rows, e.g. {example})",
        requires = Seq("LOC.START", "LOC.END")),
      RowRule("seg_mean_numeric", "error",
        col("`SEG.MEAN`").isNotNull && col("`SEG.MEAN`").try_cast("double").isNull, key,
        "Seg: SEG.MEAN must be numeric ({count} rows, e.g. {example})",
        requires = Seq("SEG.MEAN")),
      RowRule("no_nulls", "error",
        requiredColumns.map(c => col(s"`$c`").isNull).reduce(_ || _), key,
        "Seg: null values are not allowed ({count} rows, e.g. {example})",
        requires = requiredColumns))
  }

  def validate(seg: DataFrame, center: String): ValidationResult = {
    import graft.rules.Finding
    val missing = requiredColumns.filterNot(seg.columns.map(_.toUpperCase).contains)
    val schemaFindings = missing.map(c =>
      Finding(s"missing_col_$c", "error", 1, None, s"Seg: missing required column $c"))
    if (missing.nonEmpty) ValidationResult(schemaFindings.toSeq)
    else {
      val battery = Rules.Battery.run(seg, rowRules(center))
      // P14: exact duplicate rows
      val dups = seg.count() - seg.dropDuplicates().count()
      ValidationResult(battery.findings :+
        Finding("duplicate_rows", "warning", dups, None, s"Seg: $dups duplicated rows"))
    }
  }
}

/** SV validator: full-row duplicates + sample-id checks + germline drop
  * (structural_variant.py:31-88, database_to_staging.py:862-881).
  */
object SvFormat {

  def validate(sv: DataFrame, center: String): ValidationResult = {
    import graft.rules.Finding
    val idCol = sv.columns.map(_.toUpperCase)
      .find(c => c == "SAMPLE_ID" || c == "SAMPLE_ID_TUMOR").getOrElse("SAMPLE_ID")
    if (!sv.columns.map(_.toUpperCase).contains(idCol))
      return ValidationResult(Seq(Finding("missing_col_SAMPLE_ID", "error", 1, None,
        "SV: missing required column SAMPLE_ID")))
    val battery = Rules.Battery.run(sv, Seq(
      RowRule("sample_id_prefix", "error",
        Rules.badIdentifier(col(idCol), s"GENIE-$center"), col(idCol),
        s"SV: SAMPLE_ID must start with GENIE-$center ({count} rows, e.g. {example})")))
    val dups = sv.count() - sv.dropDuplicates().count()
    ValidationResult(battery.findings :+
      Finding("duplicate_rows", "error", dups, None, s"SV: $dups duplicated rows"))
  }

  /** C13: center extraction from the sample id (split on '-', part 2). */
  def centerOf(c: Column): Column = split(c, "-").getItem(1)
}
