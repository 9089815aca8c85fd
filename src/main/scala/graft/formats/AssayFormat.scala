package graft.formats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.rules.{RowRule, Rules, ValidationResult}

/** Assay-information validator (SURVEY §2.2 P23; reference
  * assay.py:131-381). GDC enumerations are snapshot here as config —
  * the reference fetches them from the GDC REST dictionary
  * (process_functions.py:808-826); zero-egress engines pin them.
  */
object AssayFormat {

  val librarySelection: Seq[String] = Seq(
    "Hybrid Selection", "PCR", "Affinity Enrichment", "Poly-T Enrichment", "Random")
  val libraryStrategy: Seq[String] = Seq("Targeted Sequencing", "WXS")
  val platform: Seq[String]        = Seq("Illumina", "SOLID", "LS454", "Ion Torrent", "Complete Genomics", "PacBio")
  val alterationTypes: Seq[String] = Seq(
    "snv", "small_indels", "gene_level_cna", "intragenic_cna", "structural_variants")
  val preservation: Seq[String]    = Seq("FFPE", "fresh_frozen")
  val coverage: Seq[String]        = Seq("hotspot_regions", "coding_exons", "introns", "promoters")

  def rowRules(center: String): Seq[RowRule] = {
    val key = col("SEQ_ASSAY_ID")
    def multiDomain(c: String, allowed: Seq[String]) =
      col(c).isNotNull && !forall(col(c), v => v.isInCollection(allowed))
    Seq(
      RowRule("seq_assay_id_prefix", "error",
        !coalesce(upper(col("SEQ_ASSAY_ID")).startsWith(center.toUpperCase), lit(false)), key,
        s"Assay: SEQ_ASSAY_ID must start with $center ({count} rows, e.g. {example})",
        requires = Seq("SEQ_ASSAY_ID")),
      RowRule("library_selection", "error",
        Rules.domain(col("LIBRARY_SELECTION"), librarySelection), key,
        "Assay: LIBRARY_SELECTION not in GDC enumeration ({count} rows, e.g. {example})",
        requires = Seq("LIBRARY_SELECTION")),
      RowRule("library_strategy", "error",
        Rules.domain(col("LIBRARY_STRATEGY"), libraryStrategy), key,
        "Assay: LIBRARY_STRATEGY not in GDC enumeration ({count} rows, e.g. {example})",
        requires = Seq("LIBRARY_STRATEGY")),
      RowRule("platform", "error",
        Rules.domain(col("PLATFORM"), platform), key,
        "Assay: PLATFORM not in GDC enumeration ({count} rows, e.g. {example})",
        requires = Seq("PLATFORM")),
      RowRule("read_length_int", "error",
        col("READ_LENGTH").isNotNull && col("READ_LENGTH").try_cast("int").isNull, key,
        "Assay: READ_LENGTH must be an integer ({count} rows, e.g. {example})",
        requires = Seq("READ_LENGTH")),
      RowRule("number_of_genes_int", "error",
        col("NUMBER_OF_GENES").isNotNull && col("NUMBER_OF_GENES").try_cast("int").isNull, key,
        "Assay: NUMBER_OF_GENES must be an integer ({count} rows, e.g. {example})",
        requires = Seq("NUMBER_OF_GENES")),
      RowRule("cellularity_format", "error",
        col("SPECIMEN_TUMOR_CELLULARITY").isNotNull &&
          !col("SPECIMEN_TUMOR_CELLULARITY").rlike("^>\\d+%$"), key,
        "Assay: SPECIMEN_TUMOR_CELLULARITY must look like >NN% ({count} rows, e.g. {example})",
        requires = Seq("SPECIMEN_TUMOR_CELLULARITY")),
      RowRule("alteration_types", "error",
        multiDomain("ALTERATION_TYPES", alterationTypes), key,
        "Assay: ALTERATION_TYPES outside allowed set ({count} rows, e.g. {example})",
        requires = Seq("ALTERATION_TYPES")),
      RowRule("preservation_technique", "error",
        multiDomain("PRESERVATION_TECHNIQUE", preservation), key,
        "Assay: PRESERVATION_TECHNIQUE outside allowed set ({count} rows, e.g. {example})",
        requires = Seq("PRESERVATION_TECHNIQUE")),
      RowRule("coverage", "error",
        multiDomain("COVERAGE", coverage), key,
        "Assay: COVERAGE outside allowed set ({count} rows, e.g. {example})",
        requires = Seq("COVERAGE")))
  }

  def validate(assay: DataFrame, center: String): ValidationResult =
    Rules.Battery.run(assay, rowRules(center))

  /** P25 (assay.py:383-427): every SEQ_ASSAY_ID the clinical DB knows
    * must appear in the assay file.
    */
  def missingAssayIds(assay: DataFrame, clinicalDb: DataFrame): DataFrame =
    clinicalDb.select(upper(col("SEQ_ASSAY_ID")).as("SEQ_ASSAY_ID")).distinct()
      .join(assay.select(upper(col("SEQ_ASSAY_ID")).as("SEQ_ASSAY_ID")).distinct(),
        Seq("SEQ_ASSAY_ID"), "left_anti")
}
