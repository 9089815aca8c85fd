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
    // message helper: check_col_and_values shape, lowercase column names,
    // "Assay_information.yaml" filename — verbatim (process_functions
    // .py:692-705, assay.py:144-148)
    def domainMsg(c: String, vals: Seq[String]) =
      s"Assay_information.yaml: Please double check your ${c.toLowerCase} " +
        s"column.  This column must only be these values: ${vals.mkString(", ")}"
    Seq(
      RowRule("seq_assay_id_prefix", "error",
        // reference normalizes _→- and upper-cases before the prefix test
        !coalesce(upper(regexp_replace(col("SEQ_ASSAY_ID"), "_", "-"))
          .startsWith(center.toUpperCase), lit(false)), key,
        "Assay_information.yaml: Please make sure all your SEQ_ASSAY_IDs " +
          "start with your center abbreviation.",
        requires = Seq("SEQ_ASSAY_ID")),
      RowRule("library_selection", "error",
        Rules.domain(col("LIBRARY_SELECTION"), librarySelection), key,
        domainMsg("LIBRARY_SELECTION", librarySelection),
        requires = Seq("LIBRARY_SELECTION")),
      RowRule("library_strategy", "error",
        Rules.domain(col("LIBRARY_STRATEGY"), libraryStrategy), key,
        domainMsg("LIBRARY_STRATEGY", libraryStrategy),
        requires = Seq("LIBRARY_STRATEGY")),
      RowRule("platform", "error",
        Rules.domain(col("PLATFORM"), platform), key,
        domainMsg("PLATFORM", platform),
        requires = Seq("PLATFORM")),
      RowRule("read_length_int", "error",
        col("READ_LENGTH").isNotNull && col("READ_LENGTH").try_cast("int").isNull, key,
        "Assay_information.yaml: Please double check your read_length.  " +
          "It must be an integer or null.",
        requires = Seq("READ_LENGTH")),
      RowRule("number_of_genes_int", "error",
        col("NUMBER_OF_GENES").isNotNull && col("NUMBER_OF_GENES").try_cast("int").isNull, key,
        "Assay_information.yaml: Please double check your number_of_genes. " +
          "It must be an integer.",
        requires = Seq("NUMBER_OF_GENES")),
      RowRule("cellularity_format", "error",
        col("SPECIMEN_TUMOR_CELLULARITY").isNotNull &&
          !col("SPECIMEN_TUMOR_CELLULARITY").rlike("^>\\d+%$"), key,
        "Assay_information.yaml: Please double check your " +
          "specimen_tumor_cellularity. It must in this format >(num)%. ie. >10%",
        requires = Seq("SPECIMEN_TUMOR_CELLULARITY")),
      RowRule("alteration_types", "error",
        multiDomain("ALTERATION_TYPES", alterationTypes), key,
        domainMsg("ALTERATION_TYPES", alterationTypes),
        requires = Seq("ALTERATION_TYPES")),
      RowRule("preservation_technique", "error",
        multiDomain("PRESERVATION_TECHNIQUE", preservation), key,
        domainMsg("PRESERVATION_TECHNIQUE", preservation),
        requires = Seq("PRESERVATION_TECHNIQUE")),
      RowRule("coverage", "error",
        multiDomain("COVERAGE", coverage), key,
        domainMsg("COVERAGE", coverage),
        requires = Seq("COVERAGE")))
  }

  def validate(assay: DataFrame, center: String): ValidationResult =
    Rules.Battery.run(assay, rowRules(center))

  /** P25 (assay.py:383-427): every SEQ_ASSAY_ID the clinical DB knows
    * must appear in the assay file.
    */
  /** Ids compare after the reference's `_`→`-` + upper normalization
    * (assay.py:140-143, 415-420); the db's ORIGINAL strings come back.
    */
  def missingAssayIds(assay: DataFrame, clinicalDb: DataFrame): DataFrame = {
    def norm(c: org.apache.spark.sql.Column) = upper(regexp_replace(c, "_", "-"))
    clinicalDb.select(col("SEQ_ASSAY_ID")).distinct()
      .join(broadcast(assay.select(norm(col("SEQ_ASSAY_ID")).as("__n")).distinct()),
        norm(col("SEQ_ASSAY_ID")) === col("__n"), "left_anti")
  }
}
