package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Validation-rule framework (SURVEY §2.2 P1-P30).
  *
  * Reference shape: each check scans the frame and appends to an error /
  * warning string (example_filetype_format.py:223-271). Naive translation
  * would be one Spark action per rule — N scans. Instead every rule
  * contributes a violation predicate (`Column`) plus an example-key
  * expression, and [[Battery.run]] evaluates the whole battery in ONE
  * aggregation pass over the data: `agg(count(when(p,1)), min(when(p,key)))`
  * per rule. At 100 TB that is a single scan with map-side partial
  * aggregation and a 1-row result — no collect of violating rows, no
  * per-rule job.
  */
final case class Finding(rule: String, severity: String, count: Long,
                         example: Option[String], message: String)

final case class ValidationResult(findings: Seq[Finding]) {
  def errors: Seq[Finding]   = findings.filter(f => f.severity == "error" && f.count > 0)
  def warnings: Seq[Finding] = findings.filter(f => f.severity == "warning" && f.count > 0)
  def isValid: Boolean       = errors.isEmpty
}

/** A single row-level rule: rows where `violation` is true are invalid;
  * `exampleKey` identifies an offending row in the error message.
  * `requires` lists columns the rule touches — a battery skips rules
  * whose columns are absent (the reference's P1 existence checks gate
  * the rest of its battery the same way).
  */
final case class RowRule(name: String, severity: String, violation: Column,
                         exampleKey: Column, messageTemplate: String,
                         requires: Seq[String] = Nil) {
  def applicableTo(columns: Seq[String]): Boolean = {
    val have = columns.map(_.toUpperCase).toSet
    requires.forall(c => have.contains(c.toUpperCase))
  }
}

object Rules {

  // ---- predicate builders (the P-library) -------------------------------

  /** P2: value must be in `allowed`; optionally NA-allowed; optionally a
    * `sep`-separated multi-value cell where every part must be allowed.
    */
  def domain(c: Column, allowed: Seq[String], naAllowed: Boolean = false,
             sep: Option[String] = None): Column = {
    val base = sep match {
      case Some(s) => !forall(split(c, java.util.regex.Pattern.quote(s)), v => trim(v).isInCollection(allowed))
      case None    => !c.isInCollection(allowed)
    }
    if (naAllowed) base && c.isNotNull && c =!= "NA" else base && c.isNotNull
  }

  /** P4: integer-parseable string (digits only, optional sign). */
  def notInteger(c: Column): Column =
    c.isNotNull && !c.cast("string").rlike("^-?\\d+$")

  /** P5: GENIE-style identifier: required prefix and max length
    * (process_functions.py:199-222).
    */
  def badIdentifier(c: Column, prefix: String, maxLen: Int = 50): Column =
    c.isNull || !c.startsWith(prefix) || length(c) >= maxLen

  /** P6: 4-digit year ≤ `maxYear`, with allowed sentinel strings. */
  def badYear(c: Column, maxYear: Int, sentinels: Seq[String]): Column =
    c.isNotNull && !c.isInCollection(sentinels) &&
      (!c.rlike("^\\d{4}$") || c.cast("int") > maxYear)

  /** P16: allele regex ^[ATCGN]+$ or all-dashes, case-insensitive
    * (validate.py:426-480).
    */
  def badAllele(c: Column): Column =
    c.isNotNull && !c.rlike("(?i)^([ATCGN]+|-+)$")

  /** P18: chromosome domain 1-22/X/Y/MT after optional chr-prefix strip
    * (validate.py:170-216).
    */
  def badChromosome(c: Column, allowChrPrefix: Boolean = false): Column = {
    val norm    = if (allowChrPrefix) regexp_replace(c, "^chr", "") else c
    val allowed = (1 to 22).map(_.toString) ++ Seq("X", "Y", "MT")
    c.isNull || !norm.isInCollection(allowed)
  }

  /** P19: start must be ≤ end (warning in the reference). */
  def startAfterEnd(start: Column, end: Column): Column =
    start.isNotNull && end.isNotNull && start > end

  /** P27: entirely-empty row. */
  def emptyRow(cols: Seq[Column]): Column =
    cols.map(_.isNull).reduce(_ && _)

  /** C2 (process_functions.py:307-324 `checkGenieId`): reformat an id
    * into the GENIE-{center}- form. "{center}-x" → "GENIE-{center}-x";
    * anything else not already "GENIE-{center}-"-prefixed →
    * "GENIE-{center}-{id}"; correct ids pass through verbatim.
    */
  def checkGenieId(c: Column, center: String): Column =
    when(c.startsWith(s"$center-"), concat(lit("GENIE-"), c))
      .when(!c.startsWith(s"GENIE-$center-"), concat(lit(s"GENIE-$center-"), c))
      .otherwise(c)

  // ---- the single-pass battery ------------------------------------------

  object Battery {
    /** Evaluate all rules in one aggregation over `df`; rules touching
      * absent columns are skipped.
      */
    def run(df: DataFrame, allRules: Seq[RowRule]): ValidationResult =
      runWithExtras(df, allRules, Nil)._1

    /** Battery + caller-supplied extra aggregates (e.g. the MAF P17
      * cross-column bool aggs) in the SAME single scan. The extras
      * arrive back as a name→value map from the one result row.
      */
    def runWithExtras(df: DataFrame, allRules: Seq[RowRule],
                      extras: Seq[Column]): (ValidationResult, Map[String, Any]) = {
      val rules = allRules.filter(_.applicableTo(df.columns.toSeq))
      if (rules.isEmpty && extras.isEmpty) return (ValidationResult(Nil), Map.empty)
      val aggs = rules.zipWithIndex.flatMap { case (r, i) =>
        Seq(
          sum(when(r.violation, 1L).otherwise(0L)).as(s"c$i"),
          min(when(r.violation, r.exampleKey.cast("string"))).as(s"e$i")
        )
      } ++ extras
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val findings = rules.zipWithIndex.map { case (r, i) =>
        val n  = Option(row.getAs[Long](s"c$i")).getOrElse(0L)
        val ex = Option(row.getAs[String](s"e$i"))
        Finding(r.name, r.severity, n, ex,
          r.messageTemplate.replace("{count}", n.toString).replace("{example}", ex.getOrElse("")))
      }
      val extraVals = row.schema.fieldNames.drop(rules.length * 2)
        .map(n => n -> row.getAs[Any](n)).toMap
      (ValidationResult(findings), extraVals)
    }

    /** Battery as a DataFrame (for pipelines that persist findings):
      * one row per rule with count + example, computed in one pass.
      */
    def asDataFrame(df: DataFrame, allRules: Seq[RowRule]): DataFrame = {
      val rules = allRules.filter(_.applicableTo(df.columns.toSeq))
      if (rules.isEmpty)
        return df.limit(0).select(
          lit("").as("rule"), lit("").as("severity"),
          lit(0L).as("n_violations"), lit(null).cast("string").as("example"))
      val perRule = rules.map { r =>
        struct(
          lit(r.name).as("rule"), lit(r.severity).as("severity"),
          sum(when(r.violation, 1L).otherwise(0L)).as("n_violations"),
          min(when(r.violation, r.exampleKey.cast("string"))).as("example")
        )
      }
      df.agg(array(perRule: _*).as("f"))
        .select(explode(col("f")).as("f"))
        .select(col("f.rule"), col("f.severity"), col("f.n_violations"), col("f.example"))
    }
  }
}
