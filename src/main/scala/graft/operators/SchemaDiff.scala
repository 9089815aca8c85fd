package graft.operators

import org.apache.spark.sql.DataFrame

/** Schema-evolution diff between two table versions — the structural
  * half of the reference's constant missing/extra-column handling
  * (process_functions.py:970-999 `create_missing_columns`,
  * clinical.py:780-797 deprecated columns): report what changed before
  * deciding how to coerce.
  *
  * Pure metadata — no job runs; safe to call on 100 TB tables.
  */
object SchemaDiff {

  final case class Change(column: String, kind: String,
                          before: Option[String], after: Option[String])

  /** Changes from `old` to `next`: added / removed / type-changed /
    * nullability-changed columns, by case-sensitive name.
    */
  def diff(old: DataFrame, next: DataFrame): Seq[Change] = {
    val o = old.schema.map(f => f.name -> f).toMap
    val n = next.schema.map(f => f.name -> f).toMap
    val added = (n.keySet -- o.keySet).toSeq.sorted.map(c =>
      Change(c, "added", None, Some(n(c).dataType.simpleString)))
    val removed = (o.keySet -- n.keySet).toSeq.sorted.map(c =>
      Change(c, "removed", Some(o(c).dataType.simpleString), None))
    val changed = (o.keySet & n.keySet).toSeq.sorted.flatMap { c =>
      val (fo, fn) = (o(c), n(c))
      val typeChange =
        if (fo.dataType != fn.dataType)
          Some(Change(c, "type_changed",
            Some(fo.dataType.simpleString), Some(fn.dataType.simpleString)))
        else None
      val nullChange =
        if (fo.nullable != fn.nullable)
          Some(Change(c, "nullability_changed",
            Some(fo.nullable.toString), Some(fn.nullable.toString)))
        else None
      typeChange.toSeq ++ nullChange.toSeq
    }
    added ++ removed ++ changed
  }
}
