package graft.apps

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Per-center invalid-reasons report sink (reference
  * genie/write_invalid_reasons.py:14-60): every failed upload's errors
  * flow into one `{center}_validation_errors.txt` per center. Each
  * invalid file becomes a `\t<name>:\n\n<errors>\n\n` section (the
  * reference's `|` error separators arrive here already split, :64);
  * centers with no invalid files get the literal "No errors!".
  *
  * The aggregation feeding this (ProcessJob.RunResult.errors) is
  * distributed; the report itself is a driver-side emit of a few KB per
  * center, like every cBioPortal text artifact.
  */
object InvalidReasons {

  /** write_invalid_reasons.py:58-67 `_combine_center_file_errors`. */
  def combine(fileErrors: Seq[(String, Seq[String])]): String =
    if (fileErrors.isEmpty) "No errors!"
    else fileErrors.map { case (name, errs) =>
      s"\t$name:\n\n${errs.mkString("\n")}\n\n"
    }.mkString

  /** One report per center (write_invalid_reasons.py:14-46); returns the
    * written paths in center order.
    */
  def write(centerErrors: Map[String, Seq[(String, Seq[String])]],
            outDir: String): Seq[String] = {
    Files.createDirectories(Paths.get(outDir))
    centerErrors.toSeq.sortBy(_._1).map { case (center, fe) =>
      val f = s"$outDir/${center}_validation_errors.txt"
      Files.write(Paths.get(f), combine(fe).getBytes(StandardCharsets.UTF_8))
      f
    }
  }
}
