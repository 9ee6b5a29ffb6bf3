package graft.tools

/** One-off: print our JW scores for the f3 pair matrix (DuckDB parity probe). */
object JwCompare {
  def main(args: Array[String]): Unit = {
    val cols = Seq("subjid", "aeseq", "aeterm", "nationcd")
    val vars = Seq("usubjid", "aeseq", "aeterm", "aedecod")
    for (c <- cols; v <- vars)
      println(f"$c%-10s $v%-10s ours=${graft.functions.JaroWinkler.similarity(c, v)}%.6f")
  }
}
