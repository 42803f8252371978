package graft

/** Shared `--flag` validation for the measurement mains: an
  * unrecognized flag must fail fast — a typo like `--miror` that is
  * silently dropped falls back to a long, expensive, WRONG default
  * run with no diagnostic. One definition; every flag-parsing main
  * calls it. */
object MainFlags {
  def requireKnown(args: Array[String], known: Set[String]): Unit =
    args.filter(_.startsWith("--")).foreach(f =>
      require(known.contains(f),
        s"unknown flag $f (known: ${known.toSeq.sorted.mkString(", ")})"))

  /** Positional (non-flag) arguments. */
  def positional(args: Array[String]): Array[String] =
    args.filterNot(_.startsWith("--"))
}
