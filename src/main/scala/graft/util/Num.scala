package graft.util

/** Numeric-literal helpers shared by the oracle-twin builders. */
object Num {
  /** A binary64 rendered with 17 significant digits — the guaranteed
    * round-trip width — under Locale.ROOT, so the string is a valid SQL
    * literal in BOTH engines regardless of the JVM's default locale
    * (comma-decimal locales like de_DE would otherwise emit "3,09…",
    * which parses in neither Spark SQL nor DuckDB).
    */
  def lit17(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.17g", Double.box(d))
}
