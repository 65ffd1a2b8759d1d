package graft.planner

/** Engine-error classification for fallback-on-error — port of the
  * reference's `_is_duckdb_incompatibility` + `_fallback_to_snowflake`
  * (reference `connections.py:334-371, 538-585`): errors that mean "this
  * engine cannot run this SQL" trigger re-execution on the other venue;
  * anything else re-raises. The reference's three incompatibility
  * classes (missing function, VARIANT unsupported, not-implemented) are
  * kept, plus the two classes the judge of local execution actually
  * sees: parse errors and memory exhaustion (retried degraded —
  * codegen off — rather than re-venued, since OOM is a capacity issue,
  * not a capability one).
  */
object ErrorClassifier {

  /** What to do after a classified failure. */
  sealed trait Policy
  /** Re-execute flagged CLOUD (the reference's Snowflake fallback). */
  case object FallbackCloud extends Policy
  /** Retry locally with whole-stage codegen disabled. */
  case object RetryDegraded extends Policy

  final case class ErrorClass(name: String, reason: String, policy: Policy)

  val MissingFunction: ErrorClass = ErrorClass("function_missing",
    "Function does not exist on local engine", FallbackCloud)
  val VariantUnsupported: ErrorClass = ErrorClass("variant_unsupported",
    "VARIANT type not supported locally", FallbackCloud)
  val NotImplemented: ErrorClass = ErrorClass("not_implemented",
    "Feature not implemented on local engine", FallbackCloud)
  val ParseError: ErrorClass = ErrorClass("parse_error",
    "SQL failed to parse locally", FallbackCloud)
  val OutOfMemory: ErrorClass = ErrorClass("out_of_memory",
    "Local execution exhausted memory", RetryDegraded)
  /** The reference loads engine extensions lazily and a missing one
    * (iceberg/httpfs INSTALL failure, connections.py:908-914,1007-1008)
    * makes the local engine incapable of the query; Spark's analogs are
    * a missing data-source provider or catalog plugin. Capability gap →
    * re-venue, like MissingFunction. */
  val ExtensionMissing: ErrorClass = ErrorClass("extension_missing",
    "Data source / catalog plugin not available locally", FallbackCloud)

  /** Classify like `_is_duckdb_incompatibility` (connections.py:352-371):
    * None means "not an engine-incompatibility — re-raise". */
  def classify(e: Throwable): Option[ErrorClass] = {
    val msg = Option(e.getMessage).getOrElse("")
    val upper = msg.toUpperCase
    e match {
      case _: OutOfMemoryError => Some(OutOfMemory)
      case _ if upper.contains("OUTOFMEMORY") ||
        upper.contains("NOT ENOUGH MEMORY") => Some(OutOfMemory)
      case _: org.apache.spark.sql.catalyst.parser.ParseException =>
        Some(ParseError)
      // function not found: Spark's UNRESOLVED_ROUTINE or the
      // reference's "Function <name> does not exist" wording. The name
      // must sit BETWEEN the words — "Path does not exist: .../my_function"
      // is a storage error, not a capability gap, and re-running it on
      // another venue is guaranteed futile.
      case _ if upper.contains("UNRESOLVED_ROUTINE") ||
        "(?i)function\\s+\\S+\\s+does not exist".r.findFirstIn(msg).isDefined =>
        Some(MissingFunction)
      case _ if upper.contains("VARIANT") &&
        (msg.contains("Not implemented") || msg.contains("cannot be created")
          || upper.contains("UNSUPPORTED")) => Some(VariantUnsupported)
      // missing data source / catalog plugin — the Spark shapes of the
      // reference's failed extension INSTALL. "Table … does not exist"
      // deliberately stays unclassified (reference truth table,
      // tests/test_variant_handling.py:37-39): a missing TABLE exists
      // nowhere else either, so a re-venue is futile.
      case _ if upper.contains("DATA_SOURCE_NOT_FOUND") ||
        msg.contains("Failed to find data source") ||
        msg.contains("Failed to find the data source") ||
        "(?i)catalog\\s+'\\S+'\\s+plugin class not found".r
          .findFirstIn(msg).isDefined => Some(ExtensionMissing)
      case _: UnsupportedOperationException => Some(NotImplemented)
      case _ if msg.contains("Not implemented") => Some(NotImplemented)
      case _ => None
    }
  }
}
