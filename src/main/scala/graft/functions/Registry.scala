package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-name registration of the Snowflake dialect surface, so Snowflake
  * function names resolve directly in `spark.sql` text (the reference
  * instead rewrites them away before execution — transpiler.py:81-364).
  *
  * Spark 4 already ships `nvl, nvl2, ifnull, zeroifnull, nullifzero,
  * listagg, convert_timezone, to_varchar, split_part, try_to_timestamp`
  * as built-ins; this registry adds only the genuinely missing names.
  * Builders construct raw Catalyst expressions (NOT Column-bridge
  * wrappers, which stay unresolved inside SQL analysis), so registered
  * functions codegen exactly like built-ins.
  */
object Registry {

  private def tryCast(x: Expression, dt: DataType): Expression =
    Cast(x, dt, None, EvalMode.TRY)

  private def strLit(e: Expression, fn: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal string argument, got: $other")
  }

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got: $other")
  }

  /** JSON-encode any value: to_json of a 1-element array, brackets
    * stripped — correct JSON scalar encoding from codegen'd built-ins
    * only (the CAST(x AS JSON) form of transpiler.py:304-313). */
  private def toVariantExpr(x: Expression): Expression = {
    val arrJson = StructsToJson(Map.empty[String, String], CreateArray(Seq(x)))
    Substring(arrJson, Literal(2), Subtract(Length(arrJson), Literal(2)))
  }

  /** Snowflake DATEDIFF boundary-crossing semantics (see
    * Dialect.datediffSf). */
  private def datediffExpr(unit: String, a: Expression, b: Expression): Expression =
    unit match {
      case "YEAR" => Subtract(Year(b), Year(a))
      case "QUARTER" => Add(
        Multiply(Subtract(Year(b), Year(a)), Literal(4)),
        Subtract(Quarter(b), Quarter(a)))
      case "MONTH" => Add(
        Multiply(Subtract(Year(b), Year(a)), Literal(12)),
        Subtract(Month(b), Month(a)))
      case u =>
        val fmt = Literal(u)
        TimestampDiff(u, TruncTimestamp(fmt, a), TruncTimestamp(fmt, b))
    }

  private val unitMap: Map[String, String] = {
    val base = Map(
      "year" -> "YEAR", "yy" -> "YEAR", "yyyy" -> "YEAR", "yr" -> "YEAR",
      "quarter" -> "QUARTER", "qtr" -> "QUARTER", "q" -> "QUARTER",
      "month" -> "MONTH", "mm" -> "MONTH", "mon" -> "MONTH",
      "week" -> "WEEK", "wk" -> "WEEK", "w" -> "WEEK",
      "day" -> "DAY", "dd" -> "DAY", "d" -> "DAY",
      "hour" -> "HOUR", "hh" -> "HOUR", "hr" -> "HOUR",
      "minute" -> "MINUTE", "mi" -> "MINUTE", "min" -> "MINUTE",
      "second" -> "SECOND", "ss" -> "SECOND", "sec" -> "SECOND",
      "millisecond" -> "MILLISECOND", "ms" -> "MILLISECOND",
      "microsecond" -> "MICROSECOND", "us" -> "MICROSECOND")
    base ++ base.map { case (k, v) => (k + "s") -> v }
  }

  private def canonUnit(u: String): String =
    unitMap.getOrElse(u.toLowerCase,
      throw new IllegalArgumentException(s"unknown date part: $u"))

  /** Builders for each registered name. */
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "iff" -> { case Seq(p, t, f) => If(p, t, f) },
    "try_to_number" -> {
      case Seq(x) => tryCast(x, DecimalType(38, 0))
      case Seq(x, p, s) => tryCast(x,
        DecimalType(intLit(p, "try_to_number"), intLit(s, "try_to_number")))
    },
    "try_to_numeric" -> {
      case Seq(x) => tryCast(x, DecimalType(38, 0))
      case Seq(x, p, s) => tryCast(x,
        DecimalType(intLit(p, "try_to_numeric"), intLit(s, "try_to_numeric")))
    },
    "try_to_decimal" -> {
      case Seq(x) => tryCast(x, DecimalType(38, 0))
      case Seq(x, p, s) => tryCast(x,
        DecimalType(intLit(p, "try_to_decimal"), intLit(s, "try_to_decimal")))
    },
    "try_to_double" -> { case Seq(x) => tryCast(x, DoubleType) },
    "try_to_date" -> { case Seq(x) => tryCast(x, DateType) },
    "try_to_timestamp_ntz" -> { case Seq(x) => tryCast(x, TimestampNTZType) },
    "try_to_timestamp_ltz" -> { case Seq(x) => tryCast(x, TimestampType) },
    "try_to_timestamp_tz" -> { case Seq(x) => tryCast(x, TimestampType) },
    "try_to_boolean" -> { case Seq(x) => tryCast(x, BooleanType) },
    "try_to_varchar" -> { case Seq(x) => tryCast(x, StringType) },
    "object_construct" -> { exprs =>
      require(exprs.nonEmpty && exprs.length % 2 == 0,
        "object_construct needs key/value pairs")
      StructsToJson(Map.empty[String, String], CreateNamedStruct(exprs))
    },
    "array_construct" -> { exprs => CreateArray(exprs) },
    "to_variant" -> { case Seq(x) => toVariantExpr(x) },
    "regexp_substr" -> { case Seq(x, p) =>
      val ex = RegExpExtract(x, p, Literal(0))
      If(EqualTo(ex, Literal("")), Literal(null, StringType), ex)
    },
    // Snowflake 3-arg date functions (unit first — SURVEY.md §7 dialect
    // drift). Registered under graft_ prefix; SnowflakeSql rewrites
    // DATEADD/DATEDIFF call sites to these so Spark's 2-arg built-ins of
    // the same names stay intact.
    "graft_dateadd" -> { case Seq(u, n, d) =>
      TimestampAdd(canonUnit(strLit(u, "dateadd")), n, d)
    },
    "graft_datediff" -> { case Seq(u, a, b) =>
      datediffExpr(canonUnit(strLit(u, "datediff")), a, b)
    }
  )

  /** Idempotent per-session registration — safe under concurrent first
    * calls (the transpiler corpus analyzes branches in parallel):
    * createOrReplaceTempFunction is idempotent by construction, and the
    * extraOptimizations check-then-append (not atomic on its own —
    * concurrent first calls could double-append JsonPathCse or lose it)
    * is serialized here rather than relying on call-site ordering. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
    Registry.synchronized {
      if (!spark.experimental.extraOptimizations.contains(graft.plans.JsonPathCse))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ graft.plans.JsonPathCse
    }
  }
}
