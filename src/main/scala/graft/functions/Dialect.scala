package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Snowflake-compat dialect layer — the function surface of SURVEY.md §2.8.
  *
  * Every function the reference transpiles (reference
  * `transpiler.py:81-364`) or declares safe for local execution
  * (`auto_router.py:137-149`) gets a Spark-native `Column` form here,
  * composed from codegen'd built-ins — no UDFs, so every expression stays
  * inside whole-stage codegen and Catalyst can still push/prune/fold.
  *
  * VARIANT representation: JSON text in a `StringType` column — the same
  * lossy-but-portable choice the reference makes when caching Snowflake
  * VARIANT columns locally (`source_cache.py:271-308`, `TO_VARCHAR("col")`).
  * Accessors ([[variantPath]]) use `get_json_object`. Spark 4's native
  * `VariantType` (`parse_json`) remains available to callers who want
  * binary-variant performance; the JSON-string form is what keeps results
  * comparable across engines.
  */
object Dialect {

  // -------------------------------------------------------------- nulls
  /** Snowflake IFF(cond, t, f) — reference transpiler.py:199-209. */
  def iff(cond: Column, t: Column, f: Column): Column = when(cond, t).otherwise(f)

  /** NVL / IFNULL → COALESCE — transpiler.py:181-183, 211-217. */
  def nvl(a: Column, b: Column): Column = coalesce(a, b)

  /** NVL2(e, a, b) — transpiler.py:219-233. */
  def nvl2(e: Column, a: Column, b: Column): Column = when(e.isNotNull, a).otherwise(b)

  /** ZEROIFNULL(x) → COALESCE(x, 0) — transpiler.py:315-324. */
  def zeroifnull(x: Column): Column = coalesce(x, lit(0))

  def nullifzero(x: Column): Column = nullif(x, lit(0))

  // ----------------------------------------------------------- TRY_TO_*
  /** The TRY_TO_* scalar type lattice — reference transpiler.py:246-260.
    * NUMBER/NUMERIC default to Snowflake NUMBER(38,0) semantics; DOUBLE,
    * DECIMAL(p,s), DATE, TIMESTAMP (NTZ/LTZ/TZ all collapse to session
    * timestamp, as the reference's type_map collapses them), BOOLEAN,
    * VARCHAR. */
  def tryToNumber(c: Column): Column = c.try_cast(DecimalType(38, 0))
  def tryToDecimal(c: Column, p: Int = 38, s: Int = 0): Column = c.try_cast(DecimalType(p, s))
  def tryToDouble(c: Column): Column = c.try_cast(DoubleType)
  def tryToDate(c: Column): Column = c.try_cast(DateType)
  def tryToTimestamp(c: Column): Column = c.try_cast(TimestampType)
  def tryToBoolean(c: Column): Column = c.try_cast(BooleanType)
  def tryToVarchar(c: Column): Column = c.try_cast(StringType)

  // ------------------------------------------------------ VARIANT / JSON
  /** OBJECT_CONSTRUCT(k1, v1, ...) → JSON object text — transpiler.py:269-280
    * (JSON_OBJECT target form). Keys must be literal strings (the only form
    * the reference emits). */
  def objectConstruct(pairs: (String, Column)*): Column =
    to_json(struct(pairs.map { case (k, v) => v.as(k) }: _*))

  /** PARSE_JSON(s) under the JSON-string VARIANT repr: validate by
    * round-tripping through Spark's variant parser but keep text form;
    * invalid JSON → null (Snowflake PARSE_JSON errors; TRY_PARSE_JSON
    * nulls — we take the TRY semantics, matching the reference's
    * best-effort local path). */
  def parseJsonText(s: Column): Column =
    when(try_parse_json(s).isNotNull, s)

  /** TO_VARIANT(x) → JSON text of any scalar/struct/array — the
    * `CAST(x AS JSON)` target form of transpiler.py:304-313. Implemented
    * by JSON-encoding a 1-element array and stripping the brackets, which
    * gives correct JSON scalar encoding for every input type with only
    * codegen'd built-ins. */
  def toVariant(x: Column): Column = {
    val arr = to_json(array(x))
    arr.substr(lit(2), length(arr) - 2)
  }

  /** Snowflake `col:a.b` path access (auto_router.py:358-364 — a gap the
    * reference routes to cloud; we close it natively). */
  def variantPath(c: Column, path: String): Column =
    get_json_object(c, "$." + path)

  /** ARRAY_CONSTRUCT(a, b, c) — transpiler.py:294-302. */
  def arrayConstruct(cs: Column*): Column = array(cs: _*)

  // -------------------------------------------------------- aggregation
  /** LISTAGG(c, delim) with deterministic element order — the reference's
    * STRING_AGG target (transpiler.py:187-197). Sorted form keeps results
    * engine-comparable; [[listaggRaw]] is the order-unspecified native
    * built-in. */
  def listaggSorted(c: Column, delim: String): Column =
    array_join(array_sort(collect_list(c)), delim)

  def listaggRaw(c: Column, delim: String): Column = listagg(c, lit(delim))

  // -------------------------------------------------------------- dates
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

  /** Snowflake DATEADD(unit, n, d) — Snowflake argument order (the dialect
    * drift called out in SURVEY.md §7). */
  def dateaddSf(unit: String, n: Column, d: Column): Column =
    timestamp_add(canonUnit(unit), n, d)

  /** Snowflake DATEDIFF(unit, start, end): counts *unit boundaries
    * crossed*, not complete intervals — `datediff(year, Dec 31, Jan 1) = 1`.
    * Spark's `timestampdiff` counts complete intervals, so truncate both
    * sides to the unit first; diffs of truncated values are exact
    * multiples, making the two countings coincide. DuckDB's `date_diff`
    * is boundary-based, so oracles compare directly. */
  def datediffSf(unit: String, start: Column, end: Column): Column = {
    val u = canonUnit(unit)
    u match {
      case "YEAR" => year(end) - year(start)
      case "QUARTER" =>
        (year(end) - year(start)) * 4 + (quarter(end) - quarter(start))
      case "MONTH" =>
        (year(end) - year(start)) * 12 + (month(end) - month(start))
      case "WEEK" =>
        timestamp_diff("WEEK", date_trunc("WEEK", start), date_trunc("WEEK", end))
      case other =>
        timestamp_diff(other, date_trunc(other, start), date_trunc(other, end))
    }
  }

  /** CONVERT_TIMEZONE — 3-arg (from, to, naive ts) and 2-arg (to, ltz ts)
    * forms, as classified by the reference's fallback handler
    * (connections.py:596-607). */
  def convertTimezone(from: String, to: String, ts: Column): Column =
    convert_timezone(lit(from), lit(to), ts)
  def convertTimezone(to: String, ts: Column): Column =
    convert_timezone(lit(to), ts)

  // ------------------------------------------------------------ strings
  /** REGEXP_SUBSTR: null on no-match (Snowflake), vs Spark's
    * `regexp_extract` empty string. */
  def regexpSubstr(c: Column, pattern: String): Column =
    nullif(regexp_extract(c, pattern, 0), lit(""))

  /** SCD2 surrogate id — MD5 over '-'-joined key parts + updated_at, the
    * exact shape of reference snapshot.sql:99-107 (`MD5(CAST(k1 || '-' ||
    * k2 AS VARCHAR) || '-' || CAST(updated_at AS VARCHAR))`). */
  def md5ScdId(updatedAt: Column, keys: Column*): Column =
    md5(concat_ws("-", (keys :+ updatedAt).map(_.cast(StringType)): _*))
}
