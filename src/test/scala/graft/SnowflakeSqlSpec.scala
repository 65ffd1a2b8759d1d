package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.transpile.SnowflakeSql.transpile

/** Transpiler behavioral table — mirrors the reference's transpiler tests
  * (reference tests/test_transpiler.py:15-168): assert properties of the
  * rewritten SQL text. */
class SnowflakeSqlSpec extends AnyFunSuite {

  test("FLATTEN with input => becomes POSEXPLODE lateral view") {
    val out = transpile(
      "SELECT t.id, f.value FROM t, LATERAL FLATTEN(input => t.arr) f")
    assert(out.contains("LATERAL VIEW POSEXPLODE(t.arr) f AS index, value"))
    assert(!out.toLowerCase.contains("flatten"))
  }

  test("TABLE(FLATTEN(...)) positional form") {
    val out = transpile("SELECT f.value FROM t, TABLE(FLATTEN(t.arr)) AS f")
    assert(out.contains("POSEXPLODE(t.arr) f AS index, value"))
    assert(!out.contains("TABLE("))
  }

  test("CAST AS VARIANT / ::VARIANT / nested parens") {
    assert(transpile("SELECT CAST(x AS VARIANT) FROM t")
      .contains("to_variant(x )"))
    assert(transpile("SELECT x::VARIANT FROM t").contains("to_variant(x)"))
    assert(transpile("SELECT CAST(f(a, b) AS VARIANT) FROM t")
      .contains("to_variant(f(a, b) )"))
  }

  test("colon paths rewrite; string literals survive") {
    val out = transpile("SELECT 'a:b', data:customer.name FROM events")
    assert(out.contains("get_json_object(data, '$.customer.name')"))
    assert(out.contains("'a:b'"))
  }

  test("colon path with ::type cast keeps the cast") {
    val out = transpile("SELECT data:k::int FROM events")
    assert(out.contains("get_json_object(data, '$.k')::int"))
  }

  test("Snowflake 3-arg date fns rewrite; Spark 2-arg forms untouched") {
    assert(transpile("SELECT DATEADD(day, 1, d) FROM t")
      .contains("graft_dateadd('day',"))
    assert(transpile("SELECT DATEDIFF('month', a, b) FROM t")
      .contains("graft_datediff('month',"))
    val untouched = "SELECT dateadd(start_dt, 5) FROM t"
    assert(transpile(untouched) == untouched)
    // bare single-letter units stay untouched too (likely a column name)
    val bare = "SELECT dateadd(d, 5) FROM t"
    assert(transpile(bare) == bare)
    // ... but quoted single-letter units rewrite
    assert(transpile("SELECT dateadd('d', 1, x) FROM t")
      .contains("graft_dateadd('d',"))
  }

  test("empty and non-Snowflake SQL pass through unchanged") {
    assert(transpile("") == "")
    val plain = "SELECT a, b FROM t WHERE a > 1 GROUP BY a, b"
    assert(transpile(plain) == plain)
  }

  test("QUALIFY split hoists inline window expressions") {
    val Some((inner, pred, hoisted, tail)) = graft.transpile.SnowflakeSql
      .splitQualify(
        "SELECT id FROM t QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY id) = 1")
    assert(inner.contains("ROW_NUMBER() OVER (PARTITION BY g ORDER BY id) AS __qualify_0"))
    assert(pred.trim == "__qualify_0 = 1")
    assert(hoisted == Seq("__qualify_0"))
    assert(tail.trim.isEmpty)
  }

  test("QUALIFY referencing an alias needs no hoisting") {
    val Some((inner, pred, hoisted, tail)) = graft.transpile.SnowflakeSql
      .splitQualify("SELECT id, RANK() OVER (ORDER BY id) AS r FROM t QUALIFY r <= 5")
    assert(hoisted.isEmpty)
    assert(pred.trim == "r <= 5")
    assert(inner.trim.endsWith("FROM t"))
    assert(tail.trim.isEmpty)
  }

  test("QUALIFY keeps trailing ORDER BY / LIMIT as a post-filter tail") {
    val Some((_, pred, _, tail)) = graft.transpile.SnowflakeSql
      .splitQualify("SELECT id FROM t QUALIFY ROW_NUMBER() OVER " +
        "(ORDER BY id) = 1 ORDER BY id DESC LIMIT 3")
    assert(pred.trim == "__qualify_0 = 1")
    assert(tail.trim.toLowerCase.startsWith("order by"))
    assert(tail.toLowerCase.contains("limit 3"))
  }
}
