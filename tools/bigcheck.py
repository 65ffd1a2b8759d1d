#!/usr/bin/env python3
"""Scalable differential for row-giant queries (developer tooling).

Same verdict semantics as tools/check.py (sorted column names, row
count, order-insensitive content compare over canonicalized values) but
the canonicalization and hashing run INSIDE DuckDB on both sides, so a
150 M-row result diffs in C++ on all cores instead of a Python row
loop. The Spark result parquet and the oracle query are both read by
the SAME DuckDB session and canonicalized by the SAME SQL expressions,
so any engine-specific rendering cancels out: two sides hash equal iff
their multisets of canonical row strings are equal (64-bit sum-of-hash
multiset digest + exact count; collisions are 2^-64-improbable and
non-adversarial here).

Usage: bigcheck.py <sfDir> <verifyOutDir> [names-csv] [artifact.json]

Artifact (optional 4th arg) is written in the driver CORRECTNESS format
so batches can merge into CORRECTNESS_sf*.json.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_expr(col, typ):
    """SQL canonicalization mirroring check.py's canon(): one string per
    value, NULL marker, shortest-consistent float text (both sides go
    through the same printf, so equality of the text is equality of the
    doubles), naive-UTC timestamps, 'true'/'false' booleans. Nested
    types render via DuckDB's own ::VARCHAR — identical on both sides
    by construction."""
    t = typ.upper()
    q = f'"{col}"'
    if t in ("DOUBLE", "FLOAT", "REAL"):
        v = f"printf('%.17g', {q}::DOUBLE)"
    elif t.startswith("TIMESTAMP"):
        # TimeZone is pinned UTC: TIMESTAMPTZ::TIMESTAMP = naive UTC
        v = f"strftime({q}::TIMESTAMP, '%Y-%m-%d %H:%M:%S.%f')"
    elif t == "BOOLEAN":
        v = f"CASE WHEN {q} THEN 'true' ELSE 'false' END"
    else:
        v = f"{q}::VARCHAR"
    return f"COALESCE({v}, chr(1))"  # chr(1) = unambiguous NULL marker


def norm_type(t):
    """Benign-equivalence map matching check.py's norm_type: timestamp
    unit/tz collapse; the rest compare as-is (class splits flag)."""
    t = t.lower()
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "json":
        # Arrow (check.py's fetch path) has no JSON type — DuckDB JSON
        # exports as string there, so the classes are driver-equal
        return "varchar"
    return t


def digest(con, view, cols_types):
    order = sorted(cols_types, key=lambda ct: ct[0].lower())
    parts = ", ".join(canon_expr(c, t) for c, t in order)
    row = f"concat_ws(chr(2), {parts})"
    n, h = con.execute(
        f"SELECT count(*), COALESCE(sum(hash({row})::HUGEINT), 0) "
        f"FROM {view}").fetchone()
    return n, h


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 and sys.argv[3] else None
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    import os
    con.execute(f"SET memory_limit='{os.environ.get('BIGCHECK_MEM', '60GB')}'")
    # fewer threads = fewer concurrent operator hash tables: the lever
    # when a query's working set exceeds memory_limit + free disk at
    # full parallelism (t_keywords' 2.7 B (doc,term) aggregate, r14)
    if os.environ.get("BIGCHECK_THREADS"):
        con.execute(f"SET threads={int(os.environ['BIGCHECK_THREADS'])}")
    # an in-memory duckdb has NO temp dir and therefore cannot spill —
    # a 1 B-row window digest then dies with 'Failed to allocate'
    # instead of going out-of-core (e_top_event, round 12)
    tmp = os.environ.get("BIGCHECK_TMP", "/root/repo/.tmp/duckdb")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if not p.exists():
            # subset sf dirs (the fifth-decade probe generates only
            # documents/embeddings/events) — a query whose oracle needs
            # a missing table SETUP-FAILs individually instead of the
            # whole run aborting here
            continue
        pat = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    results = {}
    names = sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir())
    if only:
        names = [n for n in names if n in only]
    import time
    for name in names:
        print(f"[bigcheck] {name} start {time.strftime('%H:%M:%S')}",
              file=sys.stderr, flush=True)
        marker = Path(out_dir, name, "_VERIFY_FAILED")
        if marker.exists():
            results[name] = f"VERIFY-FAIL {marker.read_text()[:200]}"
            continue
        if name not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchone()[0]
            results[name] = f"rows-only rows={n}"
            continue
        try:
            con.execute(
                f"CREATE OR REPLACE VIEW __s AS "
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            con.execute(f"CREATE OR REPLACE VIEW __o AS {oracle[name]}")
            sct = con.execute("DESCRIBE __s").fetchall()
            oct_ = con.execute("DESCRIBE __o").fetchall()
            scols = {r[0].lower(): r[1] for r in sct}
            ocols = {r[0].lower(): r[1] for r in oct_}
        except Exception as e:
            results[name] = f"SETUP-FAIL {str(e)[:200]}"
            continue
        if sorted(scols) != sorted(ocols):
            results[name] = (f"SCHEMA-MISMATCH spark={sorted(scols)} "
                             f"oracle={sorted(ocols)}")
            continue
        tdiffs = [f"{c}: spark={norm_type(scols[c])} oracle={norm_type(ocols[c])}"
                  for c in sorted(scols)
                  if norm_type(scols[c]) != norm_type(ocols[c])]
        if tdiffs:
            results[name] = "TYPE-WEAK " + " ;; ".join(tdiffs)[:300]
            continue
        try:
            sn, sh = digest(con, "__s", [(r[0], r[1]) for r in sct])
            on_, oh = digest(con, "__o", [(r[0], r[1]) for r in oct_])
        except Exception as e:
            results[name] = f"DIGEST-FAIL {str(e)[:200]}"
            continue
        if sn != on_:
            results[name] = f"ROWCOUNT-MISMATCH spark={sn} oracle={on_}"
        elif sh != oh:
            results[name] = f"HASH-MISMATCH digests spark={sh} oracle={oh}"
        else:
            results[name] = f"OK rows={sn}"
    if len(sys.argv) > 4:
        # Encode only what each verdict actually established; None means
        # "never compared" (e.g. SETUP-FAIL before the schema check), so
        # merged CORRECTNESS files can't overstate coverage.
        art = {}
        for k, v in results.items():
            try:
                rows = int(v.split("rows=")[1]) if "rows=" in v else None
            except ValueError:
                rows = None
            if v.startswith("rows-only"):
                art[k] = {"oracle_present": False, "rows_match": None,
                          "schema_match": None, "hash_match": None,
                          "spark_rows": rows, "oracle_rows": None, "err": None}
                continue
            rec = {"oracle_present": True, "rows_match": None,
                   "schema_match": None, "hash_match": None,
                   "spark_rows": None, "oracle_rows": None,
                   "err": None if v.startswith("OK") else v[:200]}
            if v.startswith("OK"):
                rec.update(rows_match=True, schema_match=True,
                           hash_match=True, spark_rows=rows,
                           oracle_rows=rows)
            elif v.startswith("HASH-MISMATCH"):
                # schema + row counts were compared and matched before
                # the digest step; only the digest differed
                rec.update(rows_match=True, schema_match=True,
                           hash_match=False)
            elif v.startswith("ROWCOUNT-MISMATCH"):
                try:
                    rec["spark_rows"] = int(v.split("spark=")[1].split()[0])
                    rec["oracle_rows"] = int(v.split("oracle=")[1].split()[0])
                except (ValueError, IndexError):
                    pass
                rec.update(rows_match=False, schema_match=True,
                           hash_match=False)
            elif v.startswith(("SCHEMA-MISMATCH", "TYPE-WEAK")):
                rec["schema_match"] = False
            # SETUP-FAIL / DIGEST-FAIL / VERIFY-FAIL: nothing established
            art[k] = rec
        Path(sys.argv[4]).write_text(json.dumps(art, indent=2, sort_keys=True))
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_ro = sum(1 for v in results.values() if v.startswith("rows-only"))
    for k in sorted(results):
        print(f"{k:28s} {results[k]}")
    print(f"\n{n_ok} OK, {n_ro} rows-only, "
          f"{len(results) - n_ok - n_ro} FAIL of {len(results)}")
    sys.exit(0 if n_ok + n_ro == len(results) else 1)


if __name__ == "__main__":
    main()
