#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, and compares: column names (sorted), row count, and a hash
of all values with columns sorted by name and rows sorted.

NOT part of the shipped library — developer tooling only.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    import datetime
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        # normalize tz-aware datetimes to naive UTC so an Arrow-side tz
        # annotation (vs DuckDB's naive TIMESTAMP) can't split the hash
        # (datetime only: a tz-aware datetime.time has tzinfo but no
        # astimezone, and must not crash the whole gate run)
        v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def table_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return lines


def norm_type(t):
    """Normalize benign Arrow type spellings so only driver-visible
    divergences flag: large_string==string, dictionary unwrapped,
    timestamps collapsed to the bare type CLASS (unit AND tz annotation
    ignored — Spark INT96 reads as ns-naive vs DuckDB's us, and six
    rounds of driver rows prove the canon is unit-agnostic there; a
    date-vs-timestamp class split still flags)."""
    import pyarrow as pa
    if pa.types.is_dictionary(t):
        t = t.value_type
    if pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        # unit and tz annotation are driver-invisible: Spark writes
        # INT96 (pyarrow: ns, no tz) vs DuckDB's us, both as_py to
        # unit-agnostic datetimes, and 6 rounds of driver rows prove the
        # canon doesn't split there — only the TYPE CLASS must match
        return "timestamp"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{norm_type(t.value_type)}>"
    return str(t)


def type_diffs(scols, stypes, ocols, otypes):
    """Per-column Arrow type comparison (by lower-cased name). Returns
    the list of columns whose normalized types differ — e.g. DuckDB's
    uncast SUM(int) exporting decimal128(38,0) against Spark's int64,
    which the driver canon splits on even when values stringify equal."""
    smap = dict(zip(scols, stypes))
    omap = dict(zip(ocols, otypes))
    out = []
    for c in sorted(set(smap) & set(omap)):
        a, b = norm_type(smap[c]), norm_type(omap[c])
        if a != b:
            out.append(f"{c}: spark={a} oracle={b}")
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        # driver testdata is a single file; GenScale output is a
        # Spark-written directory of part files. Partial GenScale dirs
        # (e.g. sf10 regenerated with orders only) register what exists;
        # an oracle touching a missing table fails ITS query, not the run
        if not p.exists():
            continue
        pat = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    results = {}
    names = sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir())
    for name in names:
        marker = Path(out_dir, name, "_VERIFY_FAILED")
        if marker.exists():
            results[name] = f"VERIFY-FAIL {marker.read_text()[:200]}"
            continue
        try:
            tbl = pads.dataset(str(Path(out_dir, name))).to_table()
            scols = [c.lower() for c in tbl.column_names]
            stypes = [f.type for f in tbl.schema]
            srows = [tuple(col[i].as_py() for col in tbl.columns)
                     for i in range(tbl.num_rows)]
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only rows={len(srows)}"
            continue
        try:
            # fetch via Arrow so oracle result TYPES are visible: the
            # driver canon splits on e.g. HUGEINT→decimal128(38,0) vs
            # int64 even when fetchall() values stringify identically
            otbl = con.execute(oracle[name]).fetch_arrow_table()
            ocols = [c.lower() for c in otbl.column_names]
            otypes = [f.type for f in otbl.schema]
            orows = [tuple(col[i].as_py() for col in otbl.columns)
                     for i in range(otbl.num_rows)]
        except Exception as e:
            results[name] = f"ORACLE-FAIL {str(e)[:200]}"
            continue
        if sorted(scols) != sorted(ocols):
            results[name] = f"SCHEMA-MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}"
            continue
        tdiffs = type_diffs(scols, stypes, ocols, otypes)
        if tdiffs:
            results[name] = "TYPE-WEAK " + " ;; ".join(tdiffs)[:300]
            continue
        if len(srows) != len(orows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(srows)} oracle={len(orows)}"
            continue
        sk = table_key(scols, srows)
        ok = table_key(ocols, orows)
        if sk == ok:
            results[name] = f"OK rows={len(srows)}"
        else:
            diffs = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
            results[name] = "HASH-MISMATCH " + " ;; ".join(
                f"spark[{a[:160]}] oracle[{b[:160]}]" for a, b in diffs)
    if len(sys.argv) > 3:  # optional: driver-format JSON artifact
        art = {}
        for k, v in results.items():
            ok = v.startswith("OK")
            try:  # free-text failure messages may embed "rows="
                rows = int(v.split("rows=")[1]) if "rows=" in v else None
            except ValueError:
                rows = None
            if v.startswith("rows-only"):
                # no oracle — nothing was compared; distinct from a real
                # mismatch: oracle_present=False, matches None, no err
                art[k] = {"oracle_present": False,
                          "rows_match": None, "schema_match": None,
                          "hash_match": None,
                          "spark_rows": rows, "oracle_rows": None,
                          "err": None}
                continue
            art[k] = {"oracle_present": True,
                      "rows_match": ok or v.startswith("HASH"),
                      "schema_match": ok or not v.startswith("SCHEMA"),
                      "hash_match": ok,
                      "spark_rows": rows, "oracle_rows": rows,
                      "err": None if ok else v[:200]}
        Path(sys.argv[3]).write_text(json.dumps(art, indent=2, sort_keys=True))
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_ro = sum(1 for v in results.values() if v.startswith("rows-only"))
    for k in sorted(results):
        print(f"{k:28s} {results[k]}")
    print(f"\n{n_ok} OK, {n_ro} rows-only, "
          f"{len(results) - n_ok - n_ro} FAIL of {len(results)}")
    sys.exit(0 if n_ok + n_ro == len(results) else 1)


if __name__ == "__main__":
    main()
