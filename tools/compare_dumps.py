#!/usr/bin/env python3
"""Compare two graft.Verify output dirs query-by-query (Spark vs Spark).

Usage: python3 tools/compare_dumps.py <dirA> <dirB>

Used for same-engine invariance legs (e.g. the 8 g spill regime vs the
24 g no-spill regime at sf10): for every query dir present in BOTH
dumps, the canonicalized sorted rows must be identical. Cheaper than a
second DuckDB differential when dirA is already oracle-verified.

NOT part of the shipped library — developer tooling only.
"""
import sys
from pathlib import Path

import pyarrow.dataset as pads

sys.path.insert(0, str(Path(__file__).parent))
from check import canon, table_key  # noqa: E402


def load(d):
    tbl = pads.dataset(str(d)).to_table()
    cols = [c.lower() for c in tbl.column_names]
    rows = [tuple(col[i].as_py() for col in tbl.columns)
            for i in range(tbl.num_rows)]
    return cols, rows


def main():
    a, b = Path(sys.argv[1]), Path(sys.argv[2])
    names = sorted(set(p.name for p in a.iterdir() if p.is_dir()) &
                   set(p.name for p in b.iterdir() if p.is_dir()))
    bad = 0
    for name in names:
        fa, fb = a / name / "_VERIFY_FAILED", b / name / "_VERIFY_FAILED"
        if fa.exists() or fb.exists():
            print(f"{name:28s} VERIFY-FAIL marker present")
            bad += 1
            continue
        ca, ra = load(a / name)
        cb, rb = load(b / name)
        if sorted(ca) != sorted(cb):
            print(f"{name:28s} SCHEMA-DIFF {sorted(ca)} vs {sorted(cb)}")
            bad += 1
        elif table_key(ca, ra) != table_key(cb, rb):
            print(f"{name:28s} VALUE-DIFF rows={len(ra)} vs {len(rb)}")
            bad += 1
        else:
            print(f"{name:28s} IDENTICAL rows={len(ra)}")
    print(f"\n{len(names) - bad} identical, {bad} diff of {len(names)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
