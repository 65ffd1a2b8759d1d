#!/usr/bin/env python3
"""Merge per-query bigcheck artifacts into a CORRECTNESS_sf*.json.

Usage: merge_correctness.py CORRECTNESS_sf1000.json /tmp/art_*.json

Existing entries are overwritten only by an artifact that carries a
verdict (err or hash_match set); artifacts that never compared
(SETUP-FAIL) are reported but not merged, so the file can't lose
coverage it already has.
"""
import json
import sys
from pathlib import Path


def main():
    target = Path(sys.argv[1])
    base = json.loads(target.read_text()) if target.exists() else {}
    for art in sys.argv[2:]:
        for name, rec in json.loads(Path(art).read_text()).items():
            compared = rec.get("hash_match") is not None or rec.get("err")
            if not compared:
                print(f"[merge] {name}: no verdict in {art} — skipped")
                continue
            base[name] = rec
            verdict = "OK" if rec.get("hash_match") else rec.get("err")
            print(f"[merge] {name}: {verdict}")
    target.write_text(json.dumps(base, indent=1, sort_keys=True) + "\n")
    ok = sum(1 for r in base.values() if r.get("hash_match"))
    print(f"[merge] {target}: {ok}/{len(base)} hash-exact")


if __name__ == "__main__":
    main()
