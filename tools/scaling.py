#!/usr/bin/env python3
"""Build SCALING.md from two graft.Bench JSON lines at different scale
factors: per-query scaling exponents e = log(t_hi/t_lo) / log(sf_hi/sf_lo).

Queries below the bench's per-query reporting threshold at either scale
are listed as sub-threshold (their absolute cost is noise-level at both
scales). Usage: scaling.py <bench_lo.json> <bench_hi.json> [out.md]
"""
import json
import math
import sys


def main() -> None:
    lo = json.load(open(sys.argv[1]))
    hi = json.load(open(sys.argv[2]))
    out = sys.argv[3] if len(sys.argv) > 3 else "SCALING.md"
    ratio = float(hi["sf"]) / float(lo["sf"])
    qlo, qhi = lo["queries"], hi["queries"]
    rows = []
    for name in sorted(set(qlo) & set(qhi)):
        e = math.log(qhi[name] / qlo[name]) / math.log(ratio)
        # per-row cost multiple: t_hi / (ratio * t_lo) — 1.0 = perfectly linear
        prc = qhi[name] / (ratio * qlo[name])
        rows.append((name, qlo[name], qhi[name], e, prc))
    missing = sorted((set(qlo) | set(qhi)) - (set(qlo) & set(qhi)))
    sup = [r for r in rows if r[4] > 2.0]
    with open(out, "w") as f:
        f.write(
            f"# SCALING — measured sf{lo['sf']} → sf{hi['sf']} "
            f"({ratio:.0f}× rows)\n\n"
            "Identical `graft.Bench` runs (same box, same JVM settings,\n"
            "back-to-back) over the driver tables at the bench scale and the\n"
            "`GenScale` 10× replica-disjoint scale-up (see its scaladoc for\n"
            "why replication preserves each operator's complexity class).\n"
            "`exponent` = log(t_hi/t_lo)/log(10): 1.0 = linear, <1 = fixed\n"
            "costs amortizing, ≤0 ≈ flat. `per-row ×` = t_hi/(10·t_lo) —\n"
            "the round-3 brief's bar is per-row × ≤ 2.\n\n"
            f"- total: {lo['value']:.1f} s → {hi['value']:.1f} s "
            f"(exponent {math.log(hi['value']/lo['value'])/math.log(ratio):.2f})\n"
            f"- queries over the per-row bar: "
            f"{', '.join(r[0] for r in sup) if sup else 'NONE'}\n"
            f"- sub-threshold at one scale (absolute noise level, "
            f"excluded): {len(missing)}\n\n"
            f"| query | t(sf{lo['sf']}) s | t(sf{hi['sf']}) s | exponent | per-row × |\n"
            "|---|---|---|---|---|\n")
        for name, tlo, thi, e, prc in sorted(rows, key=lambda r: -r[3]):
            mark = " ⚠" if prc > 2.0 else ""
            f.write(f"| {name} | {tlo:.2f} | {thi:.2f} | {e:.2f}{mark} | {prc:.2f} |\n")
        if missing:
            f.write("\nSub-threshold at one scale: " + ", ".join(missing) + "\n")
    print(f"wrote {out}: {len(rows)} compared, {len(sup)} over bar")


if __name__ == "__main__":
    main()
