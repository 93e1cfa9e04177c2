#!/usr/bin/env python3
"""Scaling-curve table: per-query ratios between two Bench JSON lines.

Usage: scaling_ratios.py <bench_small.json-line-file> <bench_big.json-line-file> <scale_factor>
e.g.   scaling_ratios.py /tmp/bench_sf1.out /tmp/bench_sf3.out 3

Extracts the last {"metric":"total"...} line from each file, joins the
per-query maps and prints queries sorted by time ratio (worst first),
marking entries whose ratio exceeds the data-scale factor
(super-linear candidates). Totals are also shown normalized by each
run's box_speed so two sweeps from differently-loaded sessions still
compare (box_speed is null when the sweep ran at non-canonical cpus —
then the raw total is used and labeled as such).

Caveats surfaced rather than swallowed (r12 review pass):
 - a sweep with omitted>0 trimmed its per-query map to fit the
   driver's tail budget — the dropped queries are exactly the
   fast-at-small ones a super-linear hunt needs, so WARN loudly
   (re-run with SPARK_GRAFT_BUDGET=100000 for analysis sweeps);
 - errored queries (value -1.0) are listed separately, never ranked.
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from benchjson import load, split_queries


def main():
    small, big, k = load(sys.argv[1]), load(sys.argv[2]), float(sys.argv[3])
    for lbl, d in (("small", small), ("big", big)):
        if d.get("omitted", 0) > 0:
            print(f"WARNING: {lbl} run omitted {d['omitted']} per-query entries "
                  f"(fit budget) — the joined table is NOT a full-suite curve; "
                  f"re-run with SPARK_GRAFT_BUDGET=100000")
    s_ok, s_err = split_queries(small)
    b_ok, b_err = split_queries(big)
    if s_err or b_err:
        print(f"ERRORED (excluded from ratios): small={s_err} big={b_err}")
    qs = sorted(set(s_ok) & set(b_ok),
                key=lambda q: -(b_ok[q] / max(s_ok[q], 1e-9)))
    print(f"{'query':<28}{'small':>8}{'big':>8}{'ratio':>7}  note")
    sup = []
    for q in qs:
        a, b = s_ok[q], b_ok[q]
        r = b / max(a, 1e-9)
        note = ""
        if r > k and b - a > 0.5:
            note = f"SUPER-LINEAR (> {k:.0f}x and material)"
            sup.append(q)
        print(f"{q:<28}{a:>8.2f}{b:>8.2f}{r:>7.2f}  {note}")
    for lbl, d in (("small", small), ("big", big)):
        print(f"{lbl}: total={d['value']} norm={d.get('total_norm')} "
              f"box_speed={d.get('box_speed')} load={d['load']} "
              f"errors={d['errors']} flagged={d['control'].get('flagged')}")
    tr = big["value"] / small["value"]
    # box_speed/total_norm are null at non-canonical cpus — if EITHER run
    # lacks total_norm, use raw values for BOTH sides of the ratio (a
    # mixed normalized/raw ratio is on two different scales; r12 ADVICE)
    if big.get("total_norm") and small.get("total_norm"):
        bn, sn, norm_lbl = big["total_norm"], small["total_norm"], "normalized"
    else:
        bn, sn = big["value"], small["value"]
        norm_lbl = "RAW-FALLBACK (a run lacks box_speed; BOTH sides raw)"
    print(f"total ratio raw={tr:.2f} {norm_lbl}={bn / max(sn, 1e-9):.2f} on {k:.0f}x data")
    print(f"super-linear candidates: {sup or 'none'}")


if __name__ == "__main__":
    main()
