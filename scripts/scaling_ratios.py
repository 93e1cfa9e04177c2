#!/usr/bin/env python3
"""Scaling-curve table: per-query ratios between two Bench JSON lines.

Usage: scaling_ratios.py <bench_small.json-line-file> <bench_big.json-line-file> <scale_factor>
e.g.   scaling_ratios.py /tmp/bench_sf1.out /tmp/bench_sf3.out 3

Extracts the last {"metric":"total"...} line from each file, joins the
per-query maps and prints queries sorted by time ratio (worst first),
marking entries whose ratio exceeds the data-scale factor
(super-linear candidates). Totals are also shown normalized by each
run's box_speed so two sweeps from differently-loaded sessions still
compare.
"""
import json, re, sys

def load(path):
    txt = open(path, errors="replace").read()
    for ln in reversed(txt.splitlines()):
        m = re.search(r'\{"metric":"total".*\}', ln)
        if m:
            return json.loads(m.group(0))
    sys.exit(f"no bench JSON in {path}")

def main():
    small, big, k = load(sys.argv[1]), load(sys.argv[2]), float(sys.argv[3])
    qs = sorted(set(small["queries"]) & set(big["queries"]),
                key=lambda q: -(big["queries"][q] / max(small["queries"][q], 1e-9)))
    print(f"{'query':<28}{'small':>8}{'big':>8}{'ratio':>7}  note")
    sup = []
    for q in qs:
        a, b = small["queries"][q], big["queries"][q]
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
    trn = (big.get("total_norm", big["value"]) /
           max(small.get("total_norm", small["value"]), 1e-9))
    print(f"total ratio raw={tr:.2f} normalized={trn:.2f} on {k:.0f}x data")
    print(f"super-linear candidates: {sup or 'none'}")

if __name__ == "__main__":
    main()
