"""Shared parsing for graft.Bench output (one place, two consumers:
scaling_ratios.py and chaos_bench.py — r12 review pass)."""
import json
import re

_LINE = re.compile(r'\{"metric":"total".*\}')


def last_total(text):
    """The last {"metric":"total",...} JSON object in `text`, or None."""
    for ln in reversed(text.splitlines()):
        m = _LINE.search(ln)
        if m:
            return json.loads(m.group(0))
    return None


def load(path):
    d = last_total(open(path, errors="replace").read())
    if d is None:
        raise SystemExit(f"no bench JSON line in {path}")
    return d


def split_queries(d):
    """(measured, errored) query-name→time maps. Bench records a failed
    query as value -1.0; treating that as a time corrupts ratios."""
    ok = {q: t for q, t in d["queries"].items() if t >= 0}
    bad = sorted(q for q, t in d["queries"].items() if t < 0)
    return ok, bad
