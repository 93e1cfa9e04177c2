#!/usr/bin/env python3
"""True-reference fidelity check: replay the SQLite-semantics queries
against ACTUAL SQLite (python's sqlite3 module) and diff cell-for-cell
against the Spark result dumps produced by `graft.Verify`.

scripts/selfcheck.py (the DuckDB oracle) proves cross-engine agreement on
an independent re-derivation of each rule; this script proves the rules
are SQLite's OWN: same inputs, SQLite's native CAST / substr / integer
division / scalar max-min / quote / LIKE-ESCAPE / NOCASE, executed by
SQLite itself.

Covered: q59 (LIKE case-insensitive default), q65 (signed int div/mod),
q66 (never-erroring CAST), q67 (substr edges), q68 (NOCASE collation),
q69 (scalar min/max NULL propagation), q71 (case-insensitive LIKE with
ESCAPE), q79 (GLOB matrix incl. sqlite3.c edge rules), c06 (quote()),
q42 (strftime surface), q56 (datetime modifier chains), q81
(julianday/unixepoch as exact integer-ms day numbers), and the write
path (writepath.json: DDL + codec binds + affinity + truncation).
Checks whose dump is absent are SKIPped, so the script also works on
partial Verify output while iterating on one query.
q56 datetime modifier chains are replayed natively since round 5:
dateModifiers now NORMALIZES month arithmetic like SQLite's date.c
(Jan 31 + 1 month = Mar 2/3) instead of clamping, so the whole chain
diffs against datetime(ts, modifier...) directly.

Usage: python3 scripts/sqlite_fidelity.py <sfDir> <verifyOutDir>
"""
import glob
import sqlite3
import sys

import pandas as pd


def spark_dump(outdir: str, name: str) -> pd.DataFrame:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        raise FileNotFoundError(f"no Spark dump for {name} under {outdir}")
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == bool:
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df.astype(str)  # uniform rendering, incl. None/NaN


def compare_dump(name: str, outdir: str, want: pd.DataFrame,
                 drop: list = None) -> bool:
    """compare() against the Spark dump; SKIP (not fail) if the dump is
    absent — lets the script run on partial Verify output during
    iteration on a single query."""
    try:
        got = spark_dump(outdir, name)
    except FileNotFoundError:
        print(f"SKIP {name}: no Spark dump")
        return True
    if drop:
        got = got.drop(columns=drop)
    return compare(name, got, want)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> bool:
    g, w = canon(got), canon(want)
    ok = list(g.columns) == list(w.columns) and len(g) == len(w) and g.equals(w)
    if ok:
        print(f"PASS {name} ({len(g)} rows vs sqlite {sqlite3.sqlite_version})")
    else:
        print(f"FAIL {name}: spark {g.shape} vs sqlite {w.shape}")
        if list(g.columns) == list(w.columns) and len(g) == len(w):
            diff = (g != w).any(axis=1)
            print(pd.concat([g[diff].head(5).add_suffix("_spark"),
                             w[diff].head(5).add_suffix("_sqlite")], axis=1))
    return ok


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = sqlite3.connect(":memory:")
    for t in ("nation", "customer", "part"):
        pd.read_parquet(f"{sf_dir}/{t}.parquet").to_sql(t, con, index=False)
    # TIMESTAMP(NANOS) won't survive to_sql — carry ts as the text form
    # SQLite's date functions accept (seconds precision: q56's outputs
    # are formatted to seconds on both sides)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["ts_s"] = ev["ts"].dt.strftime("%Y-%m-%d %H:%M:%S")
    ev.drop(columns=["ts"]).to_sql("events", con, index=False)
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_orderkey", "o_orderdate"]]
    od["o_orderdate"] = pd.to_datetime(od["o_orderdate"]).dt.strftime("%Y-%m-%d")
    od.to_sql("orders", con, index=False)

    def q(sql: str) -> pd.DataFrame:
        return pd.read_sql_query(sql, con)

    ok = True

    # q65: SQLite's / on integers IS truncating division; % takes the
    # dividend's sign (C semantics in the VDBE)
    ok &= compare_dump("q65_int_div", out_dir, q("""
        SELECT a, b, a / b AS idiv, a % b AS imod,
               round(CAST(a AS REAL) / b, 4) AS fdiv
        FROM (SELECT n_nationkey - 12 AS a, n_regionkey - 2 AS b FROM nation)
        WHERE b <> 0 ORDER BY a, b"""))

    # q66: native never-erroring CAST
    ok &= compare_dump("q66_sqlite_cast", out_dir, q("""
        WITH vals(sv) AS (VALUES ('12abc'), ('abc'), ('  42'),
          (char(9) || '42'), ('-3.9xyz'), ('3.9'),
          ('99999999999999999999999'), ('-00099999999999999999999999'),
          ('0000000005'), ('1e3'), ('.5e1x'), ('+7'), (''), ('0x1A'),
          ('9223372036854775807'), ('-9223372036854775808'))
        SELECT sv, CAST(sv AS INTEGER) AS i, CAST(sv AS REAL) AS r
        FROM vals ORDER BY sv"""))

    # q67: native substr edge semantics
    ok &= compare_dump("q67_substr_sqlite", out_dir, q("""
        SELECT n_nationkey, n_name,
               substr(n_name, 2, 3) AS mid,
               substr(n_name, -3) AS tail3,
               substr(n_name, 0, 3) AS zero3,
               substr(n_name, 3, -2) AS before3,
               substr(n_name, -1, -2) AS beforelast
        FROM nation ORDER BY n_nationkey"""))

    # q68: native NOCASE collation (ASCII-only fold). SQLite groups by a
    # representative, our engine by the folded key — compare the group
    # SHAPES (count, min, max), which pin the same equivalence classes.
    sqlite_groups = q("""
        WITH u AS (
          SELECT upper(n_name) || CASE WHEN n_nationkey % 5 = 0 THEN 'É' ELSE '' END AS name
          FROM nation
          UNION ALL
          SELECT lower(n_name) || CASE WHEN n_nationkey % 5 = 0 THEN 'é' ELSE '' END AS name
          FROM nation)
        SELECT count(*) AS n, min(name) AS mn, max(name) AS mx
        FROM u GROUP BY name COLLATE NOCASE""")
    ok &= compare_dump("q68_collate_nocase", out_dir, sqlite_groups,
                       drop=["nk"])

    # q69: native scalar max/min NULL propagation
    ok &= compare_dump("q69_minmax_null", out_dir, q("""
        SELECT event_id, a, b, max(a, b) AS mx, min(a, b) AS mn
        FROM (SELECT event_id, round(value, 2) AS a,
                     CASE WHEN event_type = 'error' THEN NULL
                          ELSE 50.0 - round(value, 2) END AS b
              FROM events WHERE event_id < 3000) x
        ORDER BY event_id"""))

    # q71: SQLite LIKE is natively case-insensitive, ESCAPE makes the
    # wildcard literal — no ilike needed on this side
    ok &= compare_dump("q71_like_escape", out_dir, q("""
        WITH r AS (SELECT c_custkey,
                (CASE WHEN c_custkey % 2 = 0 THEN 'ID' ELSE 'id' END) ||
                (CASE WHEN c_custkey % 3 = 0 THEN '_' ELSE 'x' END) ||
                CAST(c_custkey AS TEXT) || '%' || lower(c_name) AS tag
              FROM customer WHERE c_custkey <= 300)
        SELECT c_custkey, tag,
               tag LIKE 'id!_1%' ESCAPE '!' AS m_esc,
               tag LIKE 'id_1%' AS m_raw
        FROM r WHERE (tag LIKE 'id!_1%' ESCAPE '!') OR (tag LIKE 'id_1%')
        ORDER BY c_custkey"""))

    # q59: LIKE's native case-insensitive default (no ILIKE on this side)
    ok &= compare_dump("q59_sqlite_like", out_dir, q("""
        SELECT p_partkey, p_name,
               p_name LIKE '%GRE%' AS ci_hit,
               p_name NOT LIKE '%A%' AS ci_not_hit
        FROM part WHERE (p_name LIKE '%GRE%') OR (p_name NOT LIKE '%A%')
        ORDER BY p_partkey"""))

    # q79: native GLOB over the full pattern matrix, incl. the sqlite3.c
    # edge rules (empty set, unclosed '[', inverted range) — DuckDB
    # agrees on these, but THIS check is against SQLite's own strglob
    ok &= compare_dump("q79_glob_matrix", out_dir, q("""
        WITH s AS (SELECT n_name AS s FROM nation UNION ALL SELECT 'A[x'),
        p(p) AS (VALUES ('RUS*'), ('*IA'), ('*AN*'), ('CHINA'), ('?????'),
          ('C?INA'), ('[A-C]*'), ('*[AI]'), ('IND[IO]*'), ('[]*'), ('A[x'),
          ('[z-a]*'))
        SELECT p, s, s GLOB p AS m FROM p CROSS JOIN s ORDER BY p, s"""))

    # c06: native quote() over typed cells. Reals span three magnitude
    # decades via exponent-suffix PARSING (never float multiplication,
    # which lands on non-round-trip doubles where SQLite's quote falls
    # back to its approximate exact-%.20e decode — the documented
    # sqliteRealString limit)
    ok &= compare_dump("c06_quote", out_dir, q("""
        SELECT event_id,
               CASE WHEN event_id % 4 = 0 THEN quote(CAST(value AS INTEGER))
                    WHEN event_id % 4 = 1 THEN quote(CAST(
                      CAST(round(value, 2) AS TEXT) ||
                      CASE WHEN event_id % 3 = 1 THEN 'e8'
                           WHEN event_id % 3 = 2 THEN 'e16' ELSE '' END
                      AS REAL))
                    WHEN event_id % 4 = 2 THEN quote(event_type || '''' || props)
                    ELSE quote(NULL) END AS q
        FROM events WHERE event_id < 1000 ORDER BY event_id"""))

    # q42: the strftime/date/time surface against SQLite's own
    # lang_datefunc formats (%w is 0=Sunday; the Spark side's dow is
    # dayofweek = %w + 1)
    ok &= compare_dump("q42_strftime", out_dir, q("""
        SELECT o_orderkey,
               strftime('%Y-%m-%d', o_orderdate) AS d,
               strftime('%Y-%m-%d %H:%M:%S', o_orderdate) AS dt,
               strftime('%Y', o_orderdate) AS y4,
               CAST(strftime('%j', o_orderdate) AS INT) AS doy,
               CAST(strftime('%w', o_orderdate) AS INT) + 1 AS dow
        FROM orders ORDER BY o_orderkey"""))

    # q81: julianday()/unixepoch() against SQLite's own lang_datefunc —
    # the julian day compared as SQLite's internal integer-ms iJD
    # (julianday * 86400000 is exact there; every engine's nearest-int
    # of its own double recovers the same value)
    ok &= compare_dump("q81_julianday", out_dir, q("""
        SELECT event_id,
               CAST(round(julianday(ts_s) * 86400000.0) AS INTEGER) AS jd_ms,
               unixepoch(ts_s) AS ue
        FROM events ORDER BY event_id"""))

    # q56: the full datetime-modifier chains against SQLite's own
    # lang_datefunc — incl. the normalize-not-clamp month arithmetic the
    # '+1 month' column exercises on raw day-of-month values
    ok &= compare_dump("q56_date_modifiers", out_dir, q("""
        SELECT event_id,
               datetime(ts_s, 'start of month', '+1 month', '-1 day') AS month_end,
               datetime(ts_s, 'weekday 1') AS next_monday,
               datetime(ts_s, 'start of year', '+9 hours') AS year_start_9am,
               datetime(ts_s, '+1 month') AS month_plus
        FROM events WHERE event_id <= 50 ORDER BY event_id"""))

    ok &= check_writepath(out_dir)

    print("sqlite-fidelity:", "ALL PASS" if ok else "FAILURES")
    return 0 if ok else 1


def check_writepath(out_dir: str) -> bool:
    """S6/S7/C6 write-path replay: execute the repo-generated CREATE
    TABLE DDL and codec-encoded INSERT binds (writepath.json, produced by
    graft.Verify via WritePathDump) against REAL SQLite, then diff the
    actual storage class (typeof) and rendering (CAST AS TEXT / hex) of
    every cell against the repo's predictions — plus the SDF.swift:578
    lenient-arity truncation case."""
    import json
    import os
    path = f"{out_dir}/writepath.json"
    if not os.path.exists(path):
        print("SKIP writepath: no dump")
        return True
    spec = json.load(open(path))
    con = sqlite3.connect(":memory:")
    con.execute(spec["ddl"])

    def to_param(cell):
        if cell is None:
            return None
        if "i" in cell:
            return cell["i"]
        if "r" in cell:
            return cell["r"]
        if "s" in cell:
            return cell["s"]
        return sqlite3.Binary(bytes.fromhex(cell["b"]))

    con.executemany(spec["insert"],
                    [tuple(to_param(c) for c in row) for row in spec["rows"]])
    sel = ", ".join(
        f'typeof("{c}"), CASE WHEN typeof("{c}") = \'blob\' THEN hex("{c}") '
        f'ELSE CAST("{c}" AS TEXT) END'
        for c in spec["cols"])
    got = con.execute(
        f'SELECT {sel} FROM {spec["table"]} ORDER BY rowid').fetchall()
    ok = True
    for ri, (grow, erow) in enumerate(zip(got, spec["expected"])):
        for ci, (etype, etext) in enumerate(erow):
            gtype, gtext = grow[2 * ci], grow[2 * ci + 1]
            gtext = "" if gtext is None else gtext
            if (gtype, gtext) != (etype, etext):
                print(f"FAIL writepath cell[{ri}][{spec['cols'][ci]}]: "
                      f"sqlite ({gtype!r}, {gtext!r}) vs predicted "
                      f"({etype!r}, {etext!r})")
                ok = False
    if len(got) != len(spec["expected"]):
        print(f"FAIL writepath: {len(got)} rows vs {len(spec['expected'])}")
        ok = False
    # lenient-arity truncation: bind only the statement's parameter count
    tr = spec["trunc"]
    con.execute(tr["ddl"])
    w = tr["bind_width"]
    con.executemany(tr["insert"],
                    [tuple(to_param(c) for c in row[:w]) for row in tr["rows"]])
    tgot = [tuple(str(v) for v in r) for r in con.execute(
        'SELECT "a", "b" FROM graft_wp_trunc ORDER BY rowid').fetchall()]
    if tgot != [tuple(r) for r in tr["expect"]]:
        print(f"FAIL writepath trunc: {tgot} vs {tr['expect']}")
        ok = False
    if ok:
        print(f"PASS writepath ({len(got)} rows x {len(spec['cols'])} cols "
              f"+ trunc, vs sqlite {sqlite3.sqlite_version})")
    return ok


if __name__ == "__main__":
    sys.exit(main())
