#!/usr/bin/env python3
"""Self-check harness: mimic the driver's DuckDB-oracle compare.

Usage: python3 scripts/selfcheck.py <sfDir> <outDir> [--skip n1,n2,...]
Reads <outDir>/<name>/ parquet (Spark results) + <outDir>/oracle_sql.json,
runs each oracle on DuckDB over <sfDir>/*.parquet, canonicalizes
(sort columns by name, sort rows, round floats) and compares.

--skip names queries whose ORACLE is intractable in DuckDB at the given
scale (the sf1 dedup-block oracles pair-join 50k shingle sets — ~1.2 B
list intersections each); they are reported as SKIP, not silently
dropped, so the run's coverage stays visible.
"""
import sys, json, glob, math
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> iso strings, floats -> rounded
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    skip = set()
    rest = sys.argv[3:]
    if rest and rest[0] == "--skip" and len(rest) == 2:
        skip = set(x.strip() for x in rest[1].split(",") if x.strip())
    elif rest:
        # fail fast: a malformed flag (--skip=..., trailing args) silently
        # ignored would run the intractable oracle it exists to avoid
        sys.exit(f"unrecognized arguments {rest}; usage: selfcheck.py <sfDir> <outDir> [--skip n1,n2,...]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    unknown = skip - set(oracle)
    if unknown:
        sys.exit(f"--skip names not in oracle_sql.json: {sorted(unknown)}")
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name} (oracle intractable at this scale)")
            n_skip += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in
                sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        # schema check (loose): dtype kinds must match
        kinds = [(str(a[c].dtype), str(b[c].dtype)) for c in a.columns]
        mismatch_schema = [(c, ka, kb) for c, (ka, kb) in zip(a.columns, kinds)
                           if pd.api.types.is_float_dtype(a[c]) != pd.api.types.is_float_dtype(b[c])
                           or pd.api.types.is_integer_dtype(a[c]) != pd.api.types.is_integer_dtype(b[c])]
        ok = True
        rtol_cols = []
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
                # Two-tier float compare (r10 verdict #3): absolute 1e-9
                # catches everything at small magnitude; the RELATIVE term
                # bounds double-summation-order noise — Spark and DuckDB
                # legitimately add the same cent-rounded doubles in
                # different orders, which accumulates ~1e-13 relative
                # error on 1e11-magnitude sf1 revenue sums (measured
                # diffs <= 0.03 on 3.2e11; a bug would be orders of
                # magnitude larger). Cells that pass only via the
                # relative term are reported so the bound stays visible.
                av, bv = a[c].fillna(-9e99), b[c].fillna(-9e99)
                diff = (av - bv).abs()
                mag = pd.concat([av.abs(), bv.abs()], axis=1).max(axis=1)
                tol = 1e-9 + 1e-12 * mag
                # Third tier, same noise class one step later: when the
                # query itself cent-ROUNDS a large sum (round(x, 2)), the
                # 1e-13-relative summation-order difference is AMPLIFIED
                # to exactly one cent whenever the unrounded sums straddle
                # a cent boundary (sf1: q54 revenue 71626750.05 vs .04 —
                # 1.4e-10 relative, far above the raw-sum rtol but still
                # pure ordering noise). Accept a <=0.011 absolute diff on
                # cells of >=1e6 magnitude ONLY when (a) both engines'
                # values are themselves cent-rounded (the amplification
                # mechanism requires round(x, 2) — an unrounded aggregate
                # stays under the raw-sum rtol and must keep failing on a
                # real 1-cent error), and (b) at most max(1, 1% of rows)
                # cells in the column need the tier — ordering noise hits
                # isolated boundary cells, a systematic error hits many.
                # Reported distinctly so the bound stays visible per query.
                # "cent-rounded" = v*100 sits within a few ulps of an
                # integer. The bound must scale with ulp(v*100), NOT with
                # |v| (an |v|-proportional 1e-6 bound exceeds the maximum
                # possible residual 0.5 at the tier's own >=1e6 magnitude
                # gate, accepting every value — r11 ADVICE). A genuinely
                # round(x,2)'d double is nearest(k/100), so v*100 lands
                # within ~2.3e-16 relative of k; 4 ulps covers that plus
                # the v*100 multiply's own rounding, while an unrounded
                # aggregate's residual is uniform in [0, 0.5] — at least
                # 5 orders of magnitude above the bound until |v| ~ 1e13,
                # where doubles stop resolving cents at all.
                # CAVEAT (r12 ADVICE): the 4-ulp bound assumes cent
                # rounding is the LAST operation in the query. A column
                # that sums pre-rounded cent values without a final
                # round(.,2) accumulates many ulps and drops out of the
                # tier — if such a column is ever added, re-round in the
                # query (preferred) or widen the bound by a row-count-
                # scaled factor here. All current tier queries round last.
                def _centish(v):
                    x = v * 100
                    return (x.round() - x).abs() <= 4 * np.spacing(x.abs())
                cent = ((diff <= 0.011) & (mag >= 1e6)
                        & _centish(av) & _centish(bv))
                needed = (diff > tol) & cent
                if needed.sum() > max(1, len(a) // 100):
                    cent &= False
                same = ((diff <= tol) | cent).all()
                if same and (diff >= 1e-9).any():
                    rtol_cols.append(c + (" (cent)" if needed.any() else ""))
            else:
                same = (a[c].fillna("<N>").astype(str) == b[c].fillna("<N>").astype(str)).all()
            if not same:
                bad = (a[c].fillna("<N>").astype(str) != b[c].fillna("<N>").astype(str))
                idx = bad[bad].index[:3].tolist() if bad.any() else []
                print(f"FAIL {name}: col {c} differs at rows {idx}")
                for i in idx[:2]:
                    print(f"    spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}")
                ok = False
                break
        if ok and mismatch_schema:
            print(f"WARN {name}: dtype kinds differ: {mismatch_schema}")
        if ok:
            note = f" [rtol-bounded: {','.join(rtol_cols)}]" if rtol_cols else ""
            print(f"PASS {name} ({len(a)} rows){note}"); n_pass += 1
        else:
            n_fail += 1
    tail = f" / {n_skip} skip" if n_skip else ""
    print(f"\n{n_pass} pass / {n_fail} fail{tail}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
