#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare with the Spark result dumped
by graft.Verify (rows, schema, values). Dev tooling only — not part of
the shipped library."""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # dates come back as objects from duckdb sometimes
            pass
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got_raw = pd.concat([pd.read_parquet(f) for f in files])
            want_raw = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0]}"); n_fail += 1; continue
        # The driver hashes raw values: a DuckDB HUGEINT/DOUBLE rendering as
        # 3.0 against Spark's 3 is a hash mismatch even when numerically
        # equal, so int-vs-float dtype skew must fail here too.
        skew = [c for c in got_raw.columns if c in want_raw.columns and
                (pd.api.types.is_integer_dtype(got_raw[c]) != pd.api.types.is_integer_dtype(want_raw[c])) and
                (pd.api.types.is_float_dtype(got_raw[c]) or pd.api.types.is_float_dtype(want_raw[c]))]
        if skew:
            print(f"FAIL {name}: int-vs-float dtype skew on {skew} "
                  f"(cast the oracle side, e.g. HUGEINT from sum()/'//', to BIGINT)")
            n_fail += 1; continue
        got, want = norm(got_raw), norm(want_raw)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        bad = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    ok = np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True)
                    exact = (a.astype(float).fillna(-9e99) == b.astype(float).fillna(-9e99)).all()
                    if not exact:
                        bad = (c, "float mismatch"); break
                else:
                    if not (a.astype(str).fillna("NULL") == b.astype(str).fillna("NULL")).all():
                        bad = (c, "value mismatch"); break
            except Exception as e:
                bad = (c, f"compare error {e}"); break
        if bad:
            c, why = bad
            mism = got[c].astype(str) != want[c].astype(str)
            idx = mism[mism].index[:3]
            print(f"FAIL {name}: col {c} {why}; e.g. got={got[c][idx].tolist()} want={want[c][idx].tolist()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
