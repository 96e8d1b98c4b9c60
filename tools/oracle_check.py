#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result, run the
corresponding oracle SQL from oracle_sql.json in DuckDB (tables = parquet
files in sfDir), sort columns by name, compare row counts, schemas (loosely)
and values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for qdir in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, qdir)
        if not os.path.isdir(full):
            continue
        got = pd.read_parquet(full)
        got = got[sorted(got.columns)].reset_index(drop=True)
        if qdir not in oracles:
            print(f"  [rows-only] {qdir}: rows={len(got)}")
            continue
        try:
            exp = con.execute(oracles[qdir]).df()
        except Exception as e:
            print(f"✗ {qdir}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        exp = exp[sorted(exp.columns)].reset_index(drop=True)
        ok = True
        if list(got.columns) != list(exp.columns):
            print(f"✗ {qdir}: columns {list(got.columns)} != {list(exp.columns)}")
            ok = False
        elif len(got) != len(exp):
            print(f"✗ {qdir}: rows {len(got)} != {len(exp)}")
            ok = False
        else:
            for c in got.columns:
                g, e = got[c], exp[c]
                try:
                    if g.dtype.kind == 'f' or e.dtype.kind == 'f':
                        import numpy as np
                        eq = np.allclose(g.astype(float), e.astype(float),
                                         rtol=0, atol=0, equal_nan=True)
                        exact = (g.astype(float).fillna(0) == e.astype(float).fillna(0)).all()
                        if not exact:
                            print(f"✗ {qdir}: col {c} float mismatch "
                                  f"(close={eq})")
                            ok = False
                    else:
                        if not (g.astype(str) == e.astype(str)).all():
                            bad = (g.astype(str) != e.astype(str))
                            i = bad[bad].index[0]
                            print(f"✗ {qdir}: col {c} row {i}: "
                                  f"{g[i]!r} != {e[i]!r}")
                            ok = False
                except Exception as ex:
                    print(f"✗ {qdir}: col {c} compare error: {ex}")
                    ok = False
        if ok:
            n_pass += 1
            print(f"✓ {qdir} ({len(got)} rows)")
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
