#!/usr/bin/env python3
"""Local correctness harness: replicate the driver's t2 check.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB over the
sf-dir parquet tables and compares against the engine's parquet dump in
<outdir>/<query>/. Strictest plausible comparison: column names
(sorted), dtypes, row count, and exact cell values in emitted row
order. Usage: check.py <sfdir> <outdir> [--json artifact.json] [query ...]

With --json, also writes a per-query record in the driver's
CORRECTNESS_r05 schema: {"rows_match","schema_match","hash_match",
"spark_rows","oracle_rows","err"} — so the committed local artifact is
field-diffable against the driver's own record.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: check.py <sfdir> <outdir> [--json out.json] "
                     "[query ...] (--json needs a path)")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sfdir, outdir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    records = {}

    def rec(name, rows_m, schema_m, hash_m, srows, orows, err):
        records[name] = {"rows_match": rows_m, "schema_match": schema_m,
                         "hash_match": hash_m, "spark_rows": srows,
                         "oracle_rows": orows, "err": err}

    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            rec(name, False, False, False, 0, None, "no spark output"); continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_fail += 1
            rec(name, False, False, False, len(spark_df), None,
                f"oracle error: {str(e).splitlines()[0]}"); continue
        s = spark_df.reindex(sorted(spark_df.columns), axis=1)
        d = duck_df.reindex(sorted(duck_df.columns), axis=1)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: cols spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            rec(name, len(s) == len(d), False, False, len(s), len(d),
                "column mismatch"); continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            rec(name, False, True, False, len(s), len(d), "row count mismatch")
            continue
        ok = True
        for c in s.columns:
            sv, dv = s[c].to_numpy(), d[c].to_numpy()
            if sv.dtype.kind == 'f' or dv.dtype.kind == 'f':
                svf = sv.astype(float); dvf = dv.astype(float)
                exact = np.array_equal(svf, dvf)
                if not exact:
                    bad = ~np.isclose(svf, dvf, rtol=0, atol=0, equal_nan=True)
                    idx = np.where(bad)[0][:3]
                    md = np.nanmax(np.abs(svf - dvf))
                    print(f"FAIL {name}.{c}: {bad.sum()} diffs maxdiff={md:.3e} "
                          f"e.g. rows {idx.tolist()} spark={svf[idx].tolist()} duck={dvf[idx].tolist()}")
                    ok = False
            else:
                eq = pd.Series(sv).astype(object).eq(pd.Series(dv).astype(object))
                if not eq.all():
                    idx = np.where(~eq.to_numpy())[0][:3]
                    print(f"FAIL {name}.{c}: {(~eq).sum()} diffs e.g. rows {idx.tolist()} "
                          f"spark={sv[idx].tolist()} duck={dv[idx].tolist()}")
                    ok = False
            # dtype note (non-fatal print for awareness)
            if sv.dtype != dv.dtype:
                print(f"  note {name}.{c}: dtype spark={sv.dtype} duck={dv.dtype}")
        rec(name, True, True, ok, len(s), len(d), None)
        if ok:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
        else:
            n_fail += 1
    # queries without oracle: rows-only
    for qdir in sorted(glob.glob(f"{outdir}/q_*")):
        name = os.path.basename(qdir)
        if name not in oracle:
            df = load_spark(outdir, name)
            print(f"INFO {name}: no oracle, rows={0 if df is None else len(df)}")
            n_skip += 1
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(records)} queries)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
