#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

For each <name>.parquet under verifyOutDir, runs oracle_sql.json[name] in
DuckDB with the corpus tables registered as views over <sfDir>/*.parquet,
sorts columns by name + rows by value, and compares cell-by-cell.
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import os

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if hasattr(v, "isoformat"):  # datetime/date
        s = v.isoformat()
        return s.rstrip("0").rstrip(".") if "." in s else s
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        files = [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")]
        tbl = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(path)
        got_cols = tbl.column_names
        got_rows = [tuple(c[i].as_py() for c in tbl.columns) for i in range(tbl.num_rows)]
        if name not in oracles:
            print(f"SKIP  {name}: rows={len(got_rows)} (no oracle)")
            n_skip += 1
            continue
        try:
            res = con.execute(oracles[name])
            exp_cols = [d[0] for d in res.description]
            exp_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        # dtype check mimicking the driver's pandas hash: int64 vs float64
        # renders "54" vs "54.0" there even when values match
        try:
            got_dt = {c: str(t) for c, t in tbl.to_pandas().dtypes.items()}
            exp_df = con.execute(oracles[name]).df()
            exp_dt = {c: str(t) for c, t in exp_df.dtypes.items()}
            dt_bad = [(c, got_dt.get(c), exp_dt.get(c)) for c in got_dt
                      if c in exp_dt and got_dt[c] != exp_dt[c]
                      and {got_dt[c], exp_dt[c]} & {"float64"}]
        except Exception as e:
            dt_bad = [("<dtype-check-error>", str(e), "")]
        gc, gr = normalize(got_cols, got_rows)
        ec, er = normalize(exp_cols, exp_rows)
        if dt_bad:
            print(f"FAIL  {name}: dtype mismatch (driver hash would differ): {dt_bad}")
            n_fail += 1
        elif gc != ec:
            print(f"FAIL  {name}: columns {gc} != {ec}")
            n_fail += 1
        elif len(gr) != len(er):
            print(f"FAIL  {name}: rowcount {len(gr)} != {len(er)}")
            n_fail += 1
        elif gr != er:
            bad = next(i for i in range(len(gr)) if gr[i] != er[i])
            print(f"FAIL  {name}: first diff row {bad}:\n  spark={gr[bad]}\n  duck ={er[bad]}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(gr)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
