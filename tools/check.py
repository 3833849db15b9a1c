#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL (from Verify's oracle_sql.json) in DuckDB over the
testdata parquet tables, loads the Spark result parquet written by
Verify, sorts columns by name + rows by value, and compares exactly.
Usage: tools/check.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple((v is None, str(type(v)), str(v)) for v in t)
    return sorted(out, key=key), [cols[i] for i in order]

def eq(a, b):
    if type(a) is float and type(b) is float:
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact — mirrors a hash compare
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql)
            want_rows, want_cols = want.fetchall(), [d[0] for d in want.description]
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        w, wc = canon(want_rows, want_cols)
        g, gc = canon(got_rows, got_cols)
        if [c.lower() for c in wc] != [c.lower() for c in gc]:
            print(f"FAIL {name}: columns differ oracle={wc} spark={gc}")
            n_bad += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: rowcount oracle={len(w)} spark={len(g)}")
            n_bad += 1
            continue
        bad = None
        for i, (rw, rg) in enumerate(zip(w, g)):
            if not all(eq(a, b) for a, b in zip(rw, rg)):
                bad = (i, rw, rg)
                break
        if bad:
            i, rw, rg = bad
            print(f"FAIL {name}: row {i} differs\n  oracle={rw}\n  spark ={rg}")
            diffs = [(c, a, b, (abs(a-b) if type(a) is float and type(b) is float else None))
                     for c, a, b in zip(wc, rw, rg) if not eq(a, b)]
            for c, a, b, d in diffs[:5]:
                print(f"    col {c}: oracle={a!r} spark={b!r} absdiff={d}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - n_bad}/{len(oracle)} queries match")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
