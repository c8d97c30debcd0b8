#!/usr/bin/env python3
"""Full-precision per-value diff of Spark verify output vs the DuckDB oracle.
Usage: python3 tools/diff_full.py SF_DIR OUT_DIR query [query ...]"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    out.sort(key=lambda r: tuple("" if v is None else str(v) for v in r))
    return [cols[i] for i in idx], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    for name in names:
        s = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        scols, srows = s.columns, s.fetchall()
        o = con.sql(oracle[name])
        ocols, orows = o.columns, o.fetchall()
        sc, sr = canon(srows, [c.lower() for c in scols])
        oc, orr = canon(orows, [c.lower() for c in ocols])
        print(f"== {name} cols={sc}")
        nshow = 0
        if len(sr) != len(orr):
            print(f"  ROW COUNT MISMATCH: spark={len(sr)} oracle={len(orr)}")
            nshow += 1
        for i, (a, b) in enumerate(zip(sr, orr)):
            for j, (x, yv) in enumerate(zip(a, b)):
                if isinstance(x, float) or isinstance(yv, float):
                    try:
                        fx, fy = float(x), float(yv)
                        rel = abs(fx - fy) / max(1.0, abs(fx), abs(fy))
                        if rel > 1e-13:
                            print(f"  row {i} {sc[j]}: spark={x!r} oracle={yv!r} rel={rel:.2e}")
                            nshow += 1
                    except (TypeError, ValueError):
                        pass
                elif x != yv:
                    print(f"  row {i} {sc[j]}: spark={x!r} oracle={yv!r}")
                    nshow += 1
                if nshow > 20:
                    break
            if nshow > 20:
                break
        if nshow == 0:
            print("  (all values agree to 1e-13)")

if __name__ == "__main__":
    main()
