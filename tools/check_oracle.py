#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB executing SparkEntry.oracleSql on the same parquet tables.

Usage: python3 tools/check_oracle.py SF_DIR OUT_DIR [query ...]
"""
import sys, os, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    """Sort columns by name, then rows by stringified values."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    out.sort(key=lambda r: tuple("" if v is None else str(v) for v in r))
    return [cols[i] for i in idx], out

def close(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fam_path = f"{out_dir}/families.json"
    families = json.load(open(fam_path)) if os.path.exists(fam_path) else {}
    tally = {}  # family -> [pass, fail]
    n_pass = n_fail = 0
    def record(name, ok):
        t = tally.setdefault(families.get(name, "untagged"), [0, 0])
        t[0 if ok else 1] += 1
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_path = f"{out_dir}/{name}"
        if not glob.glob(f"{spark_path}/*.parquet"):
            print(f"FAIL {name}: no spark output at {spark_path}")
            n_fail += 1; record(name, False)
            continue
        try:
            s = con.sql(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
            scols, srows = s.columns, s.fetchall()
            o = con.sql(oracle[name])
            ocols, orows = o.columns, o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1; record(name, False)
            continue
        sc, sr = canon(srows, [c.lower() for c in scols])
        oc, orr = canon(orows, [c.lower() for c in ocols])
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs oracle {oc}")
            n_fail += 1; record(name, False)
            continue
        if len(sr) != len(orr):
            print(f"FAIL {name}: {len(sr)} rows vs oracle {len(orr)}")
            n_fail += 1; record(name, False)
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, orr)):
            for j, (x, y) in enumerate(zip(a, b)):
                if not close(x, y):
                    bad = (i, sc[j], x, y)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]} oracle={bad[3]}")
            n_fail += 1; record(name, False)
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1; record(name, True)
    if tally:
        print("-- by family --")
        for fam in sorted(tally):
            ok, bad = tally[fam]
            mark = "" if bad == 0 else "  <-- REGRESSION"
            print(f"  {fam}: {ok}/{ok + bad}{mark}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
