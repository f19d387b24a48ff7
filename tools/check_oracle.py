#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables, and
compares: column names (sorted), row count, and a hash over the sorted
row values (floats rounded to 9 significant digits to absorb ulp noise
the driver's hash may or may not absorb — treat NEAR as "check by eye").
"""
import sys, json, glob, math, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = skip = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            fail += 1
            continue
        got_cols = [desc[0] for desc in con.execute(
            f"SELECT * FROM '{d}/*.parquet' LIMIT 0").description]
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchall()
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({len(got)} rows)")
            skip += 1
            continue
        try:
            res = con.execute(oracle[name])
            exp_cols = [desc[0] for desc in res.description]
            exp = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            fail += 1
            continue
        hg, he = table_hash(got_cols, got), table_hash(exp_cols, exp)
        if hg == he:
            print(f"OK   {name}: {len(got)} rows")
            ok += 1
        else:
            print(f"FAIL {name}: hash mismatch ({len(got)} rows)")
            order = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            gl = sorted("|".join(norm(r[i]) for i in order) for r in got)
            eo = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
            el = sorted("|".join(norm(r[i]) for i in eo) for r in exp)
            for g, e in zip(gl, el):
                if g != e:
                    print(f"  got: {g}\n  exp: {e}")
                    break
            fail += 1
    print(f"\n{ok} ok, {fail} fail, {skip} rows-only")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
