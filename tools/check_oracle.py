#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate — TYPED.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet written by graft.Verify (via pyarrow, so we
see the physical types Spark actually wrote), runs the matching oracle
SQL from oracle_sql.json in DuckDB (arrow result, so we see the
physical types DuckDB actually produced), and compares:

  1. column names (sorted),
  2. ARROW PHYSICAL TYPES per column — the round-6 lesson: DuckDB's
     uncast sum(<int>) is decimal128(38,0) (HUGEINT) while Spark emits
     int64; the old value-stringified compare collapsed both to "5" and
     passed locally while the driver's typed hash failed. Type
     divergence is now a hard FAIL *before* any value comparison.
  3. row count,
  4. a hash over the sorted row values (floats rounded to 9 significant
     digits to absorb ulp noise — treat a value-NEAR as "check by eye").

Type canonicalization mirrors the driver's observed behavior
(calibrated round 7 against CORRECTNESS_r06): the driver hashes
PYTHON-level values, so integer widths collapse (int32 vs int64 both
green in r6: q17-q20, q39, q55, q74) and float32/float64 collapse, but
decimal-vs-int (the r6 q62/q72/q75/q76 failure), bool-vs-int and
str-vs-number stay DISTINCT.
"""
import sys, json, glob, math, hashlib
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_type(t):
    """Canonical string for an arrow type at the granularity the
    driver's hash distinguishes: python-value classes. Integer widths
    and float widths collapse; decimal / bool / string / timestamp stay
    distinct from the numeric families."""
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{f.name}:{canon_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


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


def rows_of(tbl):
    """pa.Table -> list of python-value tuples (column order of tbl)."""
    cols = [c.to_pylist() for c in tbl.columns]
    return list(zip(*cols)) if cols else []


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
    # self-gating markers (VERDICT r14 item 6): Verify emits
    # query_modes.json for the EXPLICITLY DECLARED self-gating queries
    # (SparkEntry.selfGating — correctness checked INSIDE the query,
    # rows>0 IS the verification). A missing sidecar means the out_dir
    # predates the r15 Verify — the remedy is regenerating it, not
    # touching queries, so that case is reported once, not per query.
    try:
        modes = json.load(open(f"{out_dir}/query_modes.json"))
    except FileNotFoundError:
        modes = None
    if modes is None:
        print("NOTE: no query_modes.json in out_dir (pre-r15 Verify?) "
              "- oracle-less queries reported as rows-only, unmarked; "
              "regenerate with the current graft.Verify to validate "
              "self-gating declarations")
    ok = fail = skip = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        files = sorted(glob.glob(f"{d}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output")
            fail += 1
            continue
        got = pa.concat_tables([pq.read_table(f) for f in files])
        got_cols = got.column_names
        got_types = {c: canon_type(got.schema.field(c).type)
                     for c in got_cols}
        if name not in oracle:
            if modes is None:
                print(f"SKIP {name}: rows-only, unmarked "
                      f"({got.num_rows} rows)")
                skip += 1
            elif name in modes:
                # ADVICE r15: the declared contract is that rows>0 IS
                # the verification (q16 emits rows only when its
                # histogram cross-check passes; q41's require() gates
                # its output) — so zero rows means the internal gate
                # FAILED, not that there is nothing to check
                if got.num_rows == 0:
                    print(f"FAIL {name}: declared {modes[name]} but "
                          "emitted 0 rows - the in-query correctness "
                          "gate did not pass")
                    fail += 1
                else:
                    print(f"SKIP {name}: {modes[name]} "
                          f"({got.num_rows} rows)")
                    skip += 1
            else:
                print(f"FAIL {name}: no oracle and not declared "
                      "self-gating - register an oracle or (with an "
                      "in-query correctness check) add it to "
                      "SparkEntry.selfGating")
                fail += 1
            continue
        try:
            exp = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fail += 1
            continue
        exp_cols = exp.column_names
        exp_types = {c: canon_type(exp.schema.field(c).type)
                     for c in exp_cols}
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)}"
                  f" != {sorted(exp_cols)}")
            fail += 1
            continue
        type_diff = [(c, got_types[c], exp_types[c])
                     for c in sorted(got_cols)
                     if got_types[c] != exp_types[c]]
        if type_diff:
            print(f"FAIL {name}: TYPE mismatch (driver hash is typed):")
            for c, g, e in type_diff:
                print(f"  {c}: spark={g} oracle={e}")
            fail += 1
            continue
        if got.num_rows != exp.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} != {exp.num_rows}")
            fail += 1
            continue
        grows, erows = rows_of(got), rows_of(exp)
        hg = table_hash(got_cols, grows)
        he = table_hash(exp_cols, erows)
        if hg == he:
            print(f"OK   {name}: {got.num_rows} rows")
            ok += 1
        else:
            print(f"FAIL {name}: hash mismatch ({got.num_rows} rows)")
            order = sorted(range(len(got_cols)),
                           key=lambda i: got_cols[i])
            gl = sorted("|".join(norm(r[i]) for i in order)
                        for r in grows)
            eo = sorted(range(len(exp_cols)),
                        key=lambda i: exp_cols[i])
            el = sorted("|".join(norm(r[i]) for i in eo)
                        for r in erows)
            for g, e in zip(gl, el):
                if g != e:
                    print(f"  got: {g}\n  exp: {e}")
                    break
            fail += 1
    print(f"\n{ok} ok, {fail} fail, {skip} rows-only")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
