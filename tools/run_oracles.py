#!/usr/bin/env python3
"""Execute every oracle SQL string in DuckDB against a parquet dir.

CI harness for the oracle TEXT itself: two driver-gate incidents
(q63's teleport-constant ulp, the r6 uncast-sum type bug) lived in
oracle SQL, not engine code, and only surfaced in the driver's gate.
OracleSpec shells out here during `sbt test` so a parse error, a
missing table, a bad CTE, or an error()-guard trip in any oracle
fails CI immediately. Value/type parity vs Spark remains
check_oracle.py's job — this gate proves every oracle RUNS.

Usage: python3 tools/run_oracles.py <oracle_sql.json> <sf_dir>
Exit 0 if every oracle executes; 1 otherwise (failures listed).
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sql_file, sf_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(sql_file))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failed = []
    for name in sorted(oracles):
        try:
            con.sql(oracles[name]).fetchall()
        except Exception as e:
            msg = str(e).replace("\n", " ")[:200]
            failed.append(f"{name}: {msg}")
    if failed:
        print(f"ORACLE-EXEC FAIL {len(failed)}/{len(oracles)}:")
        for f in failed:
            print(f"  {f}")
        sys.exit(1)
    print(f"ORACLE-EXEC OK {len(oracles)}/{len(oracles)}")


if __name__ == "__main__":
    main()
