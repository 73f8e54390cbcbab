#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/local_verify.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<query>/ parquet (written by graft.Verify),
runs the matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over
the same <sfDir> tables, and compares after sorting columns by name and
rows by value. Exact equality on every cell (floats compared exactly —
the engine is designed for bit-reproducible oracle queries; loosen only
knowingly).

BOTH result sets go through the pandas path (`.df()`), not `fetchall()`:
that is how a driver-style harness materializes them, and it is stricter
in exactly the way that has burned us — DuckDB renders HUGEINT (any
`sum(BIGINT)`, any `//` chain descending from one) and DECIMAL results
as float64 in pandas, so an oracle column that is "the same integer" via
fetchall hash-mismatches against Spark's int64 parquet. Round 7 shipped
7 such reds that this script, then on fetchall, called green. An oracle
whose DESCRIBE shows HUGEINT/DECIMAL output columns is additionally
flagged loudly even when the compare happens to pass.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

FRAGILE_TYPES = ("HUGEINT", "INT128", "DECIMAL")


def norm_cell(v):
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(norm_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    if v is None or v is pd.NaT or (isinstance(v, type(pd.NA)) and v is pd.NA):
        return "\x00NULL"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    out.sort()
    return [cols[i] for i in idx], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results = {}
    qdirs = sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir())
    for q in qdirs:
        entry = {}
        try:
            sdf = con.execute(f"SELECT * FROM '{out_dir}/{q}/*.parquet'").df()
            scols = list(sdf.columns)
            srows = list(sdf.itertuples(index=False, name=None))
            entry["rows"] = len(srows)
            if q not in oracle:
                entry["status"] = "rows_only"
                entry["ok"] = len(srows) > 0
            else:
                # DESCRIBE returns (column_name, column_type, ...) rows
                fragile = [
                    f"{row[0]}:{row[1]}"
                    for row in con.execute(f"DESCRIBE ({oracle[q]})").fetchall()
                    if any(t in str(row[1]).upper() for t in FRAGILE_TYPES)
                ]
                if fragile:
                    entry["fragile_oracle_types"] = fragile
                odf = con.execute(oracle[q]).df()
                ocols = list(odf.columns)
                orows = list(odf.itertuples(index=False, name=None))
                sc, sr = norm_rows(scols, srows)
                oc, orr = norm_rows(ocols, orows)
                schema_ok = sc == oc
                count_ok = len(sr) == len(orr)
                data_ok = sr == orr
                entry["status"] = "match" if (schema_ok and data_ok) else "MISMATCH"
                entry["ok"] = schema_ok and data_ok
                if not schema_ok:
                    entry["spark_cols"], entry["oracle_cols"] = sc, oc
                if schema_ok and not data_ok:
                    entry["oracle_rows"] = len(orr)
                    diffs = [(a, b) for a, b in zip(sr, orr) if a != b]
                    if count_ok and diffs:
                        entry["first_diff"] = {"spark": diffs[0][0], "oracle": diffs[0][1]}
                    elif not count_ok:
                        sset, oset = set(sr), set(orr)
                        only_s = list(sset - oset)[:2]
                        only_o = list(oset - sset)[:2]
                        entry["only_spark"] = only_s
                        entry["only_oracle"] = only_o
        except Exception as e:
            entry["status"] = "ERROR"
            entry["ok"] = False
            entry["error"] = str(e)[:500]
        results[q] = entry

    # Queries that errored inside graft.Verify write no parquet dir but ARE
    # recorded in errors.json — surface them as failing rows, never silence.
    err_path = Path(out_dir) / "errors.json"
    if err_path.exists():
        for q, msg in json.loads(err_path.read_text()).items():
            results[q] = {"status": "VERIFY_ERROR", "ok": False, "error": msg[:500]}

    missing = [q for q in oracle if q not in qdirs and q not in results]
    n_ok = sum(1 for e in results.values() if e.get("ok"))
    fragile = sorted(q for q, e in results.items() if e.get("fragile_oracle_types"))
    print(json.dumps(results, indent=1, default=str))
    print(f"\n== {n_ok}/{len(results)} ok; missing outputs for oracles: {missing}")
    if fragile:
        print(f"== FRAGILE oracle output types (HUGEINT/DECIMAL render as "
              f"float in the driver's pandas path — CAST them): {fragile}")
    sys.exit(0 if n_ok == len(results) and not missing and not fragile else 1)


if __name__ == "__main__":
    main()
