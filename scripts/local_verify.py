#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/local_verify.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<query>/ parquet (written by graft.Verify),
runs the matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over
the same <sfDir> tables, and compares after sorting columns by name and
rows by value. Exact equality on every cell (floats compared exactly —
the engine is designed for bit-reproducible oracle queries; loosen only
knowingly).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    return str(v) if v is not None else "\x00NULL"


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
            r = con.execute(f"SELECT * FROM '{out_dir}/{q}/*.parquet'")
            scols = [d[0] for d in r.description]
            srows = r.fetchall()
            entry["rows"] = len(srows)
            if q not in oracle:
                entry["status"] = "rows_only"
                entry["ok"] = len(srows) > 0
            else:
                r2 = con.execute(oracle[q])
                ocols = [d[0] for d in r2.description]
                orows = r2.fetchall()
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
    print(json.dumps(results, indent=1, default=str))
    print(f"\n== {n_ok}/{len(results)} ok; missing outputs for oracles: {missing}")
    sys.exit(0 if n_ok == len(results) and not missing else 1)


if __name__ == "__main__":
    main()
