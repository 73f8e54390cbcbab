#!/usr/bin/env python3
"""DuckDB side of the randomized differential harness (DifferentialFuzzSpec).

Usage: python3 scripts/fuzz_verify.py <tablesDir> <outDir>

Like local_verify.py, but the table set is whatever parquet files sit in
<tablesDir> (the spec's seeded random frames) instead of the fixed
testdata tables: each <tablesDir>/<name>.parquet becomes a DuckDB view
<name>. Every query dir under <outDir> is compared against the matching
SQL in <outDir>/oracle_sql.json with the SAME normalization the driver
gate uses (columns sorted by name, rows sorted, exact cell compare via
the pandas path). Exit 0 iff every case matches and no oracle output
column has a fragile (HUGEINT/DECIMAL) type.
"""
import json
import sys
from pathlib import Path

import duckdb

# reuse the driver-style normalization + fragile-type discipline
sys.path.insert(0, str(Path(__file__).resolve().parent))
from local_verify import FRAGILE_TYPES, norm_rows  # noqa: E402


def main():
    tables_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for p in sorted(Path(tables_dir).glob("*.parquet")):
        # Spark writes a DIRECTORY named <name>.parquet
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM '{src}'")

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
                entry["status"] = "NO_ORACLE"
                entry["ok"] = False
            else:
                fragile = [
                    f"{row[0]}:{row[1]}"
                    for row in con.execute(f"DESCRIBE ({oracle[q]})").fetchall()
                    if any(t in str(row[1]).upper() for t in FRAGILE_TYPES)
                ]
                if fragile:
                    entry["fragile_oracle_types"] = fragile
                odf = con.execute(oracle[q]).df()
                sc, sr = norm_rows(scols, srows)
                oc, orr = norm_rows(
                    list(odf.columns),
                    list(odf.itertuples(index=False, name=None)))
                entry["ok"] = sc == oc and sr == orr and not fragile
                entry["status"] = "match" if entry["ok"] else "MISMATCH"
                if sc != oc:
                    entry["spark_cols"], entry["oracle_cols"] = sc, oc
                elif sr != orr:
                    entry["oracle_rows"] = len(orr)
                    diffs = [(a, b) for a, b in zip(sr, orr) if a != b]
                    if diffs and len(sr) == len(orr):
                        entry["first_diff"] = {
                            "spark": diffs[0][0], "oracle": diffs[0][1]}
                    else:
                        sset, oset = set(sr), set(orr)
                        entry["only_spark"] = list(sset - oset)[:2]
                        entry["only_oracle"] = list(oset - sset)[:2]
        except Exception as e:
            entry["status"] = "ERROR"
            entry["ok"] = False
            entry["error"] = str(e)[:500]
        results[q] = entry

    n_ok = sum(1 for e in results.values() if e.get("ok"))
    print(json.dumps(results, indent=1, default=str))
    print(f"== fuzz {n_ok}/{len(results)} ok")
    sys.exit(0 if n_ok == len(results) and len(results) == len(oracle) else 1)


if __name__ == "__main__":
    main()
