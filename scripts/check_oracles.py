#!/usr/bin/env python3
"""Driver-style DuckDB oracle cross-check (the standing 10x sweep gate).

Usage:  python3 scripts/check_oracles.py <sfDir> <verifyOutDir> [artifact.json]

Runs every oracle_sql.json entry in DuckDB over the raw parquet tables,
compares against the Verify main's parquet dumps the way the driver does
(columns sorted by name, rows sorted by all columns, values compared as
strings), and optionally writes a CORRECTNESS-style JSON artifact.

Round 4 found a real one-ulp cross-engine divergence only visible at
sf0.1 (DuckDB DECIMAL literal arithmetic vs IEEE doubles) — hence this
sweep is part of every round's closing evidence, not an ad-hoc probe:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01x"
    python3 scripts/check_oracles.py /root/testdata/sf0.1 /tmp/verify_sf01x \
        CORRECTNESS_sf0.1_rN.json
"""
import duckdb, json, glob, sys, os
import pandas as pd

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def main():
    sf = sys.argv[1]
    out = sys.argv[2]
    artifact = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out, 'oracle_sql.json')))
    report, fails = {}, 0
    for name in sorted(oracle):
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": 0, "oracle_rows": 0,
                 "err": None}
        try:
            exp = con.execute(oracle[name]).df()
            files = glob.glob(os.path.join(out, name, '*.parquet'))
            got = pd.read_parquet(files[0] if files else os.path.join(out, name))
            entry["spark_rows"], entry["oracle_rows"] = len(got), len(exp)
            exp = exp[sorted(exp.columns)].reset_index(drop=True)
            got = got[sorted(got.columns)].reset_index(drop=True)
            entry["schema_match"] = list(exp.columns) == list(got.columns)
            entry["rows_match"] = len(exp) == len(got)
            if entry["schema_match"] and entry["rows_match"]:
                es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
                gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
                entry["hash_match"] = es.astype(str).equals(gs.astype(str))
                if not entry["hash_match"]:
                    for c in exp.columns:
                        if not es[c].astype(str).equals(gs[c].astype(str)):
                            diff = es[c].astype(str) != gs[c].astype(str)
                            i = diff.idxmax()
                            entry["err"] = (f"col {c} first diff row {i}: "
                                            f"oracle={es[c][i]!r} spark={gs[c][i]!r} "
                                            f"({int(diff.sum())} diffs)")
                            break
        except Exception as e:
            entry["err"] = f"{type(e).__name__}: {e}"
        ok = entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
        fails += 0 if ok else 1
        report[name] = entry
        print(f"{name}: {'OK' if ok else 'FAIL'} ({entry['spark_rows']} rows)"
              + (f"  {entry['err']}" if entry["err"] else ""))
    print(f"== {len(report) - fails}/{len(report)} green ==")
    if artifact:
        with open(artifact, 'w') as f:
            json.dump(report, f, indent=1)
    sys.exit(1 if fails else 0)


if __name__ == '__main__':
    main()
