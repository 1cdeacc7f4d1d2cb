#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against the DuckDB oracle and diff values column-by-column.

Usage: python3 tools/check_parity.py [sfDir] [outDir]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import json
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append(round(v, 6))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        # ScaleGen dirs hold Spark-written DIRECTORY tables; the driver's
        # testdata holds single files — accept both
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    # Stale-sidecar refusal (r14): graft.Verify stamps the dataset
    # fingerprint into its outDir AND the shared sidecar root. If a
    # LATER Verify at different data overwrote the sidecars, the oracle
    # would fail with mystery value diffs on every sidecar-replayed key
    # — name the condition instead.
    out_fp_file = out_dir / "data_fingerprint"
    side_fp_file = Path("/tmp/graft_oracle_sidecars/data_fingerprint")
    if out_fp_file.exists() and side_fp_file.exists():
        out_fp, side_fp = out_fp_file.read_text(), side_fp_file.read_text()
        if out_fp != side_fp:
            print(
                f"STALE_SIDECARS: sidecar root was re-written for a different "
                f"dataset (fp {side_fp}) than this verify outDir (fp {out_fp}); "
                f"re-run `sbt \"runMain graft.Verify {sf_dir} {out_dir}\"` to "
                f"restore matching sidecars before comparing"
            )
            sys.exit(2)
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = out_dir / name
        if not pdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got_tbl = pq.read_table(pdir)
            got_cols = sorted(got_tbl.column_names)
            got = canon(zip(*[got_tbl.column(c).to_pylist() for c in got_cols])) if got_tbl.num_rows else []
            res = con.sql(sql)
            exp_cols_all = res.columns
            order = sorted(range(len(exp_cols_all)), key=lambda i: exp_cols_all[i])
            exp_cols = [exp_cols_all[i] for i in order]
            rows = res.fetchall()
            exp = canon([tuple(r[i] for i in order) for r in rows])
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif got != exp:
            diff_g = [r for r in got if r not in exp][:3]
            diff_e = [r for r in exp if r not in got][:3]
            print(f"FAIL {name}: {len(got)} vs {len(exp)} rows; spark-only={diff_g} oracle-only={diff_e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
