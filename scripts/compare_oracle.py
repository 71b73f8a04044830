#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate:
run each SparkEntry.oracleSql in DuckDB over the sf parquet tables and
compare with the Verify parquet dumps (columns sorted by name, rows sorted,
values compared after canonicalization).

Usage: python3 scripts/compare_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa
import glob
import os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(table: pa.Table):
    """Columns sorted by name; rows sorted; values as python objects."""
    cols = sorted(table.column_names)
    rows = []
    data = {c: table.column(c).to_pylist() for c in cols}
    n = table.num_rows
    for i in range(n):
        rows.append(tuple(data[c][i] for c in cols))
    return cols, sorted(rows, key=lambda r: tuple(
        (x is None, str(type(x)), x) for x in r))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pa.concat_tables([pq.read_table(f) for f in files])
        try:
            exp = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        gc, gr = canon(got)
        ec, er = canon(exp)
        # Oracle-schema lint: the driver's hash is TYPE-sensitive.
        # DuckDB SUM(BIGINT) surfaces as decimal128(38,0) (hugeint);
        # if the Spark side isn't decimal too, the hash mismatches even
        # when every value is identical (rounds 6-8 red root cause).
        # Flag it as a hard FAIL here so it never reaches the driver.
        type_errs = []
        for c in set(gc) & set(ec):
            gt = got.schema.field(c).type
            et = exp.schema.field(c).type
            if pa.types.is_decimal(et) != pa.types.is_decimal(gt):
                type_errs.append(
                    f"{c}: spark={gt} oracle={et} "
                    "(uncast SUM? wrap oracle in CAST(... AS BIGINT))")
        if type_errs:
            print(f"FAIL {name}: oracle type drift: {type_errs}")
            n_fail += 1
        elif gc != ec:
            print(f"FAIL {name}: cols {gc} != {ec}")
            n_fail += 1
        elif len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
            n_fail += 1
        elif gr != er:
            bad = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {bad}")
            n_fail += 1
        else:
            n_pass += 1
            print(f"ok   {name} ({len(gr)} rows)")
    # queries without oracle: rows-only
    for d in sorted(glob.glob(f"{out_dir}/q_*")):
        name = os.path.basename(d)
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            nr = sum(pq.read_metadata(f).num_rows for f in files) \
                if files else -1
            print(f"rows {name}: {nr}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
