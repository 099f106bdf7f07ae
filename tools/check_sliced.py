#!/usr/bin/env python3
"""Compositional oracle check for per-key-independent queries at 100x.

Some oracles are DuckDB-infeasible at the 100x fixture as ONE query
(asof: a 20M x 20M ASOF join ground >20 min at 100 GB RSS), but the
OPERATOR is independent per key: every output row of an as-of join
derives only from input rows of the SAME user_id. So slicing BOTH the
inputs and the comparison by user_id % N yields N small oracles whose
union is EXACTLY the full answer - the dedup_cluster/dedup_embedding
compositional recipe applied to temporal joins.

Usage: check_sliced.py <sfDir> <verifyOutDir> <query> <sliceCol> <N>

The slice column must exist in the query OUTPUT and every input row
contributing to an output row must share its slice value (true for
keyed windows/joins partitioned by that key). Each slice runs on a
fresh connection with views filtered to the slice, so one slice's
failure cannot poison the rest.
"""
import sys, json, glob, os
import pandas as pd
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
# which tables carry the slice column per known slice col
SLICE_COLS = {"user_id": ["events"], "doc_id": ["documents"], "vec_id": ["embeddings"]}


def norm_cell(v):
    import math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def fingerprint(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return [tuple(norm_cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]


def main(sf_dir, out_dir, query, slice_col, n):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))[query]
    files = sorted(glob.glob(f"{out_dir}/{query}/*.parquet"))
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    sliced_tables = SLICE_COLS[slice_col]
    total = 0
    for k in range(n):
        con = duckdb.connect()
        mem = os.environ.get("DUCKDB_MEM")
        if mem:
            con.execute(f"SET memory_limit='{mem}'")
            con.execute("SET temp_directory='.tmp'")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else \
                  f"read_parquet('{p}')" if os.path.exists(p) else None
            if src is None:
                continue
            where = f" WHERE {slice_col} % {n} = {k}" if t in sliced_tables else ""
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}{where}")
        exp = con.execute(oracle).df()
        con.close()
        gs = got[got[slice_col] % n == k]
        a, b = fingerprint(gs), fingerprint(exp)
        if len(a) != len(b):
            print(f"FAIL slice {k}: rows {len(a)} != {len(b)}", flush=True)
            return 1
        if a != b:
            bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            print(f"FAIL slice {k} row {bad}:\n  spark={a[bad]}\n  duck ={b[bad]}", flush=True)
            return 1
        total += len(a)
        print(f"ok slice {k}: {len(a)} rows", flush=True)
    if total != len(got):
        print(f"FAIL: slices cover {total} of {len(got)} spark rows")
        return 1
    print(f"OK {query}: {total} rows matched across {n} slices")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4], int(sys.argv[5])))
