#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir tables, and
compares: schema (column names, sorted), row count, and a value hash over
rows with columns sorted by name. Mirrors (our best understanding of) the
driver gate so oracle-parity bugs surface before the round ends.

Dev-only tool: runs driver-side python (duckdb/pandas). The Scala library
itself has no python dependency.
"""
import sys, json, glob, os, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # tolerate float formatting differences at 1e-9 relative
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_fingerprint(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return list(df.columns), len(rows), rows


def kind(dtype):
    """Coarse type class for the int-vs-float gate: the driver hashes
    type-faithfully ('195932288' vs '195932288.0'), but norm_cell's %.9g
    collapses exact-integer floats back to the integer rendering, so a
    DuckDB HUGEINT/DOUBLE aggregate against a Spark BIGINT column passes
    locally while failing the driver (events_incident_overlap, round 10).
    Flagging the dtype-kind mismatch reproduces the driver's verdict."""
    k = getattr(dtype, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    return "other"


def type_mismatches(got: pd.DataFrame, exp: pd.DataFrame):
    bad = []
    for c in got.columns:
        if c not in exp.columns:
            continue
        gk, ek = kind(got[c].dtype), kind(exp[c].dtype)
        if {gk, ek} == {"int", "float"}:
            bad.append(f"{c}: spark={got[c].dtype} oracle={exp[c].dtype}")
    return bad


def fresh_con(sf_dir):
    """One connection per query at big fixtures: a DuckDB OOM poisons the
    connection (every later query fails 'bad allocation'), so isolation
    turns one infeasible oracle into one FAIL line instead of a cascade.
    DUCKDB_MEM (e.g. '80GB') caps the allocator below the box so the OOM
    is an exception, not a process death."""
    con = duckdb.connect()
    mem = os.environ.get("DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute("SET temp_directory='.tmp'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written directory layout (e.g. ScaleData 10x fixture)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def main(sf_dir, out_dir, only=None):
    per_query_con = os.environ.get("DUCKDB_PER_QUERY_CON") == "1"
    con = None if per_query_con else fresh_con(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(
        os.path.basename(d.rstrip("/"))
        for d in glob.glob(f"{out_dir}/*/")
    )
    if only:
        names = [n for n in names if n in only]
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output parquet", flush=True)
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            status = "ROWS" if len(got) > 0 else "FAIL(empty)"
            print(f"{status:5s} {name}: rows={len(got)} (no oracle)", flush=True)
            n_rowsonly += 1
            continue
        qcon = None
        try:
            qcon = fresh_con(sf_dir) if per_query_con else con
            exp = qcon.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}", flush=True)
            n_fail += 1
            continue
        finally:
            # close per-query connections on BOTH paths: a failing query
            # used to skip the close, leaking one connection (and its
            # memory_limit reservation) per failure over a long run
            if per_query_con and qcon is not None:
                qcon.close()
        gc, gn, gr = frame_fingerprint(got)
        ec, en, er = frame_fingerprint(exp)
        tm = type_mismatches(got, exp)
        if tm:
            print(f"FAIL  {name}: int/float type drift (driver hashes type-faithfully): {tm}")
            n_fail += 1
        elif gc != ec:
            print(f"FAIL  {name}: columns {gc} != {ec}")
            n_fail += 1
        elif gn != en:
            print(f"FAIL  {name}: rowcount {gn} != {en}")
            n_fail += 1
        elif gr != er:
            bad = next(i for i, (a, b) in enumerate(zip(gr, er)) if a != b)
            print(f"FAIL  {name}: first diff at row {bad}:\n  spark={gr[bad]}\n  duck ={er[bad]}")
            n_fail += 1
        else:
            print(f"OK    {name}: rows={gn}", flush=True)
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    subset = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], subset))
