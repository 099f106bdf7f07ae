#!/usr/bin/env python3
"""Compositional 100x exactness check for dedup_embedding.

The full-corpus DuckDB oracle OOMs at 100x (round-7 finding), but
dedup_embedding's candidate pairs are LABEL-BLOCKED — a pair never
crosses labels — so per-label oracle slices compose EXACTLY to the full
answer (the dedup_cluster recipe applied to embeddings). For each label
this script rebuilds the bucketing and the exact decimal rescore over
that label's vectors only, then compares the union of slices with
Spark's output parquet row-for-row.

Bucketing is generated as LITERAL per-plane projection expressions
(md5-derived coefficients printed as round-trip double literals;
left-to-right addition = the engine's fused-loop order), because the
unnest-join + ordered-sum formulation the sf-scale oracle uses hits
DuckDB's non-spillable ordered aggregate at 100x. bits follows the same
integer rule the engine derives: smallest b >= 4 with 2^b*200 >= FULL
corpus count.

Usage: check_emb100.py <sfDir> <sparkOutDir> [tau=0.99]

Run Spark first, e.g.:
  SPARK_GRAFT_CONF=spark.graft.dedup.embTau=0.6 \
    tools/run.sh graft.Verify /tmp/graft-sfx100 /tmp/emb100 dedup_embedding
"""
import sys, glob, json, hashlib
import pandas as pd  # noqa: F401  (import C extensions before DuckDB reserves memory)
import duckdb

NBANDS, DIMS = 4, 64


def plane_coefs(p):
    """Mirror HyperplaneBuckets.planes: md5(p_i)[:6 hex] / 2^23 - 1."""
    return [int(hashlib.md5(f"{p}_{i}".encode()).hexdigest()[:6], 16) / 8388608.0 - 1.0
            for i in range(DIMS)]


def proj_expr(p):
    # left-to-right addition matches the engine's fused-loop order;
    # repr() round-trips each double exactly
    return " + ".join(f"CAST(embedding[{i + 1}] AS DOUBLE) * {c!r}"
                      for i, c in enumerate(plane_coefs(p)))


def bucket_expr(band, bits):
    terms = [f"(CASE WHEN {proj_expr(band * bits + j)} >= 0.0 "
             f"THEN {1 << (bits - 1 - j)} ELSE 0 END)" for j in range(bits)]
    return " + ".join(terms)


def buckets_sql(label, bits):
    bands = "\nUNION ALL\n".join(
        f"SELECT vec_id, {b} AS band, ({bucket_expr(b, bits)}) AS bucket\n"
        f"FROM embeddings WHERE label = {label}" for b in range(NBANDS))
    return f"CREATE OR REPLACE TEMP TABLE buckets_l AS\n{bands}"


# decimal dot as a LITERAL 64-term chain over the array columns: the
# unnest-join + group-by formulation let DuckDB pick a join order that
# exploded into a spill measured in tens of GB per label; the literal
# chain is one expression per candidate row. Parity is unaffected:
# decimal addition is EXACT, so any summation order gives the engine's
# DecimalDotProduct value (same per-term double product → DECIMAL cast).
def dot_dec(a, b):
    return " + ".join(
        f"CAST(CAST({a}.embedding[{i + 1}] AS DOUBLE) * CAST({b}.embedding[{i + 1}] AS DOUBLE) AS DECIMAL(38,12))"
        for i in range(DIMS))


PAIRS_SQL_TMPL = """
CREATE OR REPLACE TEMP TABLE pairs_l AS
WITH cand AS (
  SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
  FROM buckets_l a
  JOIN buckets_l b ON b.band = a.band AND b.bucket = a.bucket AND a.vec_id < b.vec_id)
SELECT c.d1, c.d2,
       CAST(({dot_ab}) AS DOUBLE)
         / sqrt(CAST(({n_a}) AS DOUBLE) * CAST(({n_b}) AS DOUBLE)) AS cosine
FROM cand c
JOIN embeddings a ON a.vec_id = c.d1
JOIN embeddings b ON b.vec_id = c.d2
"""


def pairs_sql():
    return PAIRS_SQL_TMPL.format(dot_ab=dot_dec("a", "b"),
                                 n_a=dot_dec("a", "a"), n_b=dot_dec("b", "b"))


def main(sf_dir, out_dir, tau):
    con = duckdb.connect()
    con.execute("SET temp_directory='/var/tmp/duck_tmp'")
    con.execute("SET memory_limit='40GB'")
    pat = f"{sf_dir}/embeddings.parquet/*.parquet" if glob.glob(
        f"{sf_dir}/embeddings.parquet/*.parquet") else f"{sf_dir}/embeddings.parquet"
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{pat}')")
    labels = [r[0] for r in con.execute(
        "SELECT DISTINCT label FROM embeddings ORDER BY label").fetchall()]
    n = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    bits = next(b for b in range(4, 31) if (1 << b) * 200 >= n)
    print(f"corpus={n} derived bits={bits}", flush=True)
    oracle_rows = []
    stats = {}
    for lb in labels:
        con.execute(buckets_sql(lb, bits))
        con.execute(pairs_sql())
        n_cand, max_cos, n_final = con.execute(
            f"SELECT count(*), max(cosine), count(*) FILTER (cosine >= {tau}) FROM pairs_l"
        ).fetchone()
        stats[lb] = dict(n_cand=n_cand, max_cos=max_cos, n_final=n_final)
        print(f"label {lb}: candidates={n_cand} max_cos={max_cos} pairs>=tau={n_final}",
              flush=True)
        if n_final:
            oracle_rows.append(con.execute(
                f"SELECT d1, d2, {lb} AS label, round(cosine, 9) AS cosine "
                f"FROM pairs_l WHERE cosine >= {tau} ORDER BY d1, d2").df())
    oracle = (pd.concat(oracle_rows, ignore_index=True) if oracle_rows
              else pd.DataFrame(columns=["d1", "d2", "label", "cosine"]))
    oracle = oracle.sort_values(["d1", "d2"]).reset_index(drop=True)

    spark_files = sorted(glob.glob(f"{out_dir}/dedup_embedding/*.parquet"))
    spark = (pd.concat([pd.read_parquet(f) for f in spark_files], ignore_index=True)
             if spark_files else pd.DataFrame(columns=["d1", "d2", "label", "cosine"]))
    spark = spark.sort_values(["d1", "d2"]).reset_index(drop=True)

    ok = len(spark) == len(oracle)
    if ok and len(spark):
        for c in ["d1", "d2", "label"]:
            ok = ok and (spark[c].astype("int64").values == oracle[c].astype("int64").values).all()
        ok = ok and all(f"{a:.9g}" == f"{b:.9g}"
                        for a, b in zip(spark["cosine"], oracle["cosine"]))
    print(json.dumps({"tau": tau, "spark_rows": len(spark),
                      "oracle_rows": len(oracle), "match": bool(ok),
                      "total_candidates": sum(s["n_cand"] for s in stats.values()),
                      "max_cos": max((s["max_cos"] or -2) for s in stats.values())}))
    return 0 if ok else 1


if __name__ == "__main__":
    tau = float(sys.argv[3]) if len(sys.argv) > 3 else 0.99
    sys.exit(main(sys.argv[1], sys.argv[2], tau))
