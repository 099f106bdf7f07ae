#!/usr/bin/env python3
"""Compositional 100x exactness check for dedup_embedding.

The full-corpus DuckDB oracle OOMs at 100x (round-7 finding), but
dedup_embedding's candidate pairs are LABEL-BLOCKED — a pair never
crosses labels — so per-label oracle slices compose EXACTLY to the full
answer (the dedup_cluster recipe applied to embeddings). For each label
this script rebuilds the bucketing (bits derived from the FULL corpus
count, matching the engine) and the exact decimal rescore over that
label's vectors only, then compares the union of slices with Spark's
output parquet row-for-row.

Usage: check_emb100.py <sfDir> <sparkOutDir> [tau=0.99]

Run Spark first, e.g.:
  SPARK_GRAFT_CONF=spark.graft.dedup.embTau=0.6 \
    tools/run.sh graft.Verify /tmp/graft-sfx100 /tmp/emb100 dedup_embedding
"""
import sys, glob, json
import pandas as pd  # noqa: F401  (import C extensions before DuckDB reserves memory)
import duckdb

SLICE_SQL = """
WITH ex AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS x
            FROM embeddings WHERE label = {label}),
norms AS (
  SELECT vec_id,
         sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS n2
  FROM ex GROUP BY vec_id),
-- {{bits}} is inlined by the runner: smallest b >= 4 with 2^b*200 >= FULL
-- corpus count — the same integer rule the engine and the driver-gate
-- oracle derive in SQL (scalar-subquery-parameterized CTEs planned
-- catastrophically in DuckDB at this scale, so the constant is bound here)
planes AS (
  SELECT p, i,
         ('0x' || substr(md5(CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 6))::INTEGER
           / 8388608.0 - 1.0 AS c
  FROM (SELECT unnest(generate_series(0, 4 * {bits} - 1)) AS p),
       (SELECT unnest(generate_series(0, 63)) AS i)),
projections AS (
  SELECT e.vec_id, pl.p, sum(pl.c * CAST(e.x AS DOUBLE) ORDER BY pl.i) AS proj
  FROM ex e JOIN planes pl ON pl.i = e.i - 1
  GROUP BY e.vec_id, pl.p),
buckets AS (
  SELECT vec_id, p // {bits} AS band,
         CAST(sum(CASE WHEN proj >= 0
                       THEN (CAST(1 AS BIGINT) << ({bits} - 1 - p % {bits}))
                       ELSE 0 END) AS INTEGER) AS bucket
  FROM projections GROUP BY vec_id, p // {bits}),
cand AS (
  SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
  FROM buckets a
  JOIN buckets b ON b.band = a.band AND b.bucket = a.bucket AND a.vec_id < b.vec_id),
pairs AS (
  SELECT c.d1, c.d2,
         CAST(sum(CAST(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
           / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cosine
  FROM cand c
  JOIN ex a ON a.vec_id = c.d1
  JOIN ex b ON b.vec_id = c.d2 AND b.i = a.i
  JOIN norms na ON na.vec_id = c.d1
  JOIN norms nb ON nb.vec_id = c.d2
  GROUP BY c.d1, c.d2, na.n2, nb.n2)
SELECT (SELECT count(*) FROM cand) AS n_cand,
       (SELECT max(cosine) FROM pairs) AS max_cos,
       (SELECT count(*) FROM pairs WHERE cosine >= {tau}) AS n_final
"""

PAIR_SQL = SLICE_SQL.split("SELECT (SELECT")[0] + """
SELECT d1, d2, {label} AS label, round(cosine, 9) AS cosine
FROM pairs WHERE cosine >= {tau} ORDER BY d1, d2
"""


def main(sf_dir, out_dir, tau):
    con = duckdb.connect()
    con.execute("SET temp_directory='/var/tmp/duck_tmp'")
    con.execute("SET memory_limit='24GB'")
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
        n_cand, max_cos, n_final = con.execute(
            SLICE_SQL.format(label=lb, tau=tau, bits=bits)).fetchone()
        stats[lb] = dict(n_cand=n_cand, max_cos=max_cos, n_final=n_final)
        print(f"label {lb}: candidates={n_cand} max_cos={max_cos} pairs>=tau={n_final}",
              flush=True)
        if n_final:
            oracle_rows.append(con.execute(
                PAIR_SQL.format(label=lb, tau=tau, bits=bits)).df())
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
