#!/usr/bin/env python3
"""Compositional 100x exactness check for dedup_semantic.

The full-corpus DuckDB oracle OOMs at 100x in the hyperplane-bucket
CTEs (the unnest-join ordered-sum problem check_emb100.py documents),
and the assignment CTE re-derives what emb_kmeans' own 100x check
already verifies bit-for-bit. So this check is compositional in BOTH
inputs: GIVEN the engine's verified cluster assignment (the dumped
emb_kmeans parquet — (vec_id, cluster_id), full-oracled at 100x by the
assignMembersSql recipe) it rebuilds, per cluster, the (band, bucket)
blocking with literal plane-projection expressions and the exact
decimal pair verify at tau, derives drops = the higher id of every
confirmed pair, and compares per-vector kept flags with Spark's
dedup_semantic output row-for-row.

Usage: check_sem100.py <sfDir> <sparkOutDir> [tau=0.99]

Run Spark first:
  tools/run.sh graft.Verify /tmp/graft-sf100x /tmp/verify_100x \
      dedup_semantic,emb_kmeans
"""
import sys, glob
import pandas as pd
import duckdb

from check_emb100 import buckets_sql as _unused  # noqa: F401 (import check)
from check_emb100 import bucket_expr, pairs_sql, NBANDS


def cluster_buckets_sql(cid, bits):
    bands = "\nUNION ALL\n".join(
        f"SELECT e.vec_id, {b} AS band, ({bucket_expr(b, bits)}) AS bucket\n"
        f"FROM embeddings e JOIN members m ON m.vec_id = e.vec_id "
        f"WHERE m.cluster_id = {cid}" for b in range(NBANDS))
    return f"CREATE OR REPLACE TEMP TABLE buckets_l AS\n{bands}"


def main(sf_dir, out_dir, tau):
    con = duckdb.connect()
    con.execute("SET temp_directory='/var/tmp/duck_tmp'")
    con.execute("SET memory_limit='40GB'")
    pat = (f"{sf_dir}/embeddings.parquet/*.parquet"
           if glob.glob(f"{sf_dir}/embeddings.parquet/*.parquet")
           else f"{sf_dir}/embeddings.parquet")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{pat}')")
    con.execute(
        f"CREATE VIEW members AS SELECT vec_id, cluster_id "
        f"FROM read_parquet('{out_dir}/emb_kmeans/*.parquet')")
    n = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    # fallback 30 matches the engine's Similarity.bitsFor getOrElse(30):
    # without it a corpus past 200*2^30 rows would raise StopIteration
    # here while the engine keeps running at bits=30 (round-11 advice)
    bits = next((b for b in range(4, 31) if (1 << b) * 200 >= n), 30)
    clusters = [r[0] for r in con.execute(
        "SELECT DISTINCT cluster_id FROM members ORDER BY cluster_id").fetchall()]
    print(f"corpus={n} derived bits={bits} clusters={len(clusters)}", flush=True)
    drop_frames = []
    for cid in clusters:
        con.execute(cluster_buckets_sql(cid, bits))
        con.execute(pairs_sql())
        n_cand, max_cos, n_drop = con.execute(
            f"SELECT count(*), max(cosine), "
            f"count(DISTINCT d2) FILTER (cosine >= {tau}) FROM pairs_l").fetchone()
        print(f"cluster {cid}: candidates={n_cand} max_cos={max_cos} drops={n_drop}",
              flush=True)
        if n_drop:
            drop_frames.append(con.execute(
                f"SELECT DISTINCT d2 FROM pairs_l WHERE cosine >= {tau}").df())
    drops = (set(pd.concat(drop_frames)["d2"].astype("int64"))
             if drop_frames else set())

    spark = pd.concat(
        [pd.read_parquet(f)
         for f in sorted(glob.glob(f"{out_dir}/dedup_semantic/*.parquet"))],
        ignore_index=True).sort_values("vec_id").reset_index(drop=True)
    members = con.execute("SELECT vec_id, cluster_id FROM members ORDER BY vec_id").df()
    ok = len(spark) == len(members)
    if ok:
        ok = (spark["vec_id"].astype("int64").values
              == members["vec_id"].astype("int64").values).all()
        ok = ok and (spark["cluster_id"].astype("int64").values
                     == members["cluster_id"].astype("int64").values).all()
        expected_kept = ~members["vec_id"].astype("int64").isin(sorted(drops))
        ok = ok and (spark["kept"].astype(bool).values
                     == expected_kept.values).all()
    n_dropped_spark = int((~spark["kept"].astype(bool)).sum()) if len(spark) else 0
    print(f"spark rows={len(spark)} dropped={n_dropped_spark} "
          f"oracle drops={len(drops)} -> {'OK' if ok else 'MISMATCH'}")
    return 0 if ok else 1


if __name__ == "__main__":
    tau = float(sys.argv[3]) if len(sys.argv) > 3 else 0.99
    sys.exit(main(sys.argv[1], sys.argv[2], tau))
