"""Compositional 100x check for ann_recall_eval: the evaluation is
independent per query_id (each query's brute top-K, probe set, served
top-K and overlap use the whole corpus but no other query), so
per-query oracle slices sum EXACTLY to the engine's per-nprobe hit
counts — the check_sliced recipe applied to the query axis. Each slice
keeps the corpus side whole; memory stays bounded by one query's
pair scoring."""
import duckdb, json, glob, time
import pandas as pd

NQ, K = 8, 10
NPROBES = [1, 2, 4, 10]
o = json.load(open('/tmp/vr_100x/oracle_sql.json'))['ann_recall_eval']
# centroid artifact path rides inside the dumped SQL — extract it
import re
cent_path = re.search(r"parquet_scan\('([^']*ivf-centroids[^']*)'\)", o).group(1)
print("centroids:", cent_path, flush=True)

hits = {np: 0 for np in NPROBES}
ntopk = 0
t00 = time.time()
for q in range(NQ):
    con = duckdb.connect()
    con.execute("SET memory_limit='40GB'")
    con.execute("SET temp_directory='/root/repo/.tmpq'")
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                "read_parquet('/tmp/graft-sfx100/embeddings.parquet/*.parquet')")
    t0 = time.time()
    sql = f"""
WITH ex AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS x
            FROM embeddings),
norms AS (
  SELECT vec_id,
         sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS n2
  FROM ex GROUP BY vec_id
  HAVING sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) > 0
     AND NOT isnan(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         CAST(sum(CAST(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
           / sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS cosine
  FROM ex q
  JOIN ex c ON q.i = c.i AND q.vec_id = {q} AND c.vec_id <> q.vec_id
  JOIN norms nq ON nq.vec_id = q.vec_id
  JOIN norms nc ON nc.vec_id = c.vec_id
  GROUP BY q.vec_id, c.vec_id, nq.n2, nc.n2),
cex AS (SELECT c_id, generate_subscripts(c_emb, 1) AS i, unnest(c_emb) AS x
        FROM parquet_scan('{cent_path}')),
cnorms AS (
  SELECT c_id,
         sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS n2
  FROM cex GROUP BY c_id),
assign AS (
  SELECT e.vec_id, c.c_id,
         CAST(sum(CAST(CAST(e.x AS DOUBLE) * CAST(c.x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
           / sqrt(CAST(n.n2 AS DOUBLE) * CAST(cn.n2 AS DOUBLE)) AS c_cos
  FROM ex e
  JOIN cex c ON c.i = e.i
  JOIN norms n ON n.vec_id = e.vec_id
  JOIN cnorms cn ON cn.c_id = c.c_id
  GROUP BY e.vec_id, c.c_id, n.n2, cn.n2),
ranked AS (
  SELECT vec_id, c_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id) AS c_rank
  FROM assign),
members AS (SELECT vec_id, c_id FROM ranked WHERE c_rank = 1),
btop AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
    FROM pairs) WHERE rk <= {K})
SELECT * FROM (
""" + "\nUNION ALL\n".join(f"""
  SELECT {np} AS nprobe,
         (SELECT count(*) FROM (
            SELECT query_id, vec_id FROM (
              SELECT pr.query_id, pr.vec_id,
                     row_number() OVER (PARTITION BY pr.query_id
                       ORDER BY pr.cosine DESC, pr.vec_id) AS rk
              FROM pairs pr
              JOIN members m ON m.vec_id = pr.vec_id
              JOIN (SELECT vec_id AS query_id, c_id FROM ranked
                    WHERE vec_id = {q} AND c_rank <= {np}) p
                ON p.query_id = pr.query_id AND p.c_id = m.c_id)
            WHERE rk <= {K}) t
          JOIN btop b ON b.query_id = t.query_id AND b.vec_id = t.vec_id) AS n_hits,
         (SELECT count(*) FROM btop) AS n_topk
""" for np in NPROBES) + ") ORDER BY nprobe"
    df = con.execute(sql).df()
    con.close()
    for _, r in df.iterrows():
        hits[int(r.nprobe)] += int(r.n_hits)
    ntopk += int(df.n_topk.iloc[0])
    print(f"query {q}: {time.time()-t0:.1f}s  {df.n_hits.tolist()}", flush=True)

got = pd.concat([pd.read_parquet(f) for f in
                 sorted(glob.glob('/tmp/vr_100x/ann_recall_eval/*.parquet'))])
got = got.sort_values('nprobe').reset_index(drop=True)
ok = True
for np_ in NPROBES:
    g = got[got.nprobe == np_].iloc[0]
    want_recall = round(hits[np_] / ntopk, 9)
    match = (int(g.n_hits) == hits[np_] and int(g.n_topk) == ntopk
             and abs(float(g.recall) - want_recall) < 1e-12)
    print(f"nprobe={np_}: engine=({int(g.n_hits)},{int(g.n_topk)},{float(g.recall)}) "
          f"oracle=({hits[np_]},{ntopk},{want_recall}) {'OK' if match else 'FAIL'}", flush=True)
    ok = ok and match
print(f"TOTAL {'OK' if ok else 'FAIL'} in {time.time()-t00:.1f}s", flush=True)
