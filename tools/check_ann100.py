"""100x compositional check of the IVF family at CORPUS-DERIVED nlist
(round-16: nlist = ceil(sqrt(200k)) = 448 replaces the fixed 10).

Strategy (the check_recall100 slices reworked for large nlist): the
round-15 script re-derived the corpus assignment INSIDE each per-query
slice — 8 x (corpus x nlist x dim) unnest joins, fine at nlist=10,
~5.7B-row joins each at 448. Here the assignment is staged ONCE using
the engine's own margin-gate THEOREM: a fast double argmax equals the
decimal argmax whenever the top-1/top-2 gap exceeds the margin (drift
~1e-13 << 1e-6), so only ambiguous vectors pay the exact decimal
re-rank. Everything downstream (brute ground truth, probed serving,
ADC chains) is per-query-sliced or candidate-bounded.

Checks (engine dumps from graft.Verify at the 100x fixture):
  ann_ivf          row-for-row (query slices at nprobe=4)
  ann_recall_eval  n_hits/n_topk/recall per grid point (fraction grid)
  ann_ivfpq_residual row-for-row (codes staged once from the exported
                   residual codebooks + members)
  ann_refine       row-for-row (shortlist k'=40 from the ADC chain,
                   decimal rerank)
  ann_ivf_pq       row-for-row (flat-PQ codes from the exported
                   codebooks, full-scan ADC)

Usage: python3 tools/check_ann100.py <fixture_dir> <verify_out_dir>
"""
import duckdb, glob, json, os, re, sys, time
import pandas as pd

FIX = sys.argv[1] if len(sys.argv) > 1 else '/tmp/graft-x100'
OUT = sys.argv[2] if len(sys.argv) > 2 else '/tmp/vr_100x'
NQ, K, REFINE_K = 8, 10, 40
PQ_FP = 1000000000000
TMP = '/root/repo/.tmpq'
MEMBERS = os.path.join(TMP, 'members100.parquet')
os.makedirs(TMP, exist_ok=True)

osql = json.load(open(os.path.join(OUT, 'oracle_sql.json')))
cent_path = re.search(r"parquet_scan\('([^']*ivf-centroids[^']*)'\)",
                      osql['ann_ivf']).group(1)
rcb_path = re.search(r"parquet_scan\('([^']*pqres-codebooks[^']*)'\)",
                     osql['ann_ivfpq_residual']).group(1)
pqcb_path = re.search(r"parquet_scan\('([^']*pq-codebooks[^']*)'\)",
                      osql['ann_ivf_pq']).group(1)
print('centroids:', cent_path)
print('residual codebooks:', rcb_path)
print('flat codebooks:', pqcb_path, flush=True)


def con():
    c = duckdb.connect()
    c.execute("SET memory_limit='40GB'")
    c.execute(f"SET temp_directory='{TMP}'")
    c.execute("CREATE VIEW embeddings AS SELECT * FROM "
              f"read_parquet('{FIX}/embeddings.parquet/*.parquet')")
    c.execute(f"CREATE VIEW cent AS SELECT * FROM parquet_scan('{cent_path}')")
    return c


# norms CTE fragment (the withNorm ingest filter) over the exploded view
EX = """ex AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS x
       FROM embeddings),
norms AS (
  SELECT vec_id,
         sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS n2
  FROM ex GROUP BY vec_id
  HAVING sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) > 0
     AND NOT isnan(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"""

# ---------------------------------------------------------------- members
t0 = time.time()
if not os.path.exists(MEMBERS):
    c = con()
    # fast double argmax over (corpus x nlist) array dots + margin gate;
    # ambiguous vectors (gap <= 1e-6 >> both engines' fast-vs-decimal
    # drift) re-ranked with the exact decimal cosine
    c.execute(f"""
COPY (
WITH {EX},
cexn AS (
  SELECT c_id, sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS cn2
  FROM (SELECT c_id, unnest(c_emb) AS x FROM cent) GROUP BY c_id),
fast AS (
  SELECT e.vec_id, c.c_id,
         list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[]) /
           sqrt(CAST(n.n2 AS DOUBLE) * CAST(cn.cn2 AS DOUBLE)) AS f
  FROM embeddings e
  JOIN norms n USING (vec_id)
  CROSS JOIN cent c
  JOIN cexn cn USING (c_id)),
rk AS (
  SELECT vec_id, c_id, f,
         row_number() OVER (PARTITION BY vec_id ORDER BY f DESC, c_id) AS r
  FROM fast),
gap AS (
  SELECT a.vec_id, a.c_id AS win,
         a.f - coalesce(b.f, a.f - 1) AS g
  FROM rk a LEFT JOIN rk b ON b.vec_id = a.vec_id AND b.r = 2
  WHERE a.r = 1),
amb AS (SELECT vec_id FROM gap WHERE g <= 1e-6),
exact AS (
  SELECT e.vec_id, c.c_id,
         CAST(sum(CAST(CAST(e.x AS DOUBLE) * CAST(c.x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
           / sqrt(CAST(n.n2 AS DOUBLE) * CAST(cn.cn2 AS DOUBLE)) AS c_cos
  FROM ex e
  JOIN amb USING (vec_id)
  JOIN (SELECT c_id, generate_subscripts(c_emb, 1) AS i, unnest(c_emb) AS x FROM cent) c
    ON c.i = e.i
  JOIN norms n ON n.vec_id = e.vec_id
  JOIN cexn cn ON cn.c_id = c.c_id
  GROUP BY e.vec_id, c.c_id, n.n2, cn.cn2),
exwin AS (
  SELECT vec_id, c_id AS win FROM (
    SELECT vec_id, c_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id) AS r
    FROM exact) WHERE r = 1)
SELECT g.vec_id, coalesce(e.win, g.win) AS c_id
FROM gap g LEFT JOIN exwin e USING (vec_id)
) TO '{MEMBERS}' (FORMAT PARQUET)""")
    namb = c.execute(
        "SELECT count(*) FROM parquet_scan('" + MEMBERS + "')").fetchone()[0]
    c.close()
    print(f'members staged: {namb} rows in {time.time()-t0:.1f}s', flush=True)
else:
    print('members already staged', flush=True)

# ------------------------------------------------- query probes (decimal)
c = con()
probes = c.execute(f"""
WITH {EX},
cex AS (SELECT c_id, generate_subscripts(c_emb, 1) AS i, unnest(c_emb) AS x FROM cent),
cn AS (SELECT c_id, sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS cn2
       FROM cex GROUP BY c_id),
a AS (
  SELECT e.vec_id, cx.c_id,
         CAST(sum(CAST(CAST(e.x AS DOUBLE) * CAST(cx.x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
           / sqrt(CAST(n.n2 AS DOUBLE) * CAST(c.cn2 AS DOUBLE)) AS c_cos
  FROM ex e
  JOIN cex cx ON cx.i = e.i
  JOIN norms n ON n.vec_id = e.vec_id
  JOIN cn c ON c.c_id = cx.c_id
  WHERE e.vec_id < {NQ}
  GROUP BY e.vec_id, cx.c_id, n.n2, c.cn2)
SELECT vec_id AS query_id, c_id,
       row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id) AS c_rank
FROM a""").df()
nlist = c.execute('SELECT count(*) FROM cent').fetchone()[0]
c.close()
print(f'nlist={nlist}, probes ranked for {probes.query_id.nunique()} queries', flush=True)

grid = sorted(set(pd.concat([pd.read_parquet(f) for f in
               glob.glob(os.path.join(OUT, 'ann_recall_eval/*.parquet'))]).nprobe))
print('engine grid:', grid, flush=True)

# ---------------------------------------------- per-query brute + serving
hits = {np_: 0 for np_ in grid}
ntopk = 0
ivf_rows = []
for q in range(NQ):
    t1 = time.time()
    c = con()
    c.execute(f"CREATE VIEW members AS SELECT * FROM parquet_scan('{MEMBERS}')")
    probe_lists = {np_: tuple(probes[(probes.query_id == q) &
                                     (probes.c_rank <= np_)].c_id) for np_ in grid}
    arms = "\nUNION ALL\n".join(f"""
  SELECT {np_} AS nprobe, count(*) AS n_hits FROM (
    SELECT p.query_id, p.vec_id FROM (
      SELECT pr.query_id, pr.vec_id,
             row_number() OVER (PARTITION BY pr.query_id
               ORDER BY pr.cosine DESC, pr.vec_id) AS rk
      FROM pairs pr
      JOIN members m ON m.vec_id = pr.vec_id
      WHERE m.c_id IN {probe_lists[np_]}) p
    WHERE p.rk <= {K}) t
  JOIN btop b ON b.query_id = t.query_id AND b.vec_id = t.vec_id
""" for np_ in grid)
    df = c.execute(f"""
WITH {EX},
pairs AS MATERIALIZED (
  SELECT q.vec_id AS query_id, cc.vec_id AS vec_id,
         CAST(sum(CAST(CAST(q.x AS DOUBLE) * CAST(cc.x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
           / sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS cosine
  FROM ex q
  JOIN ex cc ON q.i = cc.i AND q.vec_id = {q} AND cc.vec_id <> q.vec_id
  JOIN norms nq ON nq.vec_id = q.vec_id
  JOIN norms nc ON nc.vec_id = cc.vec_id
  GROUP BY q.vec_id, cc.vec_id, nq.n2, nc.n2),
btop AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
    FROM pairs) WHERE rk <= {K})
SELECT * FROM ({arms}) ORDER BY nprobe""").df()
    for _, r in df.iterrows():
        hits[int(r.nprobe)] += int(r.n_hits)
    nb = c.execute(f"""
WITH {EX},
pairs AS MATERIALIZED (
  SELECT q.vec_id AS query_id, cc.vec_id AS vec_id,
         CAST(sum(CAST(CAST(q.x AS DOUBLE) * CAST(cc.x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
           / sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS cosine
  FROM ex q
  JOIN ex cc ON q.i = cc.i AND q.vec_id = {q} AND cc.vec_id <> q.vec_id
  JOIN norms nq ON nq.vec_id = q.vec_id
  JOIN norms nc ON nc.vec_id = cc.vec_id
  GROUP BY q.vec_id, cc.vec_id, nq.n2, nc.n2),
srv AS (
  SELECT pr.query_id, pr.vec_id, pr.cosine,
         row_number() OVER (ORDER BY pr.cosine DESC, pr.vec_id) AS rk
  FROM pairs pr JOIN parquet_scan('{MEMBERS}') m ON m.vec_id = pr.vec_id
  WHERE m.c_id IN {probe_lists[4]})
SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, round(cosine, 9) AS cosine
FROM srv WHERE rk <= {K} ORDER BY rk""").df()
    ivf_rows.append(nb)
    ntopk += K
    c.close()
    print(f'query {q}: {time.time()-t1:.1f}s hits={df.n_hits.tolist()}', flush=True)

ok = True
# --- ann_recall_eval
got = pd.concat([pd.read_parquet(f) for f in
                 glob.glob(os.path.join(OUT, 'ann_recall_eval/*.parquet'))])
got = got.sort_values('nprobe').reset_index(drop=True)
for np_ in grid:
    g = got[got.nprobe == np_].iloc[0]
    want = round(hits[np_] / ntopk, 9)
    m = (int(g.n_hits) == hits[np_] and int(g.n_topk) == ntopk
         and abs(float(g.recall) - want) < 1e-12)
    print(f'recall_eval nprobe={np_}: engine=({int(g.n_hits)},{float(g.recall)}) '
          f'oracle=({hits[np_]},{want}) {"OK" if m else "FAIL"}', flush=True)
    ok = ok and m

# --- ann_ivf rows
eng = pd.concat([pd.read_parquet(f) for f in
                 glob.glob(os.path.join(OUT, 'ann_ivf/*.parquet'))])
eng = eng.sort_values(['query_id', 'rk']).reset_index(drop=True)
want = pd.concat(ivf_rows).sort_values(['query_id', 'rk']).reset_index(drop=True)
want = want.astype({'query_id': 'int64', 'rk': 'int32', 'vec_id': 'int64'})
eng2 = eng.astype({'query_id': 'int64', 'rk': 'int32', 'vec_id': 'int64'})
m = (len(eng2) == len(want)
     and (eng2[['query_id', 'rk', 'vec_id']].values ==
          want[['query_id', 'rk', 'vec_id']].values).all()
     and (abs(eng2.cosine.values - want.cosine.values) < 1e-12).all())
print(f'ann_ivf rows: {len(eng2)} engine vs {len(want)} oracle '
      f'{"OK" if m else "FAIL"}', flush=True)
ok = ok and m

print(f'PHASE-1 {"OK" if ok else "FAIL"} in {time.time()-t0:.1f}s', flush=True)
if not ok:
    sys.exit(1)

# ------------------------------------------------- residual ADC chain
t2 = time.time()
CODES = os.path.join(TMP, 'codes100.parquet')
c = con()
c.execute(f"CREATE VIEW members AS SELECT * FROM parquet_scan('{MEMBERS}')")
c.execute(f"CREATE VIEW rcb0 AS SELECT * FROM parquet_scan('{rcb_path}')")
if not os.path.exists(CODES):
    c.execute(f"""
COPY (
WITH {EX},
cex AS (SELECT c_id, generate_subscripts(c_emb, 1) AS i, unnest(c_emb) AS x FROM cent),
rcb AS (SELECT m, code, generate_subscripts(c_sub, 1) AS j, unnest(c_sub) AS x FROM rcb0),
res AS (
  SELECT e.vec_id, mm.c_id,
         CAST((e.i - 1) // 16 AS INT) AS m,
         CAST((e.i - 1) % 16 + 1 AS INT) AS j,
         CAST(CAST(e.x AS DOUBLE) - CAST(c.x AS DOUBLE) AS REAL) AS r
  FROM ex e
  JOIN members mm ON mm.vec_id = e.vec_id
  JOIN cex c ON c.c_id = mm.c_id AND c.i = e.i),
d2r AS (
  SELECT r.vec_id, r.m, b.code,
         sum(CAST(CAST(r.r AS DOUBLE) * CAST(r.r AS DOUBLE) AS DECIMAL(38,12)))
       - 2 * sum(CAST(CAST(r.r AS DOUBLE) * CAST(b.x AS DOUBLE) AS DECIMAL(38,12)))
       + sum(CAST(CAST(b.x AS DOUBLE) * CAST(b.x AS DOUBLE) AS DECIMAL(38,12))) AS d2dec
  FROM res r JOIN rcb b ON b.m = r.m AND b.j = r.j
  GROUP BY r.vec_id, r.m, b.code)
SELECT vec_id, m, code FROM (
  SELECT vec_id, m, code,
         row_number() OVER (PARTITION BY vec_id, m ORDER BY d2dec, code) AS rn
  FROM d2r) WHERE rn = 1
) TO '{CODES}' (FORMAT PARQUET)""")
    print(f'residual codes staged in {time.time()-t2:.1f}s', flush=True)

adc = c.execute(f"""
WITH {EX},
cex AS (SELECT c_id, generate_subscripts(c_emb, 1) AS i, unnest(c_emb) AS x FROM cent),
rcb AS (SELECT m, code, generate_subscripts(c_sub, 1) AS j, unnest(c_sub) AS x FROM rcb0),
probes AS (SELECT * FROM (VALUES {', '.join(
    f"({int(r.query_id)}, {int(r.c_id)})"
    for _, r in probes[probes.c_rank <= 4].iterrows())}) v(query_id, c_id)),
qres AS (
  SELECT p.query_id, p.c_id,
         CAST((e.i - 1) // 16 AS INT) AS m,
         CAST((e.i - 1) % 16 + 1 AS INT) AS j,
         CAST(CAST(e.x AS DOUBLE) - CAST(c.x AS DOUBLE) AS REAL) AS r
  FROM probes p
  JOIN ex e ON e.vec_id = p.query_id
  JOIN cex c ON c.c_id = p.c_id AND c.i = e.i),
qd2 AS (
  SELECT q.query_id, q.c_id, q.m, b.code,
         sum(CAST(CAST(q.r AS DOUBLE) * CAST(q.r AS DOUBLE) AS DECIMAL(38,12)))
       - 2 * sum(CAST(CAST(q.r AS DOUBLE) * CAST(b.x AS DOUBLE) AS DECIMAL(38,12)))
       + sum(CAST(CAST(b.x AS DOUBLE) * CAST(b.x AS DOUBLE) AS DECIMAL(38,12))) AS d2dec
  FROM qres q JOIN rcb b ON b.m = q.m AND b.j = q.j
  GROUP BY q.query_id, q.c_id, q.m, b.code),
qtab AS (SELECT query_id, c_id, m, code,
                CAST(CAST(d2dec AS DECIMAL(24,12)) *
                     CAST({PQ_FP} AS DECIMAL(13,0)) AS BIGINT) AS dfp
         FROM qd2),
adc AS (
  SELECT q.query_id, mm.vec_id, CAST(sum(q.dfp) AS BIGINT) AS adc_d2_fp
  FROM members mm
  JOIN parquet_scan('{CODES}') cd ON cd.vec_id = mm.vec_id
  JOIN qtab q ON q.c_id = mm.c_id AND q.m = cd.m AND q.code = cd.code
  WHERE mm.vec_id <> q.query_id
  GROUP BY q.query_id, mm.vec_id)
SELECT query_id, CAST(rk AS INT) AS rk, vec_id, adc_d2_fp
FROM (SELECT query_id, vec_id, adc_d2_fp,
             row_number() OVER (PARTITION BY query_id ORDER BY adc_d2_fp, vec_id) AS rk
      FROM adc)
WHERE rk <= {REFINE_K}
ORDER BY query_id, rk""").df()

engr = pd.concat([pd.read_parquet(f) for f in
                  glob.glob(os.path.join(OUT, 'ann_ivfpq_residual/*.parquet'))])
engr = engr.sort_values(['query_id', 'rk']).reset_index(drop=True)
wr = adc[adc.rk <= K].reset_index(drop=True)
m = (len(engr) == len(wr)
     and (engr[['query_id', 'vec_id', 'adc_d2_fp']].astype('int64').values ==
          wr[['query_id', 'vec_id', 'adc_d2_fp']].astype('int64').values).all())
print(f'ann_ivfpq_residual rows: {len(engr)} {"OK" if m else "FAIL"}', flush=True)
ok = ok and m

# --- ann_refine: decimal rerank of the k'=40 shortlist
short = adc[['query_id', 'vec_id']]
pairs_sql = ', '.join(f"({int(r.query_id)}, {int(r.vec_id)})"
                      for _, r in short.iterrows())
ref = c.execute(f"""
WITH {EX},
sh AS (SELECT * FROM (VALUES {pairs_sql}) v(query_id, vec_id)),
resc AS (
  SELECT sh.query_id, sh.vec_id,
         CAST(sum(CAST(CAST(q.x AS DOUBLE) * CAST(cc.x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
           / sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS cosine
  FROM sh
  JOIN ex q ON q.vec_id = sh.query_id
  JOIN ex cc ON cc.vec_id = sh.vec_id AND cc.i = q.i
  JOIN norms nq ON nq.vec_id = sh.query_id
  JOIN norms nc ON nc.vec_id = sh.vec_id
  GROUP BY sh.query_id, sh.vec_id, nq.n2, nc.n2)
SELECT query_id, CAST(rk AS INT) AS rk, vec_id, round(cosine, 6) + 0.0 AS cosine
FROM (SELECT query_id, vec_id, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
      FROM resc)
WHERE rk <= {K} ORDER BY query_id, rk""").df()
engf = pd.concat([pd.read_parquet(f) for f in
                  glob.glob(os.path.join(OUT, 'ann_refine/*.parquet'))])
engf = engf.sort_values(['query_id', 'rk']).reset_index(drop=True)
m = (len(engf) == len(ref)
     and (engf[['query_id', 'vec_id']].astype('int64').values ==
          ref[['query_id', 'vec_id']].astype('int64').values).all()
     and (abs(engf.cosine.values - ref.cosine.values) < 1e-12).all())
print(f'ann_refine rows: {len(engf)} {"OK" if m else "FAIL"}', flush=True)
ok = ok and m
c.close()

# ------------------------------------------------- flat-PQ (ann_ivf_pq)
t3 = time.time()
FCODES = os.path.join(TMP, 'fcodes100.parquet')
c = con()
c.execute(f"CREATE VIEW pqcb AS SELECT * FROM parquet_scan('{pqcb_path}')")
if not os.path.exists(FCODES):
    c.execute(f"""
COPY (
WITH {EX},
cb AS (SELECT m, code, generate_subscripts(c_sub, 1) AS j, unnest(c_sub) AS x FROM pqcb),
exm AS (SELECT e.vec_id, CAST((e.i - 1) // 16 AS INT) AS m,
               CAST((e.i - 1) % 16 + 1 AS INT) AS j, e.x
        FROM ex e JOIN norms USING (vec_id)),
d2 AS (
  SELECT e.vec_id, e.m, cb.code,
         sum(CAST(CAST(e.x AS DOUBLE) * CAST(e.x AS DOUBLE) AS DECIMAL(38,12)))
       - 2 * sum(CAST(CAST(e.x AS DOUBLE) * CAST(cb.x AS DOUBLE) AS DECIMAL(38,12)))
       + sum(CAST(CAST(cb.x AS DOUBLE) * CAST(cb.x AS DOUBLE) AS DECIMAL(38,12))) AS d2dec
  FROM exm e JOIN cb ON cb.m = e.m AND cb.j = e.j
  GROUP BY e.vec_id, e.m, cb.code)
SELECT vec_id, m, code,
       CAST(CAST(d2dec AS DECIMAL(24,12)) * CAST({PQ_FP} AS DECIMAL(13,0)) AS BIGINT) AS dfp
FROM (SELECT vec_id, m, code, d2dec,
             row_number() OVER (PARTITION BY vec_id, m ORDER BY d2dec, code) AS rn
      FROM d2) WHERE rn = 1
) TO '{FCODES}' (FORMAT PARQUET)""")
    print(f'flat codes staged in {time.time()-t3:.1f}s', flush=True)
fpq = c.execute(f"""
WITH {EX},
cb AS (SELECT m, code, generate_subscripts(c_sub, 1) AS j, unnest(c_sub) AS x FROM pqcb),
qm AS (SELECT e.vec_id AS query_id, CAST((e.i - 1) // 16 AS INT) AS m,
              CAST((e.i - 1) % 16 + 1 AS INT) AS j, e.x
       FROM ex e WHERE e.vec_id < {NQ}),
qd2 AS (
  SELECT q.query_id, q.m, cb.code,
         sum(CAST(CAST(q.x AS DOUBLE) * CAST(q.x AS DOUBLE) AS DECIMAL(38,12)))
       - 2 * sum(CAST(CAST(q.x AS DOUBLE) * CAST(cb.x AS DOUBLE) AS DECIMAL(38,12)))
       + sum(CAST(CAST(cb.x AS DOUBLE) * CAST(cb.x AS DOUBLE) AS DECIMAL(38,12))) AS d2dec
  FROM qm q JOIN cb ON cb.m = q.m AND cb.j = q.j
  GROUP BY q.query_id, q.m, cb.code),
qtab AS (SELECT query_id, m, code,
                CAST(CAST(d2dec AS DECIMAL(24,12)) *
                     CAST({PQ_FP} AS DECIMAL(13,0)) AS BIGINT) AS dfp
         FROM qd2),
adc AS (
  SELECT q.query_id, cd.vec_id, CAST(sum(q.dfp) AS BIGINT) AS adc_d2_fp
  FROM parquet_scan('{FCODES}') cd
  JOIN qtab q ON q.m = cd.m AND q.code = cd.code
  WHERE cd.vec_id <> q.query_id
  GROUP BY q.query_id, cd.vec_id)
SELECT query_id, CAST(rk AS INT) AS rk, vec_id, adc_d2_fp
FROM (SELECT query_id, vec_id, adc_d2_fp,
             row_number() OVER (PARTITION BY query_id ORDER BY adc_d2_fp, vec_id) AS rk
      FROM adc)
WHERE rk <= {K} ORDER BY query_id, rk""").df()
c.close()
engp = pd.concat([pd.read_parquet(f) for f in
                  glob.glob(os.path.join(OUT, 'ann_ivf_pq/*.parquet'))])
engp = engp.sort_values(['query_id', 'rk']).reset_index(drop=True)
m = (len(engp) == len(fpq)
     and (engp[['query_id', 'vec_id', 'adc_d2_fp']].astype('int64').values ==
          fpq[['query_id', 'vec_id', 'adc_d2_fp']].astype('int64').values).all())
print(f'ann_ivf_pq rows: {len(engp)} {"OK" if m else "FAIL"}', flush=True)
ok = ok and m

print(f'TOTAL {"OK" if ok else "FAIL"} in {time.time()-t0:.1f}s', flush=True)
sys.exit(0 if ok else 1)
