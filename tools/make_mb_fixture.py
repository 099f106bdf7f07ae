#!/usr/bin/env python3
"""Build the multibyte derived fixture (docs/SCALING.md "Multibyte-fixture
gate"): copy of a source fixture with a deterministic multibyte token
suffix (2-byte o-umlaut/e-acute, 3-byte CJK, 4-byte astral) appended to
every document text. Usage: python3 tools/make_mb_fixture.py <src> <dst>
Then: tools/run.sh graft.Verify <dst> <out> && python3 tools/check_oracle.py <dst> <out>
Dev-only tool (driver-side python: duckdb)."""
import sys, os, shutil, duckdb

src, dst = sys.argv[1], sys.argv[2]
os.makedirs(dst, exist_ok=True)
for t in "region nation customer supplier part orders lineitem events embeddings".split():
    p = f"{src}/{t}.parquet"
    if os.path.exists(p):
        shutil.copy(p, f"{dst}/{t}.parquet")
con = duckdb.connect()
con.execute(f"""COPY (
  SELECT doc_id, text || ' 中文分析 wörd𝄞 naïveté' AS text, lang, source,
         length(text || ' 中文分析 wörd𝄞 naïveté') AS n_chars
  FROM read_parquet('{src}/documents.parquet')
) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
print(f"wrote {dst} (multibyte documents over {src})")
