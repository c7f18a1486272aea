#!/usr/bin/env python3
"""Build the fixture-SKEW off-axis probe corpus (r11's rotation axis).

Copies an sf dir to a destination, replacing documents.parquet with a
skewed variant: the base corpus plus (a) a 61-member byte-identical
duplicate cluster (hot exact-dup/shuffle key) and (b) 3,000 DISTINCT
word-salted docs under ONE (lang='xx', source='hotsrc') key (hot
groupBy key with distinct texts — stresses hot-key accumulation
without pair-set explosion). Run Verify + check.py against the
destination; the DuckDB oracle recomputes over the same skewed parquet.

ID PLACEMENT CONTRACT (violating it fails queries legitimately, not
the engine — measured r11): several queries synthesize mirror corpora
by id arithmetic (+10000/+20000/.../+900000 over ALL input rows) and
planted rows filter mined pairs by exact id offsets (x03b's +100000).
Probe ids must (1) leave every synthesis offset collision-free —
duplicate doc_ids mean two docs share one identity — and (2) not place
two probe blocks exactly a planted offset apart. 1,000,001+ and
1,237,777+ satisfy both for the current query set.

Usage: python3 tools/make_skew.py [src_sf_dir] [dest_dir]
"""
import sys, os, shutil
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skewdata"

shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)
for f in os.listdir(src):
    if f != "documents.parquet":
        s, d = os.path.join(src, f), os.path.join(dst, f)
        (shutil.copytree if os.path.isdir(s) else shutil.copy2)(s, d)

con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/documents.parquet')
  UNION ALL
  SELECT 1000001 + r.range AS doc_id, d.text, d.lang, d.source, d.n_chars
  FROM read_parquet('{src}/documents.parquet') d, range(60) r
  WHERE d.doc_id = (SELECT min(doc_id)
                    FROM read_parquet('{src}/documents.parquet'))
  UNION ALL
  SELECT 1237777 + (d.doc_id * 6 + r.range) AS doc_id,
         'v' || CAST(d.doc_id * 6 + r.range AS VARCHAR) || ' ' || d.text,
         'xx', 'hotsrc',
         CAST(length('v' || CAST(d.doc_id * 6 + r.range AS VARCHAR)
              || ' ' || d.text) AS BIGINT)
  FROM read_parquet('{src}/documents.parquet') d, range(6) r
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
""")
n, ids, txts = con.execute(
    f"SELECT count(*), count(DISTINCT doc_id), count(DISTINCT text) "
    f"FROM read_parquet('{dst}/documents.parquet')").fetchone()
print(f"wrote {dst}/documents.parquet: {n} docs, {ids} distinct ids, "
      f"{txts} distinct texts")
