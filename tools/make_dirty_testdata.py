"""Build an adversarial copy of an sf testdata dir for robustness runs.

The driver regenerates testdata between rounds, and the value/props
columns are nullable by schema — so the correctness gate must keep
passing if a future generation ships nulls, NaNs, malformed JSON, or
zero-magnitude embeddings. This builder injects exactly those shapes:

- events: +4 rows — null value / NaN value / malformed props ('not
  json at all', truncated '[1,2') / null props — plus +3 rows missing
  an identity dimension (null ts / null event_type / null user_id),
  which the ingest boundary rejects on both engines, +1 Infinity
  value (a non-finite measurement nullifies at ingest — NaN ordering
  inside exact percentiles is engine-erratic, so NULL is the one
  non-observation token), and +1 user_id above 2^40 (id-width
  overflow probe for interleave/hash paths).
- embeddings: +1 all-zero vector (vec_id 900001, an existing label),
  +1 NULL vector (vec_id 900002 — a failed embedding job), +1 NULL
  vec_id row, +1 all-NaN vector and +1 single-NaN-component vector —
  identity-less and non-finite vectors are all rejected at the load
  boundary on both engines.
- documents: +6 rows — null body / empty body / whitespace-only body
  (+null lang) / unicode+emoji (+null source) / null body in its OWN
  lang so some group aggregates see exclusively-null inputs / a NULL
  doc_id row / two rows SHARING doc_id 900100 with different texts
  (colliding ids resolve deterministically inside segment_dedup) (a document without an id is malformed at ingest — it
  would otherwise shift every corpus-count-derived estimator and
  render as nullable-int float drift in any output carrying doc_id).

Usage: python tools/make_dirty_testdata.py [src_sf_dir] [dst_dir]
Then:  python tools/check_correctness.py <dst_dir>
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

COPY_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
]


def build(src: str, dst: str) -> None:
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for t in COPY_TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    con = duckdb.connect()
    con.sql(
        f"""
COPY (
  SELECT * FROM '{src}/events.parquet'
  UNION ALL BY NAME
  SELECT * FROM (VALUES
    (900001, TIMESTAMP '2024-03-01 00:00:01', 7, 'click',
     CAST(NULL AS DOUBLE), 'not json at all'),
    (900002, TIMESTAMP '2024-03-01 00:00:02', 7, 'view',
     CAST('NaN' AS DOUBLE), NULL),
    (900003, TIMESTAMP '2024-03-01 00:00:03', 7, 'purchase',
     CAST(NULL AS DOUBLE), '{{"k": "zzz"}}'),
    (900004, TIMESTAMP '2024-03-01 00:00:04', 993, 'click',
     CAST(NULL AS DOUBLE), '[1,2'),
    (900005, CAST(NULL AS TIMESTAMP), 7, 'click', 1.0, NULL),
    (900006, TIMESTAMP '2024-03-01 00:00:06', 7,
     CAST(NULL AS VARCHAR), 2.0, NULL),
    (900007, TIMESTAMP '2024-03-01 00:00:07', CAST(NULL AS BIGINT),
     'view', 3.0, NULL),
    (900101, TIMESTAMP '2024-03-02 00:00:01', 7, 'click',
     CAST('Infinity' AS DOUBLE), NULL),
    (900102, TIMESTAMP '2024-03-02 00:00:02', CAST(1099511627776 AS BIGINT),
     'view', 1.5, NULL)
  ) t(event_id, ts, user_id, event_type, value, props)
) TO '{dst}/events.parquet' (FORMAT PARQUET)
"""
    )
    # Hostile document shapes: null body, empty body, whitespace-only
    # body + null lang, unicode/emoji + null source. The engine-wide
    # invariant under test: a null/empty body has ZERO tokens and ZERO
    # shingles (never a null-propagating feature row or a phantom ''
    # shingle), and no text query may emit nullable-int/bool drift or
    # divide on an empty set because of it.
    con.sql(
        f"""
COPY (
  SELECT * FROM '{src}/documents.parquet'
  UNION ALL BY NAME
  SELECT * FROM (VALUES
    (900001, CAST(NULL AS VARCHAR), 'en', 'srcdirty', CAST(NULL AS BIGINT)),
    (900002, '', 'en', 'srcdirty', 0),
    (900003, '   ', CAST(NULL AS VARCHAR), 'srcdirty', 3),
    (900004, 'émoji 🙂 çedilla ünïcode 🙂 wort wort wort', 'fr',
     CAST(NULL AS VARCHAR), 42),
    (900005, CAST(NULL AS VARCHAR), 'xnull', 'srcdirty', CAST(NULL AS BIGINT)),
    (CAST(NULL AS BIGINT), 'orphan body with words words words', 'en',
     'srcdirty', 34),
    (900100, 'first copy of a duplicated id', 'en', 'srcdirty', 30),
    (900100, 'second copy same id different text', 'en', 'srcdirty', 35)
  ) t(doc_id, text, lang, source, n_chars)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
"""
    )
    con.sql(
        f"""
COPY (
  SELECT * FROM '{src}/embeddings.parquet'
  UNION ALL BY NAME
  SELECT * FROM (
    SELECT 900001 AS vec_id,
           list_transform(embedding, x -> CAST(0.0 AS FLOAT)) AS embedding,
           label
    FROM '{src}/embeddings.parquet' LIMIT 1
  )
  UNION ALL BY NAME
  SELECT * FROM (
    SELECT 900002 AS vec_id, CAST(NULL AS FLOAT[]) AS embedding, label
    FROM '{src}/embeddings.parquet' LIMIT 1
  )
  UNION ALL BY NAME
  SELECT * FROM (
    SELECT CAST(NULL AS BIGINT) AS vec_id, embedding, label
    FROM '{src}/embeddings.parquet' WHERE embedding IS NOT NULL LIMIT 1
  )
  UNION ALL BY NAME
  SELECT * FROM (
    SELECT 900103 AS vec_id,
           list_transform(embedding, x -> CAST('NaN' AS FLOAT)) AS embedding,
           label
    FROM '{src}/embeddings.parquet' WHERE embedding IS NOT NULL LIMIT 1
  )
  UNION ALL BY NAME
  SELECT * FROM (
    SELECT 900104 AS vec_id,
           list_prepend(CAST('NaN' AS FLOAT), embedding[2:]) AS embedding,
           label
    FROM '{src}/embeddings.parquet' WHERE embedding IS NOT NULL LIMIT 1
  )
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
"""
    )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfdirty"
    build(src, dst)
    print(f"dirty testdata at {dst} (from {src})")
