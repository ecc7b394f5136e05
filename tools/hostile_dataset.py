"""Generate a hostile mini-testdata directory for edge-case differentials.

The driver REGENERATES testdata between rounds, so operators must not rely
on the current data's conveniences (all-ASCII text, no NULLs, >=10 tokens
per doc, no zero vectors). This writes a documents/embeddings pair that
concentrates the known traps:

- NULL text, empty text, whitespace-only text, single-token text
  (Spark sequence(1,0) counts DOWN / raises under ANSI; bytes(None) crashes
  a careless pandas worker; explode(NULL) silently drops rows)
- non-ASCII text in two scripts (char count != byte count)
- exact duplicate docs across sources (dedup/fingerprint paths)
- an all-zero embedding (cosine division by zero under ANSI mode)
- a NULL embedding (np.stack over None kills a careless Arrow worker; the
  SQL twin produces NULL cosines / drops the row from unnest, so every
  vector operator must reproduce those semantics, not crash)

Usage:
    python tools/hostile_dataset.py /tmp/hostile_sf
    python tools/check_correctness.py /tmp/hostile_sf [name ...]

The other eight tables are copied (truncated) from sf0.001 so the harness
can register every view.
"""

from __future__ import annotations

import os
import sys

import duckdb

BASE = "/root/testdata/sf0.001"


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hostile_sf"
    if out.startswith("-"):
        # `python tools/hostile_dataset.py --help` must print usage, not
        # create a directory literally named "--help" full of parquet.
        print(__doc__)
        return 2 if out not in ("-h", "--help") else 0
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        """
        CREATE TABLE documents AS SELECT * FROM (VALUES
          (0, 'hello', 'en', 'web', 5),
          (1, NULL, 'en', 'web', 0),
          (2, 'café au lait crème brûlée déjà vu encore une fois bien sûr', 'fr', 'books', 59),
          (3, '', 'en', 'web', 0),
          (4, 'the quick brown fox jumps over the lazy dog again and again', 'en', 'web', 60),
          (5, 'the quick brown fox jumps over the lazy dog again and again', 'en', 'cc', 60),
          (6, '日本語 テキスト の 短い 文書 です これは 単なる テスト', 'ja', 'cc', 30),
          (7, 'one', 'en', 'web', 3),
          (8, '   ', 'en', 'web', 3)
        ) t(doc_id, text, lang, source, n_chars)
        """
    )
    con.execute(f"COPY documents TO '{out}/documents.parquet' (FORMAT PARQUET)")
    con.execute(
        """
        CREATE TABLE embeddings AS
        SELECT vec_id,
               CASE WHEN vec_id = 3
                    THEN list_transform(range(64), x -> CAST(0.0 AS FLOAT))
                    WHEN vec_id = 8
                    THEN NULL
                    ELSE list_transform(range(64), x -> CAST(sin(vec_id * 64 + x) AS FLOAT))
               END AS embedding,
               CAST(vec_id % 3 AS INT) AS label
        FROM range(9) t(vec_id)
        """
    )
    con.execute(f"COPY embeddings TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    # events with the traps a regeneration could spring: non-integral and
    # non-numeric props.k, NULL event_type, a constant-value type (stddev 0),
    # and a session gap in (1800s, 1801s) that floor-to-second misses.
    con.execute(
        """
        CREATE TABLE events AS SELECT * FROM (VALUES
          (1, TIMESTAMP '2026-01-01 10:00:00.300', 1, 'click',    1.5, '{"k": 1.5}'),
          (2, TIMESTAMP '2026-01-01 10:30:00.800', 1, 'click',    2.0, '{"k": "abc"}'),
          (3, TIMESTAMP '2026-01-01 11:00:00',     1, 'purchase', 9.0, '{"k": 3}'),
          (4, TIMESTAMP '2026-01-01 10:05:00',     2, NULL,       4.0, '{"k": 7}'),
          (5, TIMESTAMP '2026-01-01 10:06:00',     2, 'view',     5.0, NULL),
          (6, TIMESTAMP '2026-01-01 10:07:00',     2, 'error',    5.0, '{}'),
          (7, TIMESTAMP '2026-01-01 10:08:00',     3, 'error',    5.0, '{"k": 2.5}'),
          (8, TIMESTAMP '2026-01-01 12:00:00',     3, 'click',    0.0, '{"k": 1}'),
          (9, TIMESTAMP '2026-01-01 12:00:30',     3, 'click',    -1.0, '{"k": 1}')
        ) t(event_id, ts, user_id, event_type, value, props)
        """
    )
    # match the real testdata's physical type: DOUBLE, not the DECIMAL(2,1)
    # DuckDB infers for the literals above
    con.execute("ALTER TABLE events ALTER value TYPE DOUBLE")
    con.execute(f"COPY events TO '{out}/events.parquet' (FORMAT PARQUET)")
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        con.execute(
            f"COPY (SELECT * FROM '{BASE}/{t}.parquet' LIMIT 100)"
            f" TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"hostile testdata written to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
