"""Deterministic synthetic second scale decade (r8 verdict #1).

`/root/testdata` tops out at sf0.1, so the measured scaling curves
cover only one decade (sf0.01 -> sf0.1) — a regime where per-query
fixed cost still dominates several rows.  This tool self-replicates the
sf0.1 `documents` / `embeddings` / `events` tables x10 into a synthetic
sf1 directory so `tools/scaling_curves.py --sf-small ... --sf-big ...`
can measure the sf0.1 -> sf1 decade too.  TPC-H tables are symlinked
unchanged (the dedup/similarity/funnel families under measurement never
read them at more than sf0.1 anyway).

Replication is seed-free and content-independent across copies — a
naive x10 copy would make every document a 10-way exact duplicate and
blow candidate-pair counts up quadratically (45 pairs per group), which
measures the duplicate structure of the COPY SCHEME, not the operator:

* documents: copy k prefixes every whitespace token with ``c<k>`` —
  within-copy duplicate/near-dup structure is preserved exactly (the
  transform is a bijection on token vocabulary), while cross-copy
  shingle/MinHash/SimHash overlap drops to zero.  doc_id += k * 10^9
  keeps eval-destined (%10) and split-bucket (hash) distributions.
  n_chars is recomputed from the new text.
* embeddings: copy k rotates the 64-dim vector left by k % 64
  positions and NEGATES it when k // 64 is odd — norm- and
  distribution-preserving, within-copy geometry identical, cross-copy
  cosine decorrelated.  The negation matters only past 64 copies
  (third decade): plain rotation is periodic mod the dimension, so
  copy 64 would otherwise be an exact value-level duplicate of copy 0
  and the measurement would see the copy scheme, not the operator;
  with the sign flip the same-rotation pair lands at cosine -1 —
  maximally far for every positive-threshold consumer.
  vec_id += k * 10^9.
* events: ids offset (event_id/user_id += k * 10^9); ts/type/value
  unchanged — the keyed-dedup and sessionization operators key on
  (user, type, time), so offsetting users multiplies the key space the
  way a bigger feed would.

Usage:
    python tools/gen_scale_decade.py [--out DIR] [--copies N] [--src DIR]

Default out: <repo>/.synthdata/sf1 (gitignored), copies: 10,
src: /root/testdata/sf0.1.  NOTE: TPC-H tables are emitted as
ABSOLUTE symlinks into --src (they are never scaled); the output
directory therefore dangles if the source root moves or the output
is copied to another machine — regenerate (seconds) rather than
copying.
"""

from __future__ import annotations

import os
import sys

import duckdb

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
SRC = "/root/testdata/sf0.1"
ID_OFF = 10**9

TPCH = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
]


def generate(out_dir: str, copies: int = 10, src: str = SRC) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ks AS SELECT unnest(range({copies})) AS k")

    con.execute(
        f"""
        COPY (
          SELECT
            doc_id + k * {ID_OFF} AS doc_id,
            CASE WHEN k = 0 THEN text
                 ELSE list_aggr(
                        list_transform(
                          string_split(text, ' '),
                          t -> 'c' || CAST(k AS VARCHAR) || t
                        ), 'string_agg', ' ')
            END AS text,
            lang,
            source,
            CASE WHEN k = 0 THEN n_chars
                 ELSE CAST(length(list_aggr(
                        list_transform(
                          string_split(text, ' '),
                          t -> 'c' || CAST(k AS VARCHAR) || t
                        ), 'string_agg', ' ')) AS BIGINT)
            END AS n_chars
          FROM '{src}/documents.parquet', ks
          ORDER BY doc_id
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )

    con.execute(
        f"""
        COPY (
          SELECT
            vec_id + k * {ID_OFF} AS vec_id,
            CASE WHEN k = 0 THEN embedding
                 ELSE list_transform(
                        list_concat(
                          embedding[((k % 64) + 1):],
                          embedding[1:(k % 64)]
                        ),
                        x -> CASE WHEN (k // 64) % 2 = 1
                             THEN -x ELSE x END
                 )::FLOAT[]
            END AS embedding,
            label
          FROM '{src}/embeddings.parquet', ks
          ORDER BY vec_id
        ) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)
        """
    )

    con.execute(
        f"""
        COPY (
          SELECT
            event_id + k * {ID_OFF} AS event_id,
            ts,
            user_id + k * {ID_OFF} AS user_id,
            event_type,
            value,
            props
          FROM '{src}/events.parquet', ks
          ORDER BY event_id
        ) TO '{out_dir}/events.parquet' (FORMAT PARQUET)
        """
    )

    for t in TPCH:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            # absolute symlink: cheap, but the output directory is
            # machine-local — copy the TPC-H files instead if the
            # synthetic dir must survive a move (documented in --help)
            os.symlink(os.path.abspath(os.path.join(src, f"{t}.parquet")), dst)

    for t in ("documents", "embeddings", "events"):
        n = con.execute(
            f"SELECT count(*) FROM '{out_dir}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


def main() -> int:
    argv = sys.argv[1:]
    out = (
        argv[argv.index("--out") + 1]
        if "--out" in argv
        else os.path.join(REPO, ".synthdata", "sf1")
    )
    copies = (
        int(argv[argv.index("--copies") + 1]) if "--copies" in argv else 10
    )
    src = argv[argv.index("--src") + 1] if "--src" in argv else SRC
    generate(out, copies, src=src)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
