"""Deterministic scale-factor generator for the sf1 scale probe.

The driver ships read-only testdata at sf0.001/0.01/0.1; the gates are
proven scale-robust across those three levels.  This script synthesizes a
10x-larger level (sf1 ~= 50k docs / 6M lineitem / 1M events) with the
SAME schemas and value domains so the full Spark-vs-DuckDB gate sweep and
the headline bench can run one order of magnitude up.  Everything is
seeded — two runs produce byte-identical tables.

Construction per table:
* documents / embeddings / events — generated FRESH at 10x with the base
  tables' content model (word vocabulary read from the base documents,
  same length range, same lang/source/event_type/label distributions).
  Fresh generation (not replication) matters: replicating documents 10x
  would plant artificial 10-clone near-duplicate families and turn every
  near-dup gate into the pathological dense-family case.
* orders / lineitem — replicated ``scale`` times with shifted
  o_orderkey/l_orderkey (FK integrity preserved: the same customers,
  parts and suppliers get 10x the transactions — realistic fact-table
  growth; dims don't scale with facts).
* region / nation / customer / supplier / part — copied as-is (dims).

Usage: python scripts/gen_sf.py [--scale 10] [--out /tmp/sf1]
       [--base /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import datetime as dt
import os
import random
import shutil

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
EVENT_TYPES = ["view", "click", "error", "signup", "purchase"]


#: long-tail filler vocabulary size.  The base tables draw every word from
#: a 31-word vocabulary; at 10x the doc count that tiny shingle space makes
#: nearly every doc pair an LSH near-dup CANDIDATE (a vocabulary artifact —
#: the first sf1 sweep ground for 20+ min inside the minhash verify join).
#: Real web text has a 10^4–10^5 word vocabulary, so shingle collisions are
#: rare; mixing base-vocab words (keeps gazetteer mention density for the
#: kg operators) with a long-tail filler restores that property.
FILLER_VOCAB = 20_000
BASE_WORD_FRAC = 0.35


def gen_documents(base: str, out: str, scale: int, seed: int = 71) -> None:
    vocab = [
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
            f"FROM '{base}/documents.parquet' ORDER BY w"
        ).fetchall()
    ]
    n_base = duckdb.sql(f"SELECT count(*) FROM '{base}/documents.parquet'").fetchone()[0]
    n = n_base * scale
    rows_text, rows_lang, rows_src = [], [], []
    for i in range(n):
        rng = random.Random(f"gen:{seed}:{i}")
        if i > 0 and rng.random() < 0.002:  # base data's ~0.2% exact-dup rate
            rows_text.append(rows_text[i - 1])
        else:
            nw = rng.randint(10, 100)
            rows_text.append(
                " ".join(
                    rng.choice(vocab)
                    if rng.random() < BASE_WORD_FRAC
                    else f"w{rng.randrange(FILLER_VOCAB)}"
                    for _ in range(nw)
                )
            )
        rows_lang.append(rng.choices(LANGS, weights=LANG_W)[0])
        rows_src.append(f"src{rng.randrange(20)}")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(rows_text, pa.string()),
            "lang": pa.array(rows_lang, pa.string()),
            "source": pa.array(rows_src, pa.string()),
            "n_chars": pa.array([len(t) for t in rows_text], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")


def gen_embeddings(base: str, out: str, scale: int, seed: int = 72) -> None:
    n_base, dim = duckdb.sql(
        f"SELECT count(*), max(len(embedding)) FROM '{base}/embeddings.parquet'"
    ).fetchone()
    n = n_base * scale
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 2.0, size=(10, dim))
    labels = rng.integers(0, 10, size=n)
    vecs = (centers[labels] + rng.normal(0.0, 1.0, size=(n, dim))).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1)), dim
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")


def gen_events(base: str, out: str, scale: int, seed: int = 73) -> None:
    n_base, n_users = duckdb.sql(
        f"SELECT count(*), count(DISTINCT user_id) FROM '{base}/events.parquet'"
    ).fetchone()
    n = n_base * scale
    span = 30 * 86400.0  # the base table's 30-day window
    rng = np.random.default_rng(seed)
    # near-sorted timestamps like the base table (event_id increases with ts)
    secs = np.arange(n) * (span / n) + rng.uniform(0, span / n, size=n)
    base_us = int(
        (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).total_seconds() * 1e6
    )
    ts = pa.array(base_us + (secs * 1e6).astype(np.int64), pa.timestamp("us"))
    ks = rng.integers(0, 100, size=n)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts,
            "user_id": pa.array(rng.integers(0, n_users * scale, size=n), pa.int64()),
            "event_type": pa.array(
                np.array(EVENT_TYPES)[rng.integers(0, len(EVENT_TYPES), size=n)]
            ),
            "value": pa.array(np.round(rng.uniform(0, 560.0, size=n), 2)),
            "props": pa.array([f'{{"k": {k}}}' for k in ks], pa.string()),
        }
    )
    pq.write_table(tbl, f"{out}/events.parquet")


def gen_facts(base: str, out: str, scale: int) -> None:
    con = duckdb.connect()
    n_ord = con.sql(f"SELECT max(o_orderkey)+1 FROM '{base}/orders.parquet'").fetchone()[0]
    con.sql(
        f"""COPY (
          SELECT o_orderkey + r.r * {n_ord} AS o_orderkey, o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM '{base}/orders.parquet', range({scale}) r(r)
          ORDER BY o_orderkey
        ) TO '{out}/orders.parquet' (FORMAT parquet)"""
    )
    con.sql(
        f"""COPY (
          SELECT l_orderkey + r.r * {n_ord} AS l_orderkey, l_partkey, l_suppkey,
                 l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                 l_returnflag, l_linestatus, l_shipdate
          FROM '{base}/lineitem.parquet', range({scale}) r(r)
          ORDER BY l_orderkey, l_linenumber
        ) TO '{out}/lineitem.parquet' (FORMAT parquet)"""
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for dim in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(f"{args.base}/{dim}.parquet", f"{args.out}/{dim}.parquet")
    gen_documents(args.base, args.out, args.scale)
    gen_embeddings(args.base, args.out, args.scale)
    gen_events(args.base, args.out, args.scale)
    gen_facts(args.base, args.out, args.scale)
    for t in sorted(os.listdir(args.out)):
        p = os.path.join(args.out, t)
        n = duckdb.sql(f"SELECT count(*) FROM '{p}'").fetchone()[0]
        print(f"{t}: {n} rows, {os.path.getsize(p) // 1024} KiB")


if __name__ == "__main__":
    main()
