#!/usr/bin/env python
"""Generate local sf1.0 fixtures for the scale probe (r11).

The driver ships sf0.001/0.01/0.1 only; the 100-TB argument needs one
measured decade of scaling, so this builds a 10x ``documents`` +
``embeddings`` pair at ``.scale/sf1.0/`` from the read-only sf0.1
fixtures — WITHOUT distorting the duplicate structure the expensive
operators' costs depend on:

- ``documents``: 10 copies; copy c remaps every word through a
  deterministic per-copy vocabulary permutation (seed c; copy 0 is the
  identity). Within-copy shingle/ngram structure is isomorphic to the
  original (near-dup clusters keep their exact shape), while cross-copy
  word overlap collapses, so cluster COUNT scales ~10x and cluster
  SIZES stay constant — the scaling a real 10x corpus shows, not the
  100x-pairs blowup naive duplication would produce.
- ``embeddings``: copy c multiplies each dimension by a deterministic
  per-copy ±1 sign vector (seed c; copy 0 is the identity). A fixed
  orthogonal transform per copy: norms and within-copy cosine geometry
  are preserved EXACTLY, cross-copy cosine drops to the random-vector
  baseline — and unlike the r11 cyclic shift it stays distinct for any
  number of copies (a shift wraps to the identity at copy==dim).

Output stays inside the repo (.scale/ is gitignored); /root/testdata
is never written.
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
_SCALE_ROOT = Path(__file__).resolve().parent.parent / ".scale"
# --sf picks the tier: sf1.0 = 10 copies of sf0.1 (the r11 decade),
# sf3.0 = 30 copies (r12's second measured step, so linear vs n*log n
# vs memory-inflection can be told apart on the keys that probed
# ~linear over the first decade). Anything >= copies=10 uses the same
# structure-preserving transforms.
OUT = _SCALE_ROOT / "sf1.0"
COPIES = 10


def gen_documents() -> None:
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    n = len(rows)
    vocab = sorted({w for _, text, _, _ in rows for w in text.split(" ")
                    if w})
    out = {"doc_id": [], "text": [], "lang": [], "source": [],
           "n_chars": []}
    for c in range(COPIES):
        perm = list(vocab)
        if c:
            random.Random(c).shuffle(perm)
        mapping = dict(zip(vocab, perm))
        for doc_id, text, lang, source in rows:
            new_text = " ".join(mapping.get(w, w) for w in text.split(" "))
            out["doc_id"].append(c * n + doc_id)
            out["text"].append(new_text)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(new_text))
    table = pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "text": pa.array(out["text"], pa.string()),
        "lang": pa.array(out["lang"], pa.string()),
        "source": pa.array(out["source"], pa.string()),
        "n_chars": pa.array(out["n_chars"], pa.int64()),
    })
    pq.write_table(table, OUT / "documents.parquet")
    print("documents:", table.num_rows)


def gen_embeddings() -> None:
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    n = len(rows)
    out = {"vec_id": [], "embedding": [], "label": []}
    dim = len(rows[0][1])
    for c in range(COPIES):
        signs = ([1.0] * dim if not c else
                 [random.Random(c * 10007 + i).choice((1.0, -1.0))
                  for i in range(dim)])
        for vec_id, emb, label in rows:
            flipped = [v * s for v, s in zip(emb, signs)]
            out["vec_id"].append(c * n + vec_id)
            out["embedding"].append(flipped)
            out["label"].append(label)
    table = pa.table({
        "vec_id": pa.array(out["vec_id"], pa.int64()),
        "embedding": pa.array(out["embedding"], pa.list_(pa.float32())),
        "label": pa.array(out["label"], pa.int32()),
    })
    pq.write_table(table, OUT / "embeddings.parquet")
    print("embeddings:", table.num_rows)


def gen_relational() -> None:
    """10x orders/lineitem/events via key-offset replication (pure
    DuckDB SQL, vectorized). Order keys offset per copy so the
    orders<->lineitem join fans out 10x without changing per-order
    line counts; event user_ids offset per copy so sessionize/funnel
    windows see 10x USERS with unchanged per-user session shapes
    (per-key group sizes constant — the scaling a growing service
    shows). Dimension tables (customer/part/supplier/...) keep their
    sf0.1 size: fact rows reference the same dim keys, so joins fan
    out like a fact-growing warehouse. Copy those dims into the
    output dir unchanged so every key's load_table resolves."""
    import shutil

    con = duckdb.connect()
    offk = 200_000          # > max(o_orderkey) at sf0.1 (149,999)
    offu = 1_000_000        # > max user_id
    for table, sql in [
        ("orders",
         f"SELECT o.* REPLACE (o_orderkey + c * {offk} AS o_orderkey) "
         f"FROM '{SRC}/orders.parquet' o, range({COPIES}) r(c)"),
        ("lineitem",
         f"SELECT l.* REPLACE (l_orderkey + c * {offk} AS l_orderkey) "
         f"FROM '{SRC}/lineitem.parquet' l, range({COPIES}) r(c)"),
        ("events",
         f"SELECT e.* REPLACE (event_id + c * {10 * offu} AS event_id, "
         f"user_id + c * {offu} AS user_id) "
         f"FROM '{SRC}/events.parquet' e, range({COPIES}) r(c)"),
    ]:
        con.execute(f"COPY ({sql}) TO '{OUT}/{table}.parquet' "
                    "(FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'"
                    ).fetchone()[0]
        print(table, n)
    for dim in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(SRC / f"{dim}.parquet", OUT / f"{dim}.parquet")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0,
                    help="target scale factor (copies = sf / 0.1)")
    args = ap.parse_args()
    COPIES = round(args.sf / 0.1)
    OUT = _SCALE_ROOT / f"sf{args.sf}"
    OUT.mkdir(parents=True, exist_ok=True)
    gen_documents()
    gen_embeddings()
    gen_relational()
    print("done ->", OUT)
