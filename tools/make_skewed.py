"""Zipfian-skew variant of the sf0.1 fixtures (VERDICT r6 ask #2).

Every skew guard in the engine (`_CN_CAP` common-neighbor prune, the
inverted index's df band, salted joins, AQE skew splitting) was
justified in prose against UNIFORM fixtures — no zipfian key had ever
hit them. A real 100 TB corpus is power-law; this tool rewrites the
key-frequency distributions of sf0.1 (same row counts, same schemas,
referential integrity preserved) so `tools/rehearse_skew.py` can
measure the guards instead of trusting them:

- ``lineitem.l_suppkey`` / ``lineitem.l_partkey``: zipf(s=1.1) over
  the existing supplier/part keys — the hottest supplier receives
  ~16% of all lineitem rows (~95k rows on ONE join key), the hottest
  part likewise (one reducer's worth in any unguarded key-partitioned
  shuffle).
- ``orders.o_custkey``: zipf over customers — hot customers with
  thousands of orders (graph edge fan-out, sessionization-adjacent).
- ``events.user_id``: zipf over the user population — one user owns
  ~16% of the event stream (sessionize window skew).
- ``documents.text``: five zipf-sampled hot tokens prepended per doc
  from a 50-token vocab — the top token lands in a stopword-like
  share of documents, spiking term df (inverted index / BM25) and
  shared-shingle block sizes (containment).
- ``embeddings.embedding``: 30% of vectors collapsed into one hot
  cluster (centroid + sigma=0.05 noise) — LSH buckets and SemDeDup
  cluster sizes go power-law.

All remaps draw keys from the EXISTING key sets, so every join still
resolves and every oracle still runs against the same parquet.
Deterministic (fixed seeds). Row counts match sf0.1 exactly, so
skew-vs-uniform wall ratios compare like for like.

Usage: python tools/make_skewed.py [/tmp/sfskew]
       SKEW_SRC=/tmp/sf1 python tools/make_skewed.py /tmp/sf1skew
(SKEW_SRC picks the uniform fixture to skew-rewrite; default sf0.1 —
the sf1 variant is the r7 verdict ask #4 rehearsal input, where the
~18%-hot key is ~1.1M rows and AQE skew handling becomes observable.)
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SKEW_SRC", "/root/testdata/sf0.1")
S = 1.1  # zipf exponent — power-law-but-heavy, the web-corpus regime


def zipf_choice(rng, keys: np.ndarray, size: int) -> np.ndarray:
    """Draw ``size`` keys from ``keys`` with zipf(s=S) frequencies.

    Rank order is randomized (seeded) so the hot key is not simply the
    smallest id — hot keys land anywhere in the key domain, the way a
    viral user or stopword does.
    """
    ranked = rng.permutation(keys)
    p = np.arange(1, len(ranked) + 1, dtype=np.float64) ** -S
    p /= p.sum()
    return ranked[rng.choice(len(ranked), size=size, p=p)]


def remap_columns(src: str, dest: str, remaps: dict[str, np.ndarray]) -> None:
    tbl = pq.read_table(src)
    for col, values in remaps.items():
        idx = tbl.schema.get_field_index(col)
        tbl = tbl.set_column(
            idx, col, pa.array(values, type=tbl.schema.field(col).type)
        )
    pq.write_table(tbl, dest, row_group_size=200_000)


def main(dest: str) -> None:
    os.makedirs(dest, exist_ok=True)

    # dims and untouched tables: straight copies
    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{dest}/{t}.parquet")
        print(t, "copied")

    supp = pq.read_table(f"{SRC}/supplier.parquet", columns=["s_suppkey"])
    part = pq.read_table(f"{SRC}/part.parquet", columns=["p_partkey"])
    cust = pq.read_table(f"{SRC}/customer.parquet", columns=["c_custkey"])
    supp_keys = supp.column("s_suppkey").to_numpy()
    part_keys = part.column("p_partkey").to_numpy()
    cust_keys = cust.column("c_custkey").to_numpy()

    n_li = pq.read_metadata(f"{SRC}/lineitem.parquet").num_rows
    rng = np.random.default_rng(71)
    remap_columns(
        f"{SRC}/lineitem.parquet",
        f"{dest}/lineitem.parquet",
        {
            "l_suppkey": zipf_choice(rng, supp_keys, n_li),
            "l_partkey": zipf_choice(rng, part_keys, n_li),
        },
    )
    print("lineitem", n_li, "(l_suppkey, l_partkey zipfian)")

    n_o = pq.read_metadata(f"{SRC}/orders.parquet").num_rows
    rng = np.random.default_rng(72)
    remap_columns(
        f"{SRC}/orders.parquet",
        f"{dest}/orders.parquet",
        {"o_custkey": zipf_choice(rng, cust_keys, n_o)},
    )
    print("orders", n_o, "(o_custkey zipfian)")

    ev = pq.read_table(f"{SRC}/events.parquet")
    users = np.unique(ev.column("user_id").to_numpy())
    rng = np.random.default_rng(73)
    remap_columns(
        f"{SRC}/events.parquet",
        f"{dest}/events.parquet",
        {"user_id": zipf_choice(rng, users, ev.num_rows)},
    )
    print("events", ev.num_rows, "(user_id zipfian)")

    # documents: prepend 5 zipf-sampled hot tokens per doc. n_chars is
    # kept CONSISTENT with the new text (keys derive stats from it).
    docs = pq.read_table(f"{SRC}/documents.parquet")
    rng = np.random.default_rng(74)
    vocab = np.array([f"hotword{i}" for i in range(50)])
    texts = docs.column("text").to_pylist()
    new_texts = []
    for t in texts:
        toks = zipf_choice(rng, vocab, 5)
        new_texts.append(" ".join(toks) + " " + (t or ""))
    docs = docs.set_column(
        docs.schema.get_field_index("text"), "text", pa.array(new_texts)
    )
    docs = docs.set_column(
        docs.schema.get_field_index("n_chars"),
        "n_chars",
        pa.array([len(t) for t in new_texts], type=pa.int64()),
    )
    pq.write_table(docs, f"{dest}/documents.parquet")
    print("documents", docs.num_rows, "(5 zipfian hot tokens prepended)")

    # embeddings: 30% of vectors pulled into one hot cluster
    emb_tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    emb = np.vstack(emb_tbl.column("embedding").to_pylist()).astype(np.float32)
    rng = np.random.default_rng(75)
    hot = rng.random(len(emb)) < 0.30
    # the centroid must be a REAL direction, not the corpus mean: the
    # mean of spread vectors is ~0, and normalizing (0 + noise) yields
    # uniformly random directions — no cluster at all (caught when the
    # first rehearsal returned identical near-dup pair counts on both
    # fixtures). An existing vector keeps the hot cluster tight after
    # the Normalizer.
    centroid = emb[0] / max(np.linalg.norm(emb[0]), 1e-9)
    scale = float(np.median(np.linalg.norm(emb, axis=1)))
    emb[hot] = centroid * scale + rng.normal(
        0, 0.02 * scale, size=(int(hot.sum()), emb.shape[1])
    ).astype(np.float32)
    emb_tbl = emb_tbl.set_column(
        emb_tbl.schema.get_field_index("embedding"),
        "embedding",
        pa.array(list(emb), type=pa.list_(pa.float32())),
    )
    pq.write_table(emb_tbl, f"{dest}/embeddings.parquet")
    print("embeddings", len(emb), f"({int(hot.sum())} in the hot cluster)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew")
