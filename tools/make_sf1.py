"""Amplify the driver's sf0.1 fixtures 10× into a local sf1 directory.

Scale-rehearsal data generator (VERDICT r2 ask #7): each of the 10
copies is a disjoint TPC-H "world" — every scaling key is offset by
copy_index * (max_key + 1), so join fan-outs, selectivities, and group
cardinalities match a true sf1 generation. Fixed-size dims
(region, nation) are passed through untouched.

documents get a distinct leading token per copy (realistic: a 10×
corpus has ~10× the duplicate pairs, not 45× from verbatim clones —
the 40-char prefix blocks stay within-copy). embeddings get
deterministic per-copy noise for the same reason.

Usage: python tools/make_sf1.py [/tmp/sf1] [--constant-rate]

``--constant-rate`` (VERDICT r4 ask #5) additionally tags EVERY interior
word of each copy's documents with the copy index, so copies share zero
word trigrams. The default leading-token perturbation keeps 40-char
*prefix* blocks within-copy but leaves interior trigrams identical
across copies, which inflates shingle-blocked keys (llm_containment)
~COPIES× beyond a true sf1's duplicate mass; the constant-rate corpus
holds the dup rate at the sf0.1 level so their rehearsal measures
scaling, not amplification artifacts.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# defaults; override with --src DIR / --copies N (e.g. the sf10 rung
# re-amplifies /tmp/sf1 by another 10 copies: --src /tmp/sf1)
SRC = "/root/testdata/sf0.1"
COPIES = 10

#: table -> columns that carry entity keys needing per-copy offsets
KEYED = {
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "events": ("event_id", "user_id"),
}
PASSTHROUGH = ("region", "nation")


def _offsets(con) -> dict[str, int]:
    out = {}
    for tbl, cols in KEYED.items():
        for c in cols:
            src_tbl = {
                "o_orderkey": "orders", "l_orderkey": "orders",
                "o_custkey": "customer", "c_custkey": "customer",
                "l_partkey": "part", "p_partkey": "part",
                "l_suppkey": "supplier", "s_suppkey": "supplier",
                "event_id": "events",
                # events.user_id is an FK to customer: offset it with the
                # customer stride so stream-enrich joins hit every copy's
                # customers, not just copy 0 (ADVICE r3)
                "user_id": "customer",
            }[c]
            key = {"o_orderkey": "o_orderkey", "l_orderkey": "o_orderkey",
                   "o_custkey": "c_custkey", "c_custkey": "c_custkey",
                   "l_partkey": "p_partkey", "p_partkey": "p_partkey",
                   "l_suppkey": "s_suppkey", "s_suppkey": "s_suppkey",
                   "event_id": "event_id", "user_id": "c_custkey"}[c]
            if c not in out:
                out[c] = con.execute(
                    f"SELECT MAX({key}) + 1 FROM "
                    f"read_parquet('{SRC}/{src_tbl}.parquet')"
                ).fetchone()[0]
    return out


def main(dest: str, constant_rate: bool = False) -> None:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    off = _offsets(con)

    for t in PASSTHROUGH:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "passthrough")

    for t, cols in KEYED.items():
        selects = []
        for i in range(COPIES):
            exprs = []
            con.execute(f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')")
            schema = [r[0] for r in con.fetchall()]
            for col in schema:
                if col in cols:
                    exprs.append(f"{col} + {i * off[col]} AS {col}")
                else:
                    exprs.append(col)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM read_parquet('{SRC}/{t}.parquet')"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{dest}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 200000)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dest}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)

    # documents: per-copy distinct leading token keeps dup-blocks within-copy;
    # constant-rate mode tags EVERY interior word so cross-copy trigram
    # sharing is zero (within-copy near-dup structure is preserved — the
    # same word->w{i}word map applies to every doc in the copy)
    max_doc = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]

    def text_expr(i: int) -> str:
        if constant_rate:
            return f"'w{i} ' || replace(text, ' ', ' w{i}') AS text"
        return f"'w{i} ' || text AS text"

    cols_doc = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchall()]
    extra = [c for c in cols_doc if c not in ("doc_id", "text", "lang")]
    tail = (", " + ", ".join(extra)) if extra else ""
    sel = " UNION ALL ".join(
        f"SELECT doc_id + {i * max_doc} AS doc_id, "
        f"{text_expr(i)}, lang{tail} "
        f"FROM read_parquet('{SRC}/documents.parquet')"
        for i in range(COPIES)
    )
    con.execute(f"COPY ({sel}) TO '{dest}/documents.parquet' (FORMAT PARQUET)")
    print("documents", con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{dest}/documents.parquet')"
    ).fetchone()[0])

    # embeddings: numpy per-copy noise (deterministic), ids offset
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    emb = np.vstack(tbl.column("embedding").to_pylist()).astype(np.float32)
    labels = tbl.column("label").to_numpy()
    max_vec = int(ids.max()) + 1
    parts = []
    for i in range(COPIES):
        rng = np.random.default_rng(1234 + i)
        noise = rng.normal(0.0, 0.1 * (i > 0), size=emb.shape).astype(np.float32)
        e = emb + noise
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(ids + i * max_vec, type=pa.int64()),
                    "embedding": pa.array(
                        list(e), type=pa.list_(pa.float32())
                    ),
                    # keep the full fixture schema: label-consuming keys
                    # (quantize, centroid, kmeans) must rehearse too
                    "label": pa.array(labels, type=pa.int32()),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{dest}/embeddings.parquet")
    print("embeddings", COPIES * len(ids))


if __name__ == "__main__":
    argv = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--constant-rate":
            continue
        elif a == "--src":
            SRC = next(it, None)
            if SRC is None:
                sys.exit("--src needs a directory argument")
        elif a == "--copies":
            c = next(it, None)
            if c is None or not c.isdigit():
                sys.exit("--copies needs an integer argument")
            COPIES = int(c)
        else:
            argv.append(a)
    main(
        argv[0] if argv else "/tmp/sf1",
        constant_rate="--constant-rate" in sys.argv[1:],
    )
