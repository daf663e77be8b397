"""Scale rehearsal for the WARC/container ingestion family.

The graded fixtures are ~2 KB archives — they prove cross-engine
correctness, not scale. This rehearsal generates a corpus of N
synthetic archives (default 192 x ~1 MB, both plain .warc and
per-record-gzip .warc.gz twins) in /tmp, runs the SAME reusable walks
the keys use (`warc_records`, `llm_warc_cdx`'s frame walk,
`warc_gzip_records`, `warc_html_bodies`), and reports wall time at 1x
and 2x corpus size plus driver RSS — the evidence SCALE.md records
per the rehearse-before-claim rule.

What scale-correct looks like here:
- wall grows ~linearly with corpus bytes (the walks are one pass,
  archives never co-shuffle);
- the scan parallelizes across archives (binaryFile packs whole
  files into input partitions);
- driver RSS stays flat (rows returned are index-sized metadata,
  payload bytes never reach the driver).

Usage: python tools/rehearse_warc_scale.py [n_archives]
"""

from __future__ import annotations

import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_media_fixtures import warc_bytes, warc_gz_bytes  # noqa: E402

BASE = "/tmp/warc_scale"


def gen_corpus(n_archives: int, recs_per_archive: int = 96) -> str:
    out = os.path.join(BASE, f"n{n_archives}")
    if os.path.isdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    for i in range(n_archives):
        recs = [("warcinfo", "", f"software: rehearsal/{i}\r\n".encode())]
        for j in range(recs_per_archive):
            # ~20 KB of deterministic HTML per response => ~1 MB/archive
            body = (
                f"<html><body><h1>doc {i}-{j}</h1>"
                + f"<p>filler {i}-{j} paragraph with words</p>" * 400
                + "".join(
                    f'<a href="http://ex.com/{i}/{j}/{k}">l{k}</a>'
                    for k in range(8)
                )
                + "</body></html>"
            ).encode()
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            )
            recs.append(("response", f"http://ex.com/{i}/{j}", payload))
        with open(os.path.join(out, f"crawl_{i:04d}.warc"), "wb") as f:
            f.write(warc_bytes(recs))
        with open(os.path.join(out, f"crawlgz_{i:04d}.warc.gz"), "wb") as f:
            f.write(warc_gz_bytes(recs))
    return out


def gen_wiki(n_dumps: int, pages_per_dump: int = 64) -> str:
    out = os.path.join(BASE, f"wiki{n_dumps}")
    if os.path.isdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    from tools.gen_media_fixtures import wiki_dump_bytes

    for i in range(n_dumps):
        _plain, multi = wiki_dump_bytes(i, n_pages=pages_per_dump)
        with open(os.path.join(out, f"wiki_{i:04d}.xml.bz2"), "wb") as f:
            f.write(multi)
    return out


def run(spark, directory: str) -> dict:
    from pyspark.sql import functions as F

    from hadoop_tools_spark.operators.multimodal import (
        read_assets,
        warc_gzip_records,
        warc_html_bodies,
        warc_records,
    )

    def edges_df():
        return warc_html_bodies(
            read_assets(spark, directory, glob="crawl_*.warc")
        ).select(
            F.explode(
                F.regexp_extract_all(
                    "html", F.lit(r'href="([^"]+)"'), F.lit(1)
                )
            )
        )

    ops = {
        "records": lambda: warc_records(
            read_assets(spark, directory, glob="crawl_*.warc")
        ),
        "gzip": lambda: warc_gzip_records(
            read_assets(spark, directory, glob="crawlgz_*")
        ),
        "links": edges_df,
    }
    t, rows = {}, {}
    for name, mk in ops.items():
        walls = []
        for _ in range(2):  # min-of-2: absorbs stragglers/JIT noise
            t0 = time.time()
            rows[name] = mk().count()
            walls.append(time.time() - t0)
        t[name] = min(walls)
    return {"rows": (rows["records"], rows["gzip"], rows["links"]),
            "wall": t}


def main() -> None:
    # one arg = legacy 2x mode (n//2 and n); several args = explicit
    # archive counts, e.g. `128 1024` for the 8x-bytes sweep;
    # `zip N M` runs only the ZIP leg (llm_zip_members at scale)
    if sys.argv[1:2] == ["zip"]:
        from hadoop_tools_spark.session import get_spark

        scales = tuple(int(a) for a in sys.argv[2:]) or (96, 192)
        run_zip(get_spark(), scales)
        return
    # `mp4 N M` runs only the MP4 leg (llm_mp4_samples at scale)
    if sys.argv[1:2] == ["mp4"]:
        from hadoop_tools_spark.session import get_spark

        scales = tuple(int(a) for a in sys.argv[2:]) or (96, 192)
        run_mp4(get_spark(), scales)
        return
    argv = [int(a) for a in sys.argv[1:]]
    scales = tuple(argv) if len(argv) > 1 else (
        ((argv[0] // 2, argv[0]) if argv else (96, 192))
    )
    n = scales[-1]
    from hadoop_tools_spark.session import get_spark

    spark = get_spark()
    # warm the JVM + Python workers on the graded fixtures so the 1x
    # measurement isn't charged for session startup
    from hadoop_tools_spark.operators.multimodal import MEDIA_DIR

    run(spark, MEDIA_DIR)
    results = {}
    for scale in scales:
        d = gen_corpus(scale)
        size_mb = sum(
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        ) / 1e6
        # partition count of the binaryFile scan = the walk's parallelism
        from hadoop_tools_spark.operators.multimodal import read_assets

        parts = read_assets(spark, d, glob="crawl_*.warc").rdd.getNumPartitions()
        results[scale] = run(spark, d)
        results[scale]["size_mb"] = round(size_mb, 1)
        results[scale]["scan_partitions"] = parts
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        print(
            f"n={scale}: {size_mb:.0f} MB, {parts} scan partitions, "
            f"rows={results[scale]['rows']}, "
            f"wall={ {k: round(v, 2) for k, v in results[scale]['wall'].items()} }, "
            f"driver_rss={rss_mb:.0f} MB"
        )
    lo, hi = results[scales[0]], results[scales[-1]]
    factor = hi["size_mb"] / max(lo["size_mb"], 1e-9)
    for op in ("records", "gzip", "links"):
        ratio = hi["wall"][op] / max(lo["wall"][op], 1e-9)
        print(f"{op}: {factor:.1f}x data -> {ratio:.2f}x wall")

    # staged families: wiki multistream walk + CDX ranged fetch
    from pyspark.sql import functions as F

    from hadoop_tools_spark.operators.multimodal import (
        read_assets,
        warc_fetch,
    )
    from hadoop_tools_spark.operators.multimodal import wikidump_pages

    # the wiki walk's scale story is covered at <=256 dumps; don't pay
    # a 1024-dump XML generation when sweeping the WARC corpus higher
    for scale in [s for s in scales if s <= 256][:2]:
        d = gen_wiki(scale)
        size_mb = sum(
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        ) / 1e6
        walls = []
        for _ in range(2):
            t0 = time.time()
            n_pages = wikidump_pages(
                read_assets(spark, d, glob="wiki_*.xml.bz2")
            ).count()
            walls.append(time.time() - t0)
        print(f"wiki n={scale}: {size_mb:.0f} MB bz2, {n_pages} pages, "
              f"wall={min(walls):.2f}s")

    # fetch: index the big WARC corpus once, then point-fetch ~10% of
    # URIs via ranged reads; compare against the full-scan wall
    d = gen_corpus(n)
    from hadoop_tools_spark.operators.multimodal import warc_records as wr

    cdx_df = None
    from hadoop_tools_spark.operators.multimodal import read_assets as ra

    def build_cdx():
        # llm_warc_cdx is pinned to MEDIA_DIR; same walk, this corpus
        import pandas as pd

        from hadoop_tools_spark.operators.multimodal import _warc_frames

        assets = ra(spark, d, glob="crawl_*.warc")

        def walk(batches):
            from hadoop_tools_spark.operators.multimodal import (
                _rec_headers,
            )
            for pdf in batches:
                out = {"path": [], "target_uri": [], "rec_offset": [],
                       "rec_length": []}
                for path, blob in zip(pdf["path"], pdf["content"]):
                    for off, ln, hdr, _p in _warc_frames(bytes(blob)):
                        _t, uri = _rec_headers(hdr)
                        out["path"].append(path)
                        out["target_uri"].append(uri)
                        out["rec_offset"].append(off)
                        out["rec_length"].append(ln)
                yield pd.DataFrame(out)

        from pyspark.sql import types as T
        return assets.mapInPandas(walk, schema=T.StructType([
            T.StructField("path", T.StringType()),
            T.StructField("target_uri", T.StringType()),
            T.StructField("rec_offset", T.LongType()),
            T.StructField("rec_length", T.LongType()),
        ]))

    t0 = time.time()
    cdx_df = build_cdx().cache()
    n_idx = cdx_df.count()
    t_index = time.time() - t0
    t0 = time.time()
    n_scan = wr(ra(spark, d, glob="crawl_*.warc")).count()
    t_scan = time.time() - t0
    line = f"fetch: index {n_idx} recs in {t_index:.2f}s; full scan {n_scan} in {t_scan:.2f}s"
    for mod in (10, 1000):
        wanted = cdx_df.filter(F.abs(F.hash("target_uri")) % mod == 0)
        t0 = time.time()
        n_hit = warc_fetch(wanted).filter("fetch_ok").count()
        t_fetch = time.time() - t0
        line += f"; ranged-fetch {n_hit} (1/{mod}) in {t_fetch:.2f}s"
    print(line)
    shutil.rmtree(BASE, ignore_errors=True)




def gen_zip_corpus(n_archives: int, members_per_zip: int = 64) -> str:
    """~1 MB ZIP shards: mixed stored/deflated members (~16 KB each,
    deterministic bytes), the llm_zip_members scale fixture."""
    import zipfile

    out = os.path.join(BASE, f"zip{n_archives}")
    if os.path.isdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    for i in range(n_archives):
        path = os.path.join(out, f"zipds_{i:04d}.zip")
        with zipfile.ZipFile(path, "w") as zf:
            for j in range(members_per_zip):
                data = bytes(
                    (j * 7 + i * 31 + k) % 256 for k in range(4096)
                ) + (f"doc {i}-{j} " * 1200).encode()
                zi = zipfile.ZipInfo(
                    f"docs/d{j:04d}.bin", date_time=(1980, 1, 1, 0, 0, 0)
                )
                zi.compress_type = (
                    zipfile.ZIP_DEFLATED if j % 2 else zipfile.ZIP_STORED
                )
                zi.create_system = 3
                zf.writestr(zi, data)
    return out


def run_zip(spark, scales) -> None:
    """ZIP leg of the container-family rehearsal: same linear-wall /
    flat-RSS expectations as the WARC walks, plus the decode cost
    (every deflated member is inflated and CRC'd in the task)."""
    from hadoop_tools_spark.operators.multimodal import (
        read_assets,
        zip_members,
    )

    results = {}
    for scale in scales:
        d = gen_zip_corpus(scale)
        size_mb = sum(
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        ) / 1e6
        walls, n_rows = [], 0
        for _ in range(2):
            t0 = time.time()
            n_rows = zip_members(
                read_assets(spark, d, glob="zipds_*.zip")
            ).count()
            walls.append(time.time() - t0)
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        results[scale] = {"size_mb": size_mb, "wall": min(walls)}
        print(
            f"zip n={scale}: {size_mb:.0f} MB, {n_rows} members, "
            f"wall={min(walls):.2f}s, driver_rss={rss_mb:.0f} MB"
        )
    lo, hi = results[scales[0]], results[scales[-1]]
    factor = hi["size_mb"] / max(lo["size_mb"], 1e-9)
    print(f"zip: {factor:.1f}x data -> "
          f"{hi['wall'] / max(lo['wall'], 1e-9):.2f}x wall")


def gen_mp4_corpus(n_shards: int, samples_per_shard: int = 96) -> str:
    """~1 MB MP4 shards: MJPEG sample payloads (8 distinct deterministic
    frames cycled), multi-run stsc chunking, alternating stco/co64 —
    the llm_mp4_samples scale fixture."""
    import numpy as np

    from hadoop_tools_spark.operators.jpeg import encode_jpeg
    from hadoop_tools_spark.operators.mp4 import encode_mp4

    out = os.path.join(BASE, f"mp4{n_shards}")
    if os.path.isdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    w, h = 48, 32
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base_jpegs = [
        encode_jpeg(
            np.stack(
                [(xx * 3 + t * 10) % 256, (yy * 5 + t * 7) % 256,
                 (xx + yy + t * 13) % 256],
                axis=2,
            ).astype(np.uint8),
            quality=90,
        )
        for t in range(8)
    ]
    for i in range(n_shards):
        jpegs = [base_jpegs[(i + k) % 8] for k in range(samples_per_shard)]
        with open(os.path.join(out, f"mp4_{i:04d}.mp4"), "wb") as f:
            f.write(encode_mp4(jpegs, w, h, fps=5,
                               samples_per_chunk=3 + i % 3,
                               co64=bool(i % 2)))
    return out


def run_mp4(spark, scales) -> None:
    """MP4 leg of the container-family rehearsal: the stbl index walk
    plus a REAL JPEG decode per sample — wall should stay ~linear in
    bytes and driver RSS flat (payloads never leave the executors)."""
    from hadoop_tools_spark.operators.multimodal import (
        mp4_samples_df,
        read_assets,
    )

    results = {}
    for scale in scales:
        d = gen_mp4_corpus(scale)
        size_mb = sum(
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        ) / 1e6
        walls, n_rows = [], 0
        for _ in range(2):
            t0 = time.time()
            n_rows = mp4_samples_df(
                read_assets(spark, d, glob="mp4_*.mp4")
            ).count()
            walls.append(time.time() - t0)
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        results[scale] = {"size_mb": size_mb, "wall": min(walls)}
        print(
            f"mp4 n={scale}: {size_mb:.0f} MB, {n_rows} samples, "
            f"wall={min(walls):.2f}s, driver_rss={rss_mb:.0f} MB"
        )
    lo, hi = results[scales[0]], results[scales[-1]]
    factor = hi["size_mb"] / max(lo["size_mb"], 1e-9)
    print(f"mp4: {factor:.1f}x data -> "
          f"{hi['wall'] / max(lo['wall'], 1e-9):.2f}x wall")


if __name__ == "__main__":
    main()
