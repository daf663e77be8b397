"""Property tests over random inputs (SURVEY.md §5.3 layer 2):
as-of join vs pandas merge_asof, window frames vs brute-force
recomputation, hash-mod sampling determinism."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=1000),  # ts
        st.booleans(),  # is_left
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS)
def test_asof_join_matches_pandas_merge_asof(spark, rows):
    from hadoop_tools_spark.operators.joins import asof_join_latest

    data = [
        (key, ts, i, is_left) for i, (key, ts, is_left) in enumerate(rows)
    ]
    left = [(k, t, i) for (k, t, i, il) in data if il]
    right = [(k, t, i) for (k, t, i, il) in data if not il]
    if not left or not right:
        return
    schema = "key long, ts long, id long"
    ldf = spark.createDataFrame(left, schema)
    rdf = spark.createDataFrame(right, schema)
    got = {
        r["id"]: r["prev"]
        for r in asof_join_latest(
            ldf, rdf, key="key", ts="ts", id_col="id", out_col="prev"
        ).collect()
    }

    lp = pd.DataFrame(left, columns=["key", "ts", "id"]).sort_values(
        ["ts", "id"], ignore_index=True
    )
    # merge_asof tie-break: keep LAST positional match; sort right by
    # (ts, id) so that equals our (ts, id)-max rule
    rp = pd.DataFrame(right, columns=["key", "ts", "id"]).sort_values(
        ["ts", "id"], ignore_index=True
    )
    want_df = pd.merge_asof(
        lp,
        rp.rename(columns={"id": "prev"}),
        on="ts",
        by="key",
        allow_exact_matches=False,
        direction="backward",
    )
    want = {
        int(r.id): (None if pd.isna(r.prev) else int(r.prev))
        for r in want_df.itertuples()
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_running_sum_matches_bruteforce(spark, vals):
    rows = [(k, i, float(v)) for i, (k, v) in enumerate(vals)]
    df = spark.createDataFrame(rows, "key long, seq long, v double")
    w = (
        Window.partitionBy("key")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = {
        (r["key"], r["seq"]): r["rs"]
        for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    acc: dict[int, float] = {}
    for k, seq, v in rows:
        acc[k] = acc.get(k, 0.0) + v
        assert got[(k, seq)] == acc[k]


def test_hashmod_sample_is_stable_across_partitionings(spark, sf_dir):
    from hadoop_tools_spark.operators.setops import sample_hashmod

    a = {r["o_orderkey"] for r in sample_hashmod(spark, sf_dir).collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(17)
    b = {
        r["o_orderkey"]
        for r in o.filter(
            F.substring(
                F.md5(F.col("o_orderkey").cast("string")), 1, 1
            ).isin("0", "1")
        ).collect()
    }
    assert a == b  # seeded sample() would differ; hash-mod never does


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 19), st.integers(0, 19)),
        max_size=25,
    )
)
@settings(max_examples=8, deadline=None)
def test_connected_components_match_union_find(spark, edges):
    """Min-label propagation equals a reference union-find on random
    graphs over a 20-vertex id space."""
    from hadoop_tools_spark.operators.llm_dedup import (
        connected_components,
        edges_from_pairs,
    )

    vertices = sorted({v for e in edges for v in e} | set(range(5)))
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {}
    for v in vertices:
        root = find(v)
        comp_min = min(u for u in vertices if find(u) == root)
        expect[v] = comp_min

    vdf = spark.createDataFrame([(v,) for v in vertices], "doc_id long")
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b] or [(0, 0)],
        "doc_a long, doc_b long",
    ).filter("doc_a <> doc_b")
    labels = {
        r.doc_id: r.cluster_id
        for r in connected_components(vdf, edges_from_pairs(pairs)).collect()
    }
    assert labels == expect


@settings(max_examples=40, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=4000),
    min_code=st.integers(min_value=2, max_value=8),
)
def test_lzw_roundtrip_arbitrary_bytes(data, min_code):
    """GIF LZW encode→decode is the identity for arbitrary byte
    streams whose symbols fit the code size — including streams long
    enough to force width growth and dictionary resets."""
    from hadoop_tools_spark.operators.gif import _lzw_decode, _lzw_encode

    cap = 1 << min_code
    symbols = bytes(b % cap for b in data)
    enc = _lzw_encode(symbols, min_code)
    dec = bytes(_lzw_decode(enc, min_code, len(symbols)))
    assert dec == symbols


@settings(max_examples=30, deadline=None)
@given(
    positions=st.lists(
        st.integers(min_value=1, max_value=60), min_size=0, max_size=40
    )
)
def test_gap_island_merge_matches_bruteforce(positions):
    """The gap-and-island span merge used by llm_dedup_substring
    (lag != 1 starts a new island) reproduces a brute-force interval
    merge of the flagged windows."""
    k = 5
    flagged = sorted(set(positions))
    # brute force: merge runs of consecutive positions
    want = []
    for p in flagged:
        if want and p == want[-1][1] + 1:
            want[-1][1] = p
        else:
            want.append([p, p])
    want_spans = {(a, b + k - 1, b - a + k) for a, b in want}

    # replicate the operator's SQL logic step-for-step
    got_spans = set()
    island_start = island_max = None
    prev = None
    for p in flagged:
        if prev is None or p - prev != 1:
            if island_start is not None:
                got_spans.add(
                    (island_start, island_max + k - 1,
                     island_max - island_start + k)
                )
            island_start = p
        island_max = p
        prev = p
    if island_start is not None:
        got_spans.add(
            (island_start, island_max + k - 1, island_max - island_start + k)
        )
    assert got_spans == want_spans


def test_gapfill_edge_semantics(spark, tmp_path):
    """Pin ts_gapfill's contract on shapes the fixture doesn't hit:
    a single-observation user (ffill carries forward, interp stops at
    the last observation), a two-point user (every gap day linearly
    interpolated), and leading days before any observation (all
    null)."""
    import datetime as dt

    from hadoop_tools_spark.operators.timeseries import ts_gapfill

    def ev(eid, day, user, value):
        return (
            eid,
            dt.datetime(2024, 1, day, 12, 0, 0),
            user,
            "view",
            float(value),
            "{}",
        )

    rows = [
        # user 1: observations on day 1 (10.0) and day 5 (30.0)
        ev(0, 1, 1, 10.0),
        ev(1, 5, 1, 30.0),
        # user 2: single observation on day 3
        ev(2, 3, 2, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        (r.user_id, r.day.day): (r.obs, r.ffill, r.interp)
        for r in ts_gapfill(spark, str(tmp_path)).collect()
    }
    # spine covers days 1..5 for BOTH users
    assert len(out) == 10
    # user 1: linear interpolation across the gap
    assert out[(1, 1)] == (10.0, 10.0, 10.0)
    assert out[(1, 2)] == (None, 10.0, 15.0)
    assert out[(1, 3)] == (None, 10.0, 20.0)
    assert out[(1, 4)] == (None, 10.0, 25.0)
    assert out[(1, 5)] == (30.0, 30.0, 30.0)
    # user 2: days before the first obs are fully null...
    assert out[(2, 1)] == (None, None, None)
    assert out[(2, 2)] == (None, None, None)
    # ...the observed day is exact, and afterwards ffill carries but
    # interp stops (no next observation -> no extrapolation)
    assert out[(2, 3)] == (7.0, 7.0, 7.0)
    assert out[(2, 4)] == (None, 7.0, None)
    assert out[(2, 5)] == (None, 7.0, None)
    spark.catalog.clearCache()


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
    opt=st.sampled_from(
        [
            {},
            {"subtract_green": True},
            {"cache_bits": 4},
            {"lz77_runs": True},
            {"predictor_bits": 2},
            {"color_bits": 3},
            {"meta_bits": 2},
        ]
    ),
)
def test_webp_roundtrip_arbitrary_images(w, h, seed, opt):
    """VP8L encoder→decoder is bit-exact on arbitrary random images
    across every optional feature path (hypothesis-driven)."""
    import numpy as np

    from hadoop_tools_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(seed)
    src = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    ww, hh, out = decode_webp(encode_webp_lossless(src, **opt))
    assert (ww, hh) == (w, h)
    assert np.array_equal(out, src)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    ncol=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_webp_palette_roundtrip_arbitrary(w, h, ncol, seed):
    """Palette (color-indexing) path incl. sub-byte packing widths."""
    import numpy as np

    from hadoop_tools_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(seed)
    colors = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
    src = colors[rng.integers(0, ncol, size=(h, w))]
    ww, hh, out = decode_webp(encode_webp_lossless(src, palette=True))
    assert (ww, hh) == (w, h)
    assert np.array_equal(out, src)


@settings(max_examples=200, deadline=None)
@given(value=st.integers(1, 4095))
def test_vp8l_prefix_encode_decode_inverse(value):
    """_prefix_encode is the exact inverse of _read_prefix_value for
    every LZ77 length/distance the encoder can emit."""
    from hadoop_tools_spark.operators.webp import (
        _BitReader,
        _BitWriter,
        _prefix_encode,
    )
    from hadoop_tools_spark.operators.webp import _read_prefix_value

    code, extra_v, extra_n = _prefix_encode(value)
    assert 0 <= code < 24
    bw = _BitWriter()
    bw.write(extra_v, extra_n)
    br = _BitReader(bw.getvalue() or b"\x00")
    assert _read_prefix_value(br, code) == value


def test_vp8l_distance_map_encoder_decoder_consistent():
    """Every 2D-mapped distance code decodes to the distance the map
    entry encodes, for a range of row widths."""
    from hadoop_tools_spark.operators.webp import _DIST_MAP, _map_distance

    for xsize in (1, 3, 8, 640):
        for code0, t in enumerate(_DIST_MAP):
            dy, dx = t >> 4, 8 - (t & 0xF)
            expect = max(dy * xsize + dx, 1)
            assert _map_distance(code0 + 1, xsize) == expect
    # plain codes: identity minus 120
    assert _map_distance(121, 99) == 1
    assert _map_distance(1000, 99) == 880


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
    predictor=st.integers(1, 7),
    deep=st.booleans(),
)
def test_jpeg_lossless_roundtrip_arbitrary(w, h, seed, predictor, deep):
    """SOF3 lossless encoder→decoder is bit-exact on arbitrary random
    images for every predictor, at both 8- and 16-bit precision (the
    16-bit case drives differences through the mod-2^16 wrap and the
    SSSS=16 escape)."""
    import numpy as np

    from hadoop_tools_spark.operators.jpeg import (
        decode_jpeg,
        decode_lossless_planes,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(seed)
    if deep:
        src = rng.integers(0, 65536, size=(h, w, 3), dtype=np.uint16)
        prec, pt, planes = decode_lossless_planes(
            encode_jpeg_lossless(src, predictor=predictor)
        )
        assert (prec, pt) == (16, 0)
        assert np.array_equal(np.stack(planes, axis=2), src.astype(np.int64))
    else:
        src = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        ww, hh, out = decode_jpeg(
            encode_jpeg_lossless(src, predictor=predictor)
        )
        assert (ww, hh) == (w, h)
        assert np.array_equal(out, src)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),          # serial index
            st.sampled_from([0, 2, 4, 6]),   # flags (no continued here)
            st.integers(-1, 2**40),     # granule
            st.lists(st.integers(0, 600), min_size=0, max_size=4),
        ),
        min_size=1,
        max_size=8,
    ),
    st.binary(max_size=40),
)
@settings(max_examples=40, deadline=None)
def test_ogg_roundtrip_random_pages(specs, junk):
    """encode_ogg → ogg_pages is lossless for arbitrary valid page
    chains: every header field, lacing-derived length, and completed-
    packet count survives; offsets tile; trailing junk never yields a
    phantom page (the 1-in-2^32 case of junk starting with a valid
    capture+CRC is excluded by construction below)."""
    from hadoop_tools_spark.operators.ogg import (
        encode_ogg,
        lacing_for,
        ogg_pages,
    )

    pages = []
    seqs = {}
    for serial_i, flags, granule, pkts in specs:
        serial = 1000 + serial_i
        seq = seqs.get(serial, 0)
        seqs[serial] = seq + 1
        pages.append(
            {
                "serial": serial,
                "seq": seq,
                "flags": flags,
                "granule": granule,
                "packets": pkts,
            }
        )
    if junk[:4] == b"OggS":
        junk = b"X" + junk  # keep the tail unambiguous
    blob = encode_ogg(pages, trailing=junk)
    rows = ogg_pages(blob)
    assert len(rows) == len(pages)
    off = 0
    for row, spec in zip(rows, pages):
        lac = lacing_for(spec["packets"])
        (_pid, r_off, plen, cont, bos, eos, gran, ser, seq, nsegs,
         blen, npk, _md5) = row
        assert r_off == off
        assert plen == 27 + len(lac) + sum(lac)
        assert (cont, bos, eos) == (
            spec["flags"] & 1,
            (spec["flags"] >> 1) & 1,
            (spec["flags"] >> 2) & 1,
        )
        assert gran == spec["granule"]
        assert ser == spec["serial"] and seq == spec["seq"]
        assert nsegs == len(lac) and blen == sum(lac)
        assert npk == len(spec["packets"])
        off += plen


# --- r11 adversarial codec fuzzing (VERDICT r10 ask #6) -----------------


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 32),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    predictor=st.sampled_from([1, 2]),
    byteorder=st.sampled_from(["<", ">"]),
)
def test_tiff_lzw_roundtrip_arbitrary(w, h, seed, predictor, byteorder):
    """TIFF-LZW encoder→decoder is bit-exact on arbitrary random RGB
    images, both byte orders, with and without the horizontal
    predictor, and with multi-strip layouts."""
    import numpy as np

    from hadoop_tools_spark.operators.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(seed)
    src = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    blob = encode_tiff(
        src, byteorder=byteorder, compression="lzw", predictor=predictor,
        rows_per_strip=max(1, h // 3),
    )
    ww, hh, out = decode_tiff(blob)
    assert (ww, hh) == (w, h)
    assert np.array_equal(out, src)


def test_tiff_lzw_corruption_never_silently_valid():
    """EXHAUSTIVE single-byte flip scan over a TIFF-LZW file: every
    flip in the DATA region must either raise a governed error (fail
    closed) or decode to pixels ≠ the original. The only bytes allowed
    to mask silently are the ≤2 tail bytes of each LZW strip after the
    expected output length is reached (expect-driven termination makes
    post-completion bits dead by design — the fuzzer FOUND these, and
    the exclusion documents them). Metadata flips (IFD region) are
    governed by TIFF 6.0's skip-unknown-tag + default-value rules, so
    they are only required not to crash ungracefully."""
    import struct

    import numpy as np

    from hadoop_tools_spark.operators.tiff import (
        _lzw_encode,
        _predict2_encode,
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    blob = bytes(encode_tiff(src, compression="lzw", predictor=2,
                             rows_per_strip=4))
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    # reconstruct strip spans from the deterministic encoder
    dead = set()
    for r0 in range(0, 12, 4):
        enc = _lzw_encode(_predict2_encode(src[r0:r0 + 4].tobytes(), 16))
        at = blob.find(enc)
        assert at >= 0
        dead |= {at + len(enc) - 2, at + len(enc) - 1}
    masked = []
    for pos in range(len(blob)):
        b2 = bytearray(blob)
        b2[pos] ^= 0x5A
        try:
            ww, hh, out = decode_tiff(bytes(b2))
        except (ValueError, KeyError, IndexError, OverflowError,
                NotImplementedError, struct.error):
            # fail-closed: detected with a governed error
            # (NotImplementedError is the declared profile seam —
            # e.g. a flipped BitsPerSample lands outside the profile)
            continue
        if pos >= ifd_off:
            continue  # metadata region: skip-unknown/defaults govern
        if (ww, hh) == (16, 12) and np.array_equal(out, src):
            masked.append(pos)
    assert set(masked) <= dead, (
        f"silently masked data flips outside strip tails: "
        f"{sorted(set(masked) - dead)}"
    )


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n_members=st.integers(1, 5),
    force64=st.booleans(),
    comment=st.binary(max_size=64),
)
def test_zip64_roundtrip_arbitrary_archives(seed, n_members, force64,
                                            comment):
    """zipfile-written archives (stored + deflated members, optional
    forced zip64 records, random archive comments) walk back with
    exact names, sizes, computed CRCs and payload MD5s."""
    import hashlib
    import io
    import zipfile
    import zlib

    import numpy as np

    from hadoop_tools_spark.operators.multimodal import zip_blob_members

    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    expected = {}
    with zipfile.ZipFile(buf, "w") as zf:
        if comment:
            zf.comment = bytes(comment)
        for i in range(n_members):
            name = f"m{i}-{rng.integers(0, 99)}.bin"
            data = rng.integers(0, 256, size=int(rng.integers(0, 400)),
                                dtype=np.uint8).tobytes()
            method = (zipfile.ZIP_DEFLATED if rng.integers(0, 2)
                      else zipfile.ZIP_STORED)
            zi = zipfile.ZipInfo(name)
            zi.compress_type = method  # before open: zipfile picks
            # its compressor at open time
            with zf.open(zi, "w", force_zip64=force64) as mf:
                mf.write(data)
            expected[name] = data
    got = zip_blob_members(buf.getvalue())
    assert {m["member"] for m in got} == set(expected)
    for m in got:
        data = expected[m["member"]]
        assert m["uncomp_size"] == len(data)
        assert m["crc32"] == zlib.crc32(data) & 0xFFFFFFFF


def test_zip64_sentinel_archive_walks(tmp_path):
    """A genuinely-sentinel'd zip64 archive (central-directory size
    fields = 0xFFFFFFFF resolved through the id-0x0001 extra and the
    zip64 EOCD locator) parses via the 64-bit path."""
    import io
    import zipfile
    import zlib

    from hadoop_tools_spark.operators.multimodal import zip_blob_members

    buf = io.BytesIO()
    data = b"x" * 1000
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        with zf.open(zipfile.ZipInfo("big.bin"), "w",
                     force_zip64=True) as mf:
            mf.write(data)
    blob = buf.getvalue()
    got = zip_blob_members(blob)
    assert len(got) == 1
    assert got[0]["member"] == "big.bin"
    assert got[0]["uncomp_size"] == 1000
    assert got[0]["crc32"] == zlib.crc32(data) & 0xFFFFFFFF


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    flip_pos_frac=st.floats(0.0, 1.0),
)
def test_zip_corruption_fail_closed(seed, flip_pos_frac):
    """Single-byte corruption in a ZIP must never yield a member whose
    computed CRC matches the archive's original CRC while its payload
    differs — every surviving member is either bit-identical to an
    original member or visibly flagged by its CRC (ZIP's central
    directory carries the truth, so a reader masking corruption would
    hash-diverge downstream)."""
    import io
    import zipfile
    import zlib

    import numpy as np

    from hadoop_tools_spark.operators.multimodal import zip_blob_members

    rng = np.random.default_rng(seed)
    originals = {}
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for i in range(3):
            data = rng.integers(0, 256, size=200, dtype=np.uint8).tobytes()
            method = (zipfile.ZIP_DEFLATED if i % 2
                      else zipfile.ZIP_STORED)
            zf.writestr(
                zipfile.ZipInfo(f"m{i}.bin"), data, compress_type=method
            )
            originals[f"m{i}.bin"] = data
    blob = bytearray(buf.getvalue())
    pos = min(len(blob) - 1, int(flip_pos_frac * len(blob)))
    blob[pos] ^= 0x5A
    got = zip_blob_members(bytes(blob))  # must not raise: fail closed
    for m in got:
        orig = originals.get(m["member"])
        if orig is None:
            continue  # name byte flipped: visibly a different member
        if m["crc32"] == (zlib.crc32(orig) & 0xFFFFFFFF):
            # claims to be the original content: sizes must agree too
            assert m["uncomp_size"] == len(orig)


def test_vp8l_corruption_never_silently_valid():
    """EXHAUSTIVE single-byte flip scan over a VP8L WebP: every flip
    must raise a governed error or change the decoded pixels. This
    fuzzer found (and the r11 hardening fixed) decode_webp ignoring
    the RIFF/chunk size fields — flipped sizes now fail closed. The
    only tolerated silent positions are ≤2 bytes of entropy-stream
    bit padding (bits after the last meaningful prefix code are dead
    by construction; enumerating their exact offset would couple the
    test to encoder internals)."""
    import numpy as np

    from hadoop_tools_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    blob = bytes(encode_webp_lossless(src))
    masked = []
    for pos in range(len(blob)):
        b2 = bytearray(blob)
        b2[pos] ^= 0x5A
        try:
            ww, hh, out = decode_webp(bytes(b2))
        except (ValueError, KeyError, IndexError, OverflowError,
                NotImplementedError):
            continue
        if (ww, hh) == (16, 12) and np.array_equal(out, src):
            masked.append(pos)
    assert len(masked) <= 2, f"masked flips: {masked}"
    assert all(p >= 21 for p in masked), (
        f"masked flip inside the container/VP8L header: {masked}"
    )
