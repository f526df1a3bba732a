"""Multimodal plumbing tests (SURVEY §2.12 X5): binary payload schema,
Arrow-batched feature extraction with the stubbed codec, frame-sample
fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nagios_custom_etl_spark.catalog import load_table
from nagios_custom_etl_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    documents_as_media,
    extract_features,
    frame_sample,
)


def test_media_schema_contract(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    assert dict(media.dtypes) == {
        "media_id": "bigint",
        "payload": "binary",
        "meta": "struct<mime:string,source:string,n_bytes:bigint>",
    }


def test_extract_features_fake_codec(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    media = documents_as_media(docs)
    feats = extract_features(media, codec="fake")
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["n_bytes"] > 0
        assert len(r["magic_hex"]) == 8  # 4 bytes hex
        assert 64 <= r["width"] < 64 + 1920
        assert 64 <= r["height"] < 64 + 1080
    # determinism: same bytes → same checksum across runs
    again = {r["media_id"]: r["checksum"] for r in extract_features(media, codec="fake").collect()}
    assert all(again[r["media_id"]] == r["checksum"] for r in rows)


def test_real_codec_rejects_unknown_magic(spark, sf_dir):
    """Text bytes are neither BMP nor WAV: the real codec raises per
    payload (the PIL/ffmpeg gap), instead of a blanket per-call stub."""
    media = documents_as_media(load_table(spark, sf_dir, "documents").limit(1))
    with pytest.raises(Exception, match="NotImplementedError|no stdlib decoder"):
        extract_features(media, codec="real").collect()


def test_real_codec_decodes_planted_bmp_and_wav(spark):
    """codec='real' end to end via mapInPandas on planted files: the
    decoded dims/checksums must equal what the encoder arithmetic
    predicts — a header-blind decoder cannot fake this."""
    from nagios_custom_etl_spark.operators.multimodal import planted_media

    ids = spark.range(0, 40).select(F.col("id").alias("media_id"))
    feats = extract_features(planted_media(ids), codec="real")
    assert feats.schema == FEATURE_SCHEMA
    got = {r["media_id"]: r for r in feats.collect()}
    assert len(got) == 40
    for i in range(40):
        r, fill = got[i], i % 251
        if i % 2 == 0:
            w, h = 1 + i % 16, 1 + i % 8
            assert (r["width"], r["height"]) == (w, h)
            assert r["magic_hex"][:4] == b"BM".hex()
            assert r["checksum"] == fill * ((3 * w + 3) // 4 * 4) * h
        else:
            frames, ch = 8 + i % 32, 1 + (i // 2) % 2
            assert (r["width"], r["height"]) == (frames, ch)
            assert r["checksum"] == fill * frames * ch * 2


def test_bmp_decoder_handles_topdown_and_core_header():
    """Decoder edge cases direct (no Spark): negative height (top-down)
    and padded rows."""
    from nagios_custom_etl_spark.operators.multimodal import _decode_bmp, _encode_bmp

    plain = _encode_bmp(5, 3, 7)  # row_size 16 (15 data + 1 pad)
    assert _decode_bmp(plain) == (5, 3, 7 * 16 * 3)
    # flip height sign in the info header: same dims reported
    topdown = bytearray(plain)
    import struct as s

    s.pack_into("<i", topdown, 22, -3)
    assert _decode_bmp(bytes(topdown)) == (5, 3, 7 * 16 * 3)
    with pytest.raises(ValueError, match="not a BMP"):
        _decode_bmp(b"JUNK")
    with pytest.raises(ValueError, match="truncated"):
        _decode_bmp(plain[:-4])


def test_bmp_decoder_reads_bit_depth():
    """ADVICE r3: row sizing must come from biBitCount, not assume 24bpp —
    an 8bpp file has 4-byte-aligned 1-byte-per-pixel rows, a 32bpp file
    4*width; both were mis-sized before."""
    import struct as s

    from nagios_custom_etl_spark.operators.multimodal import _decode_bmp

    def bmp(width, height, bpp, fill):
        row = (bpp * width + 31) // 32 * 4
        pixels = bytes([fill]) * (row * height)
        header = s.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54) + s.pack(
            "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(pixels), 2835, 2835, 0, 0
        )
        return header + pixels, row

    for bpp in (8, 16, 32):
        payload, row = bmp(5, 3, bpp, 9)
        assert _decode_bmp(payload) == (5, 3, 9 * row * 3)
    bad, _ = bmp(5, 3, 24, 9)
    bad = bytearray(bad)
    s.pack_into("<H", bad, 28, 13)  # nonsense depth must fail loudly
    with pytest.raises(ValueError, match="bit depth"):
        _decode_bmp(bytes(bad))


def test_frame_sample_bounded_fanout(spark, sf_dir):
    media = documents_as_media(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    )
    frames = frame_sample(media, every_n_bytes=64, max_frames=8)
    per_media = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(1 <= r["n"] <= 8 for r in per_media)
    offs = frames.filter(F.col("media_id") == per_media[0]["media_id"]).collect()
    assert [r["byte_offset"] for r in sorted(offs, key=lambda r: r["frame_no"])] == [
        64 * i for i in range(len(offs))
    ]


def test_checksum_arrow_matches_builtin(spark, sf_dir):
    """mapInArrow escape hatch: zero-pandas RecordBatch path agrees with
    the pure-builtin aggregate of the same quantity."""
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.catalog import load_table
    from nagios_custom_etl_spark.operators.multimodal import checksum_arrow, documents_as_media

    # deterministic subset: limit() over the round-robin-spread scan picks an
    # arbitrary 200 rows per action, so the two collects below would disagree
    media = documents_as_media(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    )
    got = {r["media_id"]: r["byte_sum"] for r in checksum_arrow(media).collect()}
    # builtin oracle: aggregate over the unhexed byte array
    expect_df = media.select(
        "media_id",
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.octet_length("payload")),
                lambda i: F.ascii(F.substring(F.col("payload").cast("string"), i, 1)),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("byte_sum"),
    )
    expect = {
        r["media_id"]: int(r["byte_sum"]) & 0x7FFFFFFF for r in expect_df.collect()
    }
    assert got == expect


def test_resize_bmp_nearest_neighbor_samples_real_pixels():
    """Resize must actually sample the source buffer (nearest-neighbor
    src = dst*src_dim // dst_dim), not just rewrite the header: a
    gradient image's downscale has exactly predictable pixel values."""
    import struct as s

    from nagios_custom_etl_spark.operators.multimodal import _decode_bmp, _resize_bmp

    # 8x4 24bpp BMP where pixel (x, row) has bytes (x, row, x+row)
    w, h = 8, 4
    row_size = (3 * w + 3) // 4 * 4
    buf = bytearray(row_size * h)
    for y in range(h):
        for x in range(w):
            buf[y * row_size + 3 * x : y * row_size + 3 * x + 3] = bytes([x, y, x + y])
    header = s.pack("<2sIHHI", b"BM", 54 + len(buf), 0, 0, 54) + s.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(buf), 2835, 2835, 0, 0
    )
    out = _resize_bmp(header + bytes(buf), max_dim=4)
    ow, oh, _ = _decode_bmp(out)
    assert (ow, oh) == (4, 2)  # 8x4 -> fit 4 -> 4x2
    out_row = (3 * 4 + 3) // 4 * 4
    pix = out[54:]
    for y in range(2):
        sy = y * 4 // 2
        for x in range(4):
            sx = x * 8 // 4
            assert tuple(pix[y * out_row + 3 * x : y * out_row + 3 * x + 3]) == (
                sx,
                sy,
                sx + sy,
            ), (x, y)
    # small image passes through byte-identical; non-BMP raises
    small = _resize_bmp(out, max_dim=4)
    assert small == out
    with pytest.raises(ValueError, match="not a BMP"):
        _resize_bmp(b"JUNKJUNK" * 8, max_dim=4)


def test_resize_images_composes_with_decode(spark):
    """Distributed resize -> re-decode roundtrip on planted media: dims
    obey the integer shrink arithmetic, WAV payloads pass through."""
    from nagios_custom_etl_spark.operators.multimodal import planted_media, resize_images

    ids = spark.range(0, 30).select(F.col("id").alias("media_id"))
    media = planted_media(ids)
    out = resize_images(media, max_dim=4)
    assert out.schema == media.schema
    feats = {r["media_id"]: r for r in extract_features(out, codec="real").collect()}
    for i in range(30):
        r, fill = feats[i], i % 251
        if i % 2 == 0:
            w, h = 1 + i % 16, 1 + i % 8
            m = max(w, h)
            if m <= 4:
                assert (r["width"], r["height"]) == (w, h)
                assert r["checksum"] == fill * ((3 * w + 3) // 4 * 4) * h
            else:
                nw, nh = max(1, w * 4 // m), max(1, h * 4 // m)
                assert (r["width"], r["height"]) == (nw, nh)
                assert r["checksum"] == fill * 3 * nw * nh
        else:  # WAV untouched
            frames, ch = 8 + i % 32, 1 + (i // 2) % 2
            assert (r["width"], r["height"]) == (frames, ch)


def test_resize_bmp_rejects_truncated_payload():
    """ADVICE r4: a truncated pixel buffer used to silently SHRINK the
    output via bytearray slice-assign (shifting every later pixel) —
    it must raise instead."""
    import struct as s

    from nagios_custom_etl_spark.operators.multimodal import _resize_bmp

    w, h = 8, 4
    row_size = (3 * w + 3) // 4 * 4
    buf = bytes(row_size * h)
    header = s.pack("<2sIHHI", b"BM", 54 + len(buf), 0, 0, 54) + s.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(buf), 2835, 2835, 0, 0
    )
    full = header + buf
    with pytest.raises(ValueError, match="truncated BMP"):
        _resize_bmp(full[:-10], max_dim=4)
    assert len(_resize_bmp(full, max_dim=4)) > 0  # intact payload resizes


def test_resize_images_passes_malformed_bmps_through(spark):
    """ADVICE r4: resize_images dispatches on the 2-byte 'BM' magic; a
    truncated or non-24bpp BMP must pass through unchanged instead of
    failing the whole job."""
    import struct as s

    from nagios_custom_etl_spark.operators.multimodal import _encode_bmp, resize_images

    good = _encode_bmp(8, 6, 9)
    truncated = good[:-8]
    w, h = 8, 6
    row_size = (3 * w + 3) // 4 * 4
    buf = bytes(row_size * h)
    bpp8 = s.pack("<2sIHHI", b"BM", 54 + len(buf), 0, 0, 54) + s.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(buf), 2835, 2835, 0, 0
    )
    rows = [
        (0, good, {"mime": "image/bmp", "source": "t", "n_bytes": len(good)}),
        (1, truncated, {"mime": "image/bmp", "source": "t", "n_bytes": len(truncated)}),
        (2, bpp8, {"mime": "image/bmp", "source": "t", "n_bytes": len(bpp8)}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: bytes(r["payload"]) for r in resize_images(media, max_dim=4).collect()}
    assert out[1] == truncated  # malformed: byte-identical pass-through
    assert out[2] == bpp8  # non-24bpp: pass-through
    assert out[0] != good and out[0][:2] == b"BM"  # valid BMP actually shrank


def test_phash_near_copies_found_despite_byte_differences(spark):
    """%3==0 variants differ from their source at the BYTE level (odd
    pixels 7 vs 0) yet must pair at Hamming 0; %3==1 pairs at 1;
    %3==2 (Hamming 3) must NOT appear at threshold 2."""
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.operators.multimodal import (
        dhash_images,
        phash_near_dup_pairs,
        planted_gradient_media,
    )

    ids = spark.range(500).select(F.col("id").alias("media_id"))
    media = planted_gradient_media(ids).cache()
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_dup_pairs(dhash_images(media), max_hamming=2).collect()
    }
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    for copy_id in range(400, 500):
        src = copy_id - 400
        assert payloads[copy_id] != payloads[src]  # genuinely different bytes
        if copy_id % 3 == 0:
            assert pairs.get((src, copy_id)) == 0
        elif copy_id % 3 == 1:
            assert pairs.get((src, copy_id)) == 1
        else:
            assert (src, copy_id) not in pairs  # Hamming 3: over threshold
    # no organic base-base pair sneaks under the threshold
    assert all(b >= 400 for (_, b) in pairs)
    media.unpersist()


def test_dhash_decoder_rejects_bad_payloads():
    import pytest

    from nagios_custom_etl_spark.operators.multimodal import (
        _dhash_bmp,
        _encode_gradient_bmp,
        planted_hash,
    )

    with pytest.raises(ValueError, match="not a BMP"):
        _dhash_bmp(b"JUNK" * 20)
    good = _encode_gradient_bmp(planted_hash(3), 0)
    with pytest.raises(ValueError, match="truncated"):
        _dhash_bmp(good[: len(good) // 2])


def test_dhash_handles_topdown_bmps():
    """A negative-height (top-down) BMP of the same pixels must hash
    identically — decoder orientation handling, not just our encoder's
    bottom-up convention."""
    import struct

    from nagios_custom_etl_spark.operators.multimodal import (
        _dhash_bmp,
        _encode_gradient_bmp,
        planted_hash,
    )

    h = planted_hash(7)
    bottom_up = _encode_gradient_bmp(h, 0)
    width, height = struct.unpack_from("<ii", bottom_up, 18)
    row_size = (3 * width + 3) // 4 * 4
    pix = bottom_up[54:]
    flipped = b"".join(
        pix[(height - 1 - y) * row_size : (height - y) * row_size] for y in range(height)
    )
    top_down = bytearray(bottom_up[:54] + flipped)
    struct.pack_into("<ii", top_down, 18, width, -height)
    assert _dhash_bmp(bytes(top_down)) == h == _dhash_bmp(bottom_up)
