"""Multimodal plumbing tests: envelope determinism, magic-byte
round-trip, the Arrow decode pipeline, and the stub contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cheetah_spark import multimodal as M
from cheetah_spark.catalog import load_table


def test_media_envelope_roundtrip(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    media = M.media_table(d)
    rows = media.collect()
    assert len(rows) == 50
    for r in rows:
        expected_type = list(M.MAGIC)[r.doc_id % 4]
        assert r.media_type == expected_type
        assert bytes(r.payload)[:4].hex() == M.MAGIC[expected_type]
        assert r.n_bytes == len(bytes(r.payload))


def test_decode_features_deterministic(spark, sf_dir):
    """png/wav are decoded FOR REAL (stdlib codecs recover the encoded
    closed-form parameters); jpeg/mp4 run the deterministic fake."""
    d = load_table(spark, sf_dir, "documents").limit(50)
    feats = M.decode_features(M.mixed_media_table(d))
    a = sorted(map(str, feats.collect()))
    b = sorted(map(str, feats.collect()))
    assert a == b
    rows = feats.collect()
    assert {r.media_type for r in rows} <= set(M.MAGIC) | {"unknown"}
    for r in rows:
        if r.media_type == "png":  # real decode of a real file
            assert (r.width, r.height) == (16 + r.doc_id % 32, 8 + r.doc_id % 16)
            assert r.n_frames == 1
            assert r.pixel_sum == r.width * r.height * (r.doc_id % 256)
        elif r.media_type == "wav":  # real decode of a real file
            assert r.sample_rate == 8000 + (r.doc_id % 8) * 1000
            assert r.n_frames == 64 + r.doc_id % 64
            assert r.sample_sum == r.n_frames * (r.doc_id % 30000)
        elif r.media_type == "jpeg":
            assert r.width > 0 and r.height > 0 and r.n_frames == 1
        elif r.media_type == "mp4":
            assert r.n_frames >= 1


def test_decode_partitioning_invariance(spark, sf_dir):
    """Feature output must not depend on partitioning/batch shape."""
    d = load_table(spark, sf_dir, "documents").limit(64)
    one = M.decode_features(M.mixed_media_table(d).repartition(1)).collect()
    many = M.decode_features(M.mixed_media_table(d).repartition(13)).collect()
    assert sorted(map(str, one)) == sorted(map(str, many))


def test_undecodable_png_wav_yield_zero_features(spark, sf_dir):
    """A png/wav payload that fails real parsing (the legacy fake
    envelope: magic bytes + text, no valid structure) must emit all-zero
    features — undecodable is visible, never silently faked."""
    d = load_table(spark, sf_dir, "documents").limit(40)
    rows = M.decode_features(M.media_table(d)).collect()
    checked = 0
    for r in rows:
        if r.media_type in ("png", "wav"):
            assert (r.width, r.height, r.n_frames, r.sample_rate) == (0, 0, 0, 0)
            assert (r.pixel_sum, r.sample_sum) == (0, 0)
            checked += 1
    assert checked > 0


def test_real_decode_gate_narrows_to_jpeg_mp4(spark, sf_dir):
    """real_decode=True is the jpeg/mp4 integration point — still
    import-gated on PIL; png/wav no longer need it."""
    d = load_table(spark, sf_dir, "documents").limit(1)
    with pytest.raises(NotImplementedError, match="jpeg/mp4"):
        M.decode_features(M.mixed_media_table(d), real_decode=True)


def test_payload_projected_away_before_wide_ops(spark, sf_dir):
    """The decode aggregate must not carry payload bytes through the
    shuffle — the pre-shuffle plan projects it away."""
    from cheetah_spark.queries.multimodal import q_multimodal_decode

    df = q_multimodal_decode(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the exchange's input schema must not mention payload
    after_exchange = plan.split("Exchange")[0]
    assert "payload" not in after_exchange


def test_real_codecs_roundtrip_and_detect_corruption(spark, sf_dir):
    """The stdlib codecs really decode (PNG dims/pixels, WAV params/
    samples recovered exactly) and really VERIFY: flipping one payload
    byte flips parse_ok (PNG via chunk CRC32, WAV via RIFF structure)."""
    from pyspark.sql import functions as F

    from cheetah_spark import multimodal as M
    from cheetah_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").limit(40)
    media = M.real_media_table(d)
    ok = M.decode_real_features(media)
    rows = ok.collect()
    assert rows and all(r.parse_ok for r in rows)
    for r in rows:
        if r.media_type == "png":
            assert (r.width, r.height) == (16 + r.doc_id % 32, 8 + r.doc_id % 16)
            assert r.pixel_sum == r.width * r.height * (r.doc_id % 256)
        else:
            assert r.sample_rate == 8000 + (r.doc_id % 8) * 1000
            assert r.sample_sum == r.n_frames * (r.doc_id % 30000)

    # corrupt one mid-payload byte per file → integrity must fail
    corrupted = media.select(
        "doc_id",
        F.concat(
            F.substring("payload", 1, 40),
            F.unhex(F.lit("ff")),
            F.expr("substring(payload, 42, octet_length(payload))"),
        ).alias("payload"),
    )
    bad = M.decode_real_features(corrupted).collect()
    n_detected = sum(0 if r.parse_ok else 1 for r in bad)
    assert n_detected == len(bad), f"corruption missed on {len(bad) - n_detected} files"


def test_transforms_roundtrip_and_detect_corruption(spark, sf_dir):
    """The resize / frame-sample transforms verify their OUTPUT (the
    re-encoded file decodes back frame/pixel-exact) and their INPUT:
    a corrupted payload yields a roundtrip_ok=False row, never a
    silently wrong transform."""
    from pyspark.sql import functions as F

    from cheetah_spark import multimodal as M
    from cheetah_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").limit(40)
    media = M.real_media_table(d)
    rs = M.resize_png_features(media).collect()
    assert rs and all(r.roundtrip_ok for r in rs)
    for r in rs:
        w, h = 16 + r.doc_id % 32, 8 + r.doc_id % 16
        assert (r.out_width, r.out_height) == (w // 2, h // 2)
        assert r.out_pixel_sum == (w // 2) * (h // 2) * (r.doc_id % 256)
    fs = M.framesample_wav_features(media).collect()
    assert fs and all(r.roundtrip_ok for r in fs)
    for r in fs:
        n = 64 + r.doc_id % 64
        assert r.n_sampled == (n + 3) // 4
        assert r.sampled_sum == r.n_sampled * (r.doc_id % 30000)

    corrupted = media.select(
        "doc_id",
        F.concat(
            F.substring("payload", 1, 40),
            F.unhex(F.lit("ff")),
            F.expr("substring(payload, 42, octet_length(payload))"),
        ).alias("payload"),
    )
    bad_png = M.resize_png_features(corrupted).collect()
    assert bad_png and all(not r.roundtrip_ok for r in bad_png)
    bad_wav = M.framesample_wav_features(corrupted).collect()
    assert bad_wav and all(not r.roundtrip_ok for r in bad_wav)


def test_phash_resolution_invariance_on_gradient(spark):
    """The 8x8 average-pool fingerprint must collide for an image and
    its 2x nearest-neighbor upscale even with NON-constant content (the
    fixture's PNGs are constant-valued; this pins the pooling math on a
    gradient): each original pixel duplicates into a 2x2 block, so
    every pooled block mean is exactly the original's."""
    import struct
    import zlib

    from cheetah_spark import multimodal as M

    def png(arr):
        h, w = len(arr), len(arr[0])

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        raw = b"".join(b"\x00" + bytes(row) for row in arr)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    base = [[(r * 16 + c * 3) % 256 for c in range(16)] for r in range(8)]
    up = [[base[r // 2][c // 2] for c in range(32)] for r in range(16)]
    media = spark.createDataFrame(
        [(1, bytearray(png(base))), (2, bytearray(png(up)))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in M.phash_png_features(media).collect()}
    assert rows[1].parse_ok and rows[2].parse_ok
    assert rows[1].width == 16 and rows[2].width == 32
    assert rows[1].phash == rows[2].phash  # resolution-invariant collision
    assert len(rows[1].phash) == 64
