"""Multimodal plumbing (X4): binaryFile source, Arrow batch shapes,
feature-extraction UDF — the pieces not reachable through the query
registry (those are oracle-checked by the driver gate instead).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from celestrak_tle_data_pipeline_spark.operators.multimodal import (
    decode_assets,
    extract_features,
    read_binary_dir,
    sample_frames,
)


def test_binary_file_source(spark, tmp_path):
    (tmp_path / "a.png").write_bytes(b"\x89PNG" + b"\x00" * 60)
    (tmp_path / "b.wav").write_bytes(b"RIFF" + b"\x01" * 20)
    (tmp_path / "skip.txt").write_text("not media")

    df = read_binary_dir(spark, str(tmp_path), glob="*.{png,wav}")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.png", "b.wav"}
    assert rows["a.png"].length == 64
    assert bytes(rows["a.png"].content[:4]) == b"\x89PNG"

    # metadata-only projection must not need the content column
    meta = df.select("path", "length").collect()
    assert len(meta) == 2


def test_decode_and_features_roundtrip(spark):
    payload = b"\x10\x20\x30\x40" * 10  # 40 bytes
    assets = spark.createDataFrame(
        [(1, "image/png", bytearray(payload))],
        "asset_id long, media_type string, payload binary",
    )
    out = decode_assets(assets).collect()[0]
    assert out.byte_len == 40
    assert out.width == 16 + 40 % 64
    assert out.height == 16 + (40 * 7) % 64
    assert out.checksum60 == int(hashlib.md5(payload).hexdigest()[:15], 16)

    feats = assets.select(
        extract_features(F.col("payload")).alias("f")
    ).collect()[0].f
    assert len(feats) == 8
    assert abs(feats[0] - 0x10 / 256.0) < 1e-6


def test_frame_sampling_expansion(spark):
    # 70 bytes → frames of 32: idx 0 (32B), 1 (32B), 2 (6B); stride 2
    # keeps idx 0 and 2 — including the short tail frame.
    payload = bytes(i % 256 for i in range(70))
    assets = spark.createDataFrame(
        [(7, "video/mp4", bytearray(payload))],
        "asset_id long, media_type string, payload binary",
    )
    frames = {r.frame_idx: r for r in sample_frames(assets).collect()}
    assert set(frames) == {0, 2}
    assert frames[0].frame_len == 32
    assert frames[2].frame_len == 6
    assert frames[2].frame_checksum60 == int(
        hashlib.md5(payload[64:70]).hexdigest()[:15], 16
    )


def test_resize_binary_roundtrip(spark):
    """resize: binary->binary kernel; output payloads chain into the
    decode kernel (schema round-trips through Arrow both directions)."""
    from celestrak_tle_data_pipeline_spark.operators.multimodal import (
        resize_assets,
    )

    assets = spark.createDataFrame(
        [(1, "image/png", bytearray(b"\xab" * 100)),
         (2, "image/png", bytearray(b"\xcd" * 10))],
        "asset_id long, media_type string, payload binary",
    )
    out = {r.asset_id: r for r in resize_assets(assets, 4, 8).collect()}
    assert out[1].out_bytes == 32 and bytes(out[1].payload) == b"\xab" * 32
    assert out[2].out_bytes == 32
    assert bytes(out[2].payload) == b"\xcd" * 10 + b"\x00" * 22

    # chain: resized payloads feed the decode kernel unchanged
    chained = decode_assets(
        resize_assets(assets, 4, 8).selectExpr(
            "asset_id", "'image/png' AS media_type", "payload"
        )
    ).collect()
    assert all(r.byte_len == 32 for r in chained)


def test_ppm_resize_nearest_neighbor_exact(spark):
    # REAL resize path: nearest-neighbor gather with the integer floor
    # mapping src = (i * in) // out, verified pixel-by-pixel both ways
    from celestrak_tle_data_pipeline_spark.operators.multimodal import (
        decode_ppm_assets,
        resize_ppm_assets,
    )

    # 4x4 image, pixel (r, c) = (16r+c, 100+16r+c, 200 - 16r - c)
    px = bytes(
        b for r in range(4) for c in range(4)
        for b in (16 * r + c, 100 + 16 * r + c, 200 - 16 * r - c)
    )
    good = b"P6\n4 4\n255\n" + px
    rows = [
        (1, bytearray(good)),
        (2, bytearray(b"JFIF not a ppm")),
        (3, bytearray(b"P6\n4 4\n255\n" + b"\x01" * 5)),   # truncated
        (4, bytearray(b"P6\nx y\n255\n" + b"\x01" * 48)),  # bad dims
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")

    # downscale 4x4 -> 2x2: rows (0,2), cols (0,2) survive
    out = {r.asset_id: r for r in resize_ppm_assets(df, 2, 2).collect()}
    assert list(out) == [1]
    body = bytes(out[1].payload)
    assert body.startswith(b"P6\n2 2\n255\n")
    got = body[len(b"P6\n2 2\n255\n"):]
    want = bytes(
        b for r in (0, 2) for c in (0, 2)
        for b in (16 * r + c, 100 + 16 * r + c, 200 - 16 * r - c)
    )
    assert got == want
    assert (out[1].out_width, out[1].out_height, out[1].out_bytes) == (
        2, 2, len(body)
    )

    # upscale 4x4 -> 8x8 and round-trip through the real decoder:
    # each source pixel replicates 2x2, so sums scale exactly by 4
    dec = decode_ppm_assets(
        resize_ppm_assets(df, 8, 8).select("asset_id", "payload")
    ).collect()
    assert len(dec) == 1
    r = dec[0]
    assert (r.width, r.height, r.n_px) == (8, 8, 64)
    sum_r = sum(16 * rr + c for rr in range(4) for c in range(4))
    sum_g = sum(100 + 16 * rr + c for rr in range(4) for c in range(4))
    sum_b = sum(200 - 16 * rr - c for rr in range(4) for c in range(4))
    assert (r.sum_r, r.sum_g, r.sum_b) == (4 * sum_r, 4 * sum_g, 4 * sum_b)


def test_ppm_decoder_drops_malformed_payloads(spark):
    # real-codec policy: bad magic / truncated pixels / garbage header
    # are dropped, well-formed assets decode with exact channel sums
    from celestrak_tle_data_pipeline_spark.operators.multimodal import (
        decode_ppm_assets,
    )

    good = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    rows = [
        (1, bytearray(good)),
        (2, bytearray(b"JFIF not a ppm")),
        (3, bytearray(b"P6\n4 4\n255\n" + b"\x01" * 5)),  # truncated
        (4, bytearray(b"P6\nx y\n255\n" + b"\x01" * 48)),  # bad dims
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = {r.asset_id: r for r in decode_ppm_assets(df).collect()}
    assert list(out) == [1]
    r = out[1]
    assert (r.width, r.height, r.n_px) == (2, 1, 2)
    assert (r.sum_r, r.sum_g, r.sum_b) == (10 + 40, 20 + 50, 30 + 60)


def test_wav_decoder_drops_malformed_payloads(spark):
    # real-codec policy for the audio tier: bad magic / non-PCM /
    # stereo / truncated data are dropped; a well-formed mono 8-bit
    # file parses header fields and exact amplitude stats
    import struct

    from celestrak_tle_data_pipeline_spark.operators.multimodal import (
        decode_wav_assets,
    )

    def wav(samples, afmt=1, n_ch=1, bits=8, data_sz=None):
        data = bytes(samples)
        ds = len(data) if data_sz is None else data_sz
        return (
            b"RIFF" + struct.pack("<I", 36 + ds) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, afmt, n_ch, 8000,
                                    8000 * n_ch * bits // 8,
                                    n_ch * bits // 8, bits)
            + b"data" + struct.pack("<I", ds) + data
        )

    rows = [
        (1, bytearray(wav([100, 200, 50]))),
        (2, bytearray(b"OggS not a wav")),
        (3, bytearray(wav([1, 2, 3], afmt=3))),        # float, not PCM
        (4, bytearray(wav([1, 2, 3], n_ch=2))),        # stereo
        (5, bytearray(wav([1, 2], data_sz=100))),      # truncated
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = {r.asset_id: r for r in decode_wav_assets(df).collect()}
    assert list(out) == [1]
    r = out[1]
    assert (r.n_samples, r.sample_rate) == (3, 8000)
    assert (r.sum_amp, r.peak, r.trough) == (350, 200, 50)


def test_y4m_demuxer_drops_malformed_streams(spark):
    # video-tier corrupt-asset policy: bad magic / non-C444 / torn
    # FRAME marker / truncated body drop the WHOLE asset; a well-formed
    # 2-frame clip demuxes to one row per frame with exact plane sums
    from celestrak_tle_data_pipeline_spark.operators.multimodal import (
        demux_y4m_assets,
    )

    wh = 2 * 2
    f0 = bytes(range(1, 13))            # planes sum: Y=1+2+3+4 etc.
    f1 = bytes(range(13, 25))
    good = (
        b"YUV4MPEG2 W2 H2 F25:1 C444\n"
        + b"FRAME\n" + f0 + b"FRAME\n" + f1
    )
    rows = [
        (1, bytearray(good)),
        (2, bytearray(b"RIFF not a y4m")),
        (3, bytearray(b"YUV4MPEG2 W2 H2 F25:1 C420\nFRAME\n" + f0)),
        (4, bytearray(b"YUV4MPEG2 W2 H2 F25:1 C444\nFRAMX\n" + f0)),
        (5, bytearray(b"YUV4MPEG2 W2 H2 F25:1 C444\nFRAME\n" + f0[:5])),
        (6, bytearray(b"YUV4MPEG2 Wabc H2 F25:1 C444\nFRAME\n" + f0)),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = demux_y4m_assets(df).collect()
    assert sorted({r.asset_id for r in out}) == [1]
    frames = {r.frame_idx: r for r in out}
    assert sorted(frames) == [0, 1]
    assert (frames[0].sum_y, frames[0].sum_u, frames[0].sum_v) == (
        sum(range(1, 5)), sum(range(5, 9)), sum(range(9, 13))
    )
    assert frames[1].sum_y == sum(range(13, 17))
    assert all((r.width, r.height) == (2, 2) for r in out)


def test_y4m_scene_stats_sad_exact_and_drop_policy(spark):
    # scene-stats kernel: same corrupt-asset policy as the demuxer,
    # frame 0 SAD = 0, later SADs are exact |Y_f - Y_{f-1}| sums
    from celestrak_tle_data_pipeline_spark.operators.multimodal import (
        y4m_scene_stats_assets,
    )

    f0 = bytes(range(1, 13))
    f1 = bytes(range(13, 25))
    good = (
        b"YUV4MPEG2 W2 H2 F25:1 C444\n"
        + b"FRAME\n" + f0 + b"FRAME\n" + f1
    )
    rows = [
        (1, bytearray(good)),
        (2, bytearray(b"RIFF not a y4m")),
        (3, bytearray(b"YUV4MPEG2 W2 H2 F25:1 C444\nFRAME\n" + f0[:5])),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = {r.frame_idx: r for r in y4m_scene_stats_assets(df).collect()}
    assert sorted(out) == [0, 1]
    assert out[0].sad_prev_y == 0
    # every luma pixel moved by exactly 12 between the frames
    assert out[1].sad_prev_y == 12 * 4
    assert out[0].sum_y == sum(range(1, 5))
    assert out[1].sum_y == sum(range(13, 17))
