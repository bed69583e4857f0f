"""Multimodal column plumbing (SURVEY.md §2.11 X4).

Images/audio/video ride Spark as opaque ``BinaryType`` payload columns
with typed metadata (``MapType(string,string)``), processed by
Arrow-batched pandas functions over ``mapInPandas`` — the only part of
this engine where Python touches row data, because media codecs are
per-buffer library calls that no Catalyst expression can express.

The decode kernels here are STUBS: this container has no image/audio
libraries (no PIL/ffmpeg), so the "decode" derives deterministic
pseudo-metadata and features from the payload bytes (documented
inline). The Spark-side plumbing — schemas, Arrow batch shapes, UDF
signatures, one-to-many frame expansion, binaryFile source — is real
and tested; swapping a stub body for ``PIL.Image.open`` changes no
plan shape.

Scale notes: payloads never shuffle through these paths (mapInPandas
is a narrow map over the scan); frame expansion multiplies rows, not
bytes-per-row; metadata-only queries project the map column and prune
the binary payload out of the scan entirely.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("checksum60", T.LongType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_checksum60", T.LongType()),
    ]
)


def _md5_60(payload: bytes) -> int:
    """First 15 md5 hex chars as int — the same 60-bit digest DuckDB
    computes with ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``, so
    stub outputs stay oracle-checkable."""
    return int(hashlib.md5(payload).hexdigest()[:15], 16)


def decode_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched "decode" of binary payloads via ``mapInPandas``.

    PRODUCTION: the loop body would call the codec
    (``PIL.Image.open(io.BytesIO(payload))`` etc.) and emit real
    dimensions. STUB (no media libs in this container): dimensions are
    derived deterministically from the payload length and bytes —
    width = 16 + len % 64, height = 16 + (len * 7) % 64 — and the
    checksum is the md5-derived 60-bit digest. Plan shape is identical
    either way: one narrow Arrow pass over the scan.
    """
    # mapInPandas ships EVERY input column through Arrow — Spark cannot
    # see which columns the kernel touches, so unused ones (the meta
    # map) would cross the Python boundary and defeat column pruning at
    # the scan. Project to exactly the kernel's inputs first.
    assets = assets.select("asset_id", "media_type", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            lens = payloads.map(len)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": lens,
                    "width": 16 + lens % 64,
                    "height": 16 + (lens * 7) % 64,
                    "checksum60": payloads.map(_md5_60),
                }
            )

    return assets.mapInPandas(kernel, DECODED_SCHEMA)


def sample_frames(
    assets: DataFrame, frame_bytes: int = 32, stride: int = 2
) -> DataFrame:
    """One-to-many frame sampling via ``mapInPandas``: split each
    payload into fixed-size pseudo-frames, keep every ``stride``-th.

    PRODUCTION: ffmpeg keyframe extraction per buffer. STUB: frames are
    consecutive ``frame_bytes`` slices — which exercises the real
    plumbing this operator is about: an Arrow batch in, a *longer*
    Arrow batch out (row expansion inside the map, no shuffle, no
    explode of a materialized array of frames).
    """

    # Project to the kernel's inputs before the Python boundary
    # (mapInPandas ships all input columns; see decode_assets).
    assets = assets.select("asset_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [],
                "frame_idx": [],
                "frame_len": [],
                "frame_checksum60": [],
            }
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    frame = payload[i * frame_bytes : (i + 1) * frame_bytes]
                    out["asset_id"].append(asset_id)
                    out["frame_idx"].append(i)
                    out["frame_len"].append(len(frame))
                    out["frame_checksum60"].append(_md5_60(frame))
            yield pd.DataFrame(out)

    return assets.mapInPandas(kernel, FRAME_SCHEMA)


# NB: the return type is a type OBJECT, not a DDL string — parsing a
# DDL string inside pandas_udf needs an active SparkSession, which does
# not exist when an executor re-imports this module.
@F.pandas_udf(T.ArrayType(T.FloatType()))
def extract_features(payload: pd.Series) -> pd.Series:
    """Scalar pandas UDF: binary payload → fixed-width feature vector.

    PRODUCTION: an embedding model over the decoded media. STUB: the
    first 8 bytes scaled to [0,1) — deterministic, and exercises the
    Arrow binary→array<float> path end to end.
    """
    return payload.map(
        lambda b: [x / 256.0 for x in (b[:8] + b"\x00" * 8)[:8]]
    )


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Landing reader for media files: Spark's binaryFile source — one
    row per file with (path, modificationTime, length, content). The
    schema is fixed by the source; column pruning drops ``content``
    when only metadata is queried."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("out_width", T.LongType()),
        T.StructField("out_height", T.LongType()),
        T.StructField("out_bytes", T.LongType()),
    ]
)


def resize_assets(assets: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Arrow-batched "resize" via ``mapInPandas``: binary in, binary out.

    PRODUCTION: decode → interpolate → re-encode per buffer. STUB (no
    codecs here): the payload is truncated/zero-padded to exactly
    ``width*height`` bytes — deterministic, and exercises the part that
    matters for the engine: a binary→binary kernel whose OUTPUT is
    again a payload column (resize pipelines chain; the schema must
    round-trip through Arrow in both directions).
    """
    target = width * height

    # Project to the kernel's inputs before the Python boundary
    # (mapInPandas ships all input columns; see decode_assets).
    assets = assets.select("asset_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: (b[:target] + b"\x00" * target)[:target]
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": resized,
                    "out_width": width,
                    "out_height": height,
                    "out_bytes": resized.map(len),
                }
            )

    return assets.mapInPandas(kernel, RESIZED_SCHEMA)


def resize_ppm_assets(
    assets: DataFrame, width: int = 4, height: int = 4
) -> DataFrame:
    """REAL resize (not the ``resize_assets`` stub): binary P6 PPM in,
    binary P6 PPM out, nearest-neighbor interpolation in pure numpy —
    decode → index-map → re-encode, the production binary→binary
    kernel shape with an actual raster transform inside.

    Nearest-neighbor uses the floor mapping ``src = (i * in) // out``
    (integer-exact, so an oracle can recompute every output byte
    arithmetically); numpy fancy indexing ``img[rows][:, cols]``
    vectorizes the gather for both up- and down-scaling. Output
    payloads are well-formed P6 (``decode_ppm_assets`` round-trips
    them — pinned by test). Malformed inputs (bad magic, truncated
    pixel data) are dropped whole, the standard corrupt-asset policy;
    ``resize_assets`` remains the codec-free stub fallback.

    Scale: one narrow Arrow pass; payloads never shuffle; chaining
    resize → decode stays a single mapInPandas pipeline stage."""

    # Project to the kernel's inputs before the Python boundary
    # (mapInPandas ships all input columns; see decode_assets).
    assets = assets.select("asset_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        rows_map = None  # built once; output dims are constant
        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "payload", "out_width", "out_height", "out_bytes",
            )}
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                buf = bytes(buf)
                if not buf.startswith(b"P6\n"):
                    continue
                try:
                    dims_end = buf.index(b"\n", 3)
                    w, h = (int(v) for v in buf[3:dims_end].split())
                    px_start = buf.index(b"\n", dims_end + 1) + 1
                except ValueError:
                    continue
                if w <= 0 or h <= 0 or len(buf) < px_start + 3 * w * h:
                    continue
                img = np.frombuffer(
                    buf, np.uint8, count=3 * w * h, offset=px_start
                ).reshape(h, w, 3)
                if rows_map is None or rows_map[1] != (h, w):
                    rows = (np.arange(height) * h) // height
                    cols = (np.arange(width) * w) // width
                    rows_map = ((rows, cols), (h, w))
                (rows, cols), _ = rows_map
                resized = img[rows][:, cols]
                payload = (
                    b"P6\n%d %d\n255\n" % (width, height)
                    + resized.tobytes()
                )
                out["asset_id"].append(aid)
                out["payload"].append(payload)
                out["out_width"].append(width)
                out["out_height"].append(height)
                out["out_bytes"].append(len(payload))
            yield pd.DataFrame(out)

    return assets.mapInPandas(kernel, RESIZED_SCHEMA)


PPM_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def decode_ppm_assets(assets: DataFrame) -> DataFrame:
    """REAL image decoding (not a stub): binary P6 PPM payloads →
    dimensions + exact per-channel pixel sums, via numpy in an
    Arrow-batched ``mapInPandas`` kernel.

    P6 is a genuine raster format (header ``P6\\n<w> <h>\\n255\\n``
    followed by w*h RGB byte triples) that needs no codec library, so
    unlike ``decode_assets`` this kernel does the production work:
    parse the header, bounds-check the buffer, ``np.frombuffer`` →
    ``reshape(h, w, 3)``, and vectorized int64 channel sums (exact —
    the oracle recomputes them arithmetically, so the kernel is under
    the full value gate, which the PIL-shaped stubs cannot be).
    Malformed payloads (bad magic, truncated pixel data) are dropped,
    the standard corrupt-asset policy.

    Same scale contract as every kernel here: one narrow Arrow pass
    over the scan, payloads never shuffle, output is skinny scalars.
    """

    # Project to the kernel's inputs before the Python boundary
    # (mapInPandas ships all input columns; see decode_assets).
    assets = assets.select("asset_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "width", "height", "n_px",
                "sum_r", "sum_g", "sum_b",
            )}
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                buf = bytes(buf)
                if not buf.startswith(b"P6\n"):
                    continue
                try:
                    nl2 = buf.index(b"\n", 3)
                    w, h = (int(x) for x in buf[3:nl2].split())
                    nl3 = buf.index(b"\n", nl2 + 1)
                except ValueError:
                    continue
                n = w * h * 3
                px = np.frombuffer(buf, np.uint8, offset=nl3 + 1, count=-1)
                if px.size < n or w <= 0 or h <= 0:
                    continue  # truncated pixel data
                sums = (
                    px[:n].reshape(h * w, 3).sum(axis=0, dtype=np.int64)
                )
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_px"].append(w * h)
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return assets.mapInPandas(kernel, PPM_SCHEMA)


WAV_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("sum_amp", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("trough", T.LongType()),
    ]
)


def decode_wav_assets(assets: DataFrame) -> DataFrame:
    """REAL audio decoding (not a stub): binary RIFF/WAVE PCM payloads
    → parsed header fields + exact amplitude statistics, via
    struct.unpack + numpy in an Arrow-batched ``mapInPandas`` kernel —
    the audio twin of ``decode_ppm_assets``.

    Canonical 44-byte WAV header (RIFF size, ``fmt `` chunk with PCM
    tag / channel count / sample rate / bits-per-sample, ``data``
    chunk size) parsed with real little-endian ``struct`` unpacking and
    validated (magic, PCM=1, mono, 8-bit); 8-bit unsigned PCM samples
    via ``np.frombuffer`` with exact int64 sum/max/min. Malformed
    payloads (bad magic, non-PCM, truncated data) are dropped — the
    standard corrupt-asset policy. Every output is under the DuckDB
    value gate: the oracle recomputes the statistics arithmetically
    without ever seeing the binary.

    Same scale contract as every kernel here: one narrow Arrow pass
    over the scan, payloads never shuffle, output is skinny scalars.
    """

    # Project to the kernel's inputs before the Python boundary
    # (mapInPandas ships all input columns; see decode_assets).
    assets = assets.select("asset_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "n_samples", "sample_rate",
                "sum_amp", "peak", "trough",
            )}
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                buf = bytes(buf)
                if len(buf) < 44:
                    continue
                riff, _chunk, wave = struct.unpack_from("<4sI4s", buf, 0)
                fmt_id, fmt_sz, afmt, n_ch, rate, _brate, _balign, bits = (
                    struct.unpack_from("<4sIHHIIHH", buf, 12)
                )
                data_id, data_sz = struct.unpack_from("<4sI", buf, 36)
                if (
                    riff != b"RIFF" or wave != b"WAVE"
                    or fmt_id != b"fmt " or fmt_sz != 16
                    or data_id != b"data"
                    or afmt != 1 or n_ch != 1 or bits != 8
                ):
                    continue
                samples = np.frombuffer(buf, np.uint8, offset=44, count=-1)
                if samples.size < data_sz:
                    continue  # truncated sample data
                s = samples[:data_sz].astype(np.int64)
                out["asset_id"].append(aid)
                out["n_samples"].append(int(data_sz))
                out["sample_rate"].append(int(rate))
                out["sum_amp"].append(int(s.sum()))
                out["peak"].append(int(s.max()))
                out["trough"].append(int(s.min()))
            yield pd.DataFrame(out)

    return assets.mapInPandas(kernel, WAV_SCHEMA)


Y4M_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("sum_y", T.LongType()),
        T.StructField("sum_u", T.LongType()),
        T.StructField("sum_v", T.LongType()),
    ]
)


def demux_y4m_assets(assets: DataFrame) -> DataFrame:
    """REAL video demuxing (not a stub): binary YUV4MPEG2 (.y4m)
    streams → one row PER FRAME with exact per-plane sums, via numpy in
    an Arrow-batched ``mapInPandas`` kernel — the video member of the
    real-codec trio (P6 image, WAV audio, Y4M video), and the
    one-to-many expansion the frame-sampling stub only simulates.

    Y4M is the uncompressed interchange format ffmpeg/mplayer speak: an
    ASCII stream header ``YUV4MPEG2 W<w> H<h> F25:1 C444\\n`` followed
    by repeated ``FRAME\\n`` markers each carrying w*h*3 plane bytes
    (Y, then U, then V at C444). The kernel parses the header tags,
    walks the frame markers, bounds-checks every frame body, and sums
    each plane exactly (int64). Malformed streams (bad magic, missing
    W/H tags, non-C444 color, torn FRAME marker, truncated body) are
    dropped whole — corrupt-asset policy at the asset grain.

    Scale: one narrow Arrow pass; payloads never shuffle; output is
    skinny scalars, one row per frame.
    """

    # Project to the kernel's inputs before the Python boundary
    # (mapInPandas ships all input columns; see decode_assets).
    assets = assets.select("asset_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "frame_idx", "width", "height",
                "sum_y", "sum_u", "sum_v",
            )}
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                buf = bytes(buf)
                if not buf.startswith(b"YUV4MPEG2 "):
                    continue
                try:
                    hdr_end = buf.index(b"\n")
                except ValueError:
                    continue
                w = h = None
                c444 = False
                try:
                    for tag in buf[10:hdr_end].split():
                        if tag[:1] == b"W":
                            w = int(tag[1:])
                        elif tag[:1] == b"H":
                            h = int(tag[1:])
                        elif tag[:1] == b"C":
                            c444 = tag[1:] == b"444"
                except ValueError:
                    # non-numeric W/H tag: drop the asset like every other
                    # malformed-header case instead of failing the task
                    continue
                if not w or not h or w <= 0 or h <= 0 or not c444:
                    continue
                wh = w * h
                pos = hdr_end + 1
                frames = []
                ok = True
                while pos < len(buf):
                    if buf[pos:pos + 6] != b"FRAME\n":
                        ok = False
                        break
                    pos += 6
                    if pos + 3 * wh > len(buf):
                        ok = False  # truncated frame body
                        break
                    planes = np.frombuffer(
                        buf, np.uint8, offset=pos, count=3 * wh
                    ).reshape(3, wh)
                    frames.append(planes.sum(axis=1, dtype=np.int64))
                    pos += 3 * wh
                if not ok:
                    continue
                for idx, sums in enumerate(frames):
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(idx)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sum_y"].append(int(sums[0]))
                    out["sum_u"].append(int(sums[1]))
                    out["sum_v"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return assets.mapInPandas(kernel, Y4M_SCHEMA)


Y4M_SCENE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("sum_y", T.LongType()),
        T.StructField("sad_prev_y", T.LongType()),
    ]
)


def y4m_scene_stats_assets(assets: DataFrame) -> DataFrame:
    """Scene-change statistics over binary Y4M streams: the demux walk
    of ``demux_y4m_assets`` (same header/marker/bounds validation and
    whole-asset drop policy), but the kernel RETAINS each frame's luma
    plane and emits the sum of absolute per-pixel Y differences
    against the previous frame (``sad_prev_y``, 0 for frame 0) — the
    SAD measure hardware encoders and shot-boundary detectors use.
    Policy (what counts as a cut) stays OUT of the kernel; callers
    threshold downstream.

    Exactness: uint8 planes widen to int64 before subtraction; SAD is
    an exact integer at any batch shape. Scale: identical to the
    demuxer — one narrow Arrow pass, payloads never shuffle, the
    previous-frame state lives inside the per-asset loop (frames of
    one asset never split across batches because each input ROW is one
    whole asset)."""

    # Project to the kernel's inputs before the Python boundary
    # (mapInPandas ships all input columns; see decode_assets).
    assets = assets.select("asset_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "frame_idx", "width", "height",
                "sum_y", "sad_prev_y",
            )}
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                buf = bytes(buf)
                if not buf.startswith(b"YUV4MPEG2 "):
                    continue
                try:
                    hdr_end = buf.index(b"\n")
                except ValueError:
                    continue
                w = h = None
                c444 = False
                try:
                    for tag in buf[10:hdr_end].split():
                        if tag[:1] == b"W":
                            w = int(tag[1:])
                        elif tag[:1] == b"H":
                            h = int(tag[1:])
                        elif tag[:1] == b"C":
                            c444 = tag[1:] == b"444"
                except ValueError:
                    continue
                if not w or not h or w <= 0 or h <= 0 or not c444:
                    continue
                wh = w * h
                pos = hdr_end + 1
                lumas = []
                ok = True
                while pos < len(buf):
                    if buf[pos:pos + 6] != b"FRAME\n":
                        ok = False
                        break
                    pos += 6
                    if pos + 3 * wh > len(buf):
                        ok = False
                        break
                    lumas.append(
                        np.frombuffer(buf, np.uint8, offset=pos, count=wh)
                        .astype(np.int64)
                    )
                    pos += 3 * wh
                if not ok:
                    continue
                prev = None
                for idx, y in enumerate(lumas):
                    sad = 0 if prev is None else int(np.abs(y - prev).sum())
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(idx)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sum_y"].append(int(y.sum()))
                    out["sad_prev_y"].append(sad)
                    prev = y
            yield pd.DataFrame(out)

    return assets.mapInPandas(kernel, Y4M_SCENE_SCHEMA)
