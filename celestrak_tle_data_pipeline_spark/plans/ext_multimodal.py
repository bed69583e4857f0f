"""[EXT] Multimodal-column queries (SURVEY.md §2.11 X4).

The ``documents`` table stands in as the asset store: each text payload
is UTF-8-encoded to a real ``BinaryType`` column with a
``MapType(string,string)`` metadata map — exactly how image/audio/video
ride a 100 TB lakehouse (opaque bytes + typed metadata). The decode /
frame-sample kernels are mapInPandas stubs (operators/multimodal.py)
whose outputs are *still oracle-checkable*: the payload is the UTF-8
text, so DuckDB's ``md5(text)`` equals the kernel's
``hashlib.md5(payload)`` and every derived value can be recomputed in
SQL.

Also home to the MapType tier of X4: ``from_json`` of ``events.props``
into a real map column (the earlier ``json_props_extract`` query uses
path extraction only).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.multimodal import (
    decode_assets,
    decode_ppm_assets,
    decode_wav_assets,
    demux_y4m_assets,
    resize_ppm_assets,
    sample_frames,
    y4m_scene_stats_assets,
)
from . import register
from .common import t

_MD5_60_SQL = "CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)"


def _assets(spark, sf_dir):
    """documents → (asset_id, media_type, payload BINARY, meta MAP)."""
    d = t(spark, sf_dir, "documents")
    media = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("video/mp4"))
        .when(F.col("doc_id") % 3 == 1, F.lit("image/png"))
        .otherwise(F.lit("audio/wav"))
    )
    return d.select(
        F.col("doc_id").alias("asset_id"),
        media.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("lang"), F.col("lang"),
            F.lit("source"), F.col("source"),
            F.lit("n_chars"), F.col("n_chars").cast("string"),
        ).alias("meta"),
    )


@register(
    "props_maptype",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           json_keys(props)[1] AS first_key
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
    """,
)
def props_maptype(spark, sf_dir):
    """X4 MapType tier: ``from_json`` of the props JSON into a real
    ``MapType(string,string)`` column, then map-native access
    (map_keys, element_at). Unlike get_json_object path extraction,
    the map is a first-class nested value downstream operators can
    explode, filter, or merge."""
    e = t(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), T.MapType(T.StringType(), T.StringType()))
    out = e.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").cast("bigint").alias("k_value"),
        F.map_keys(m).getItem(0).alias("first_key"),
    )
    return out.where(F.col("k_value") % 7 == 0)


@register(
    "multimodal_meta_profile",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'video/mp4'
                WHEN doc_id % 3 = 1 THEN 'image/png'
                ELSE 'audio/wav' END AS media_type,
           lang,
           COUNT(*) AS n_assets,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY 1, 2
    """,
)
def multimodal_meta_profile(spark, sf_dir):
    """Metadata-only rollup: groups by media type + a map entry. The
    binary payload participates only via length — at scale Parquet
    column pruning keeps payload bytes out of this scan entirely when
    sizes are precomputed; here octet counting is the plumbing proof."""
    a = _assets(spark, sf_dir)
    return a.groupBy(
        "media_type", F.element_at("meta", "lang").alias("lang")
    ).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.octet_length("payload")).cast("bigint").alias("total_bytes"),
    )


@register(
    "multimodal_decode_stub",
    oracle=f"""
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 3 = 0 THEN 'video/mp4'
                WHEN doc_id % 3 = 1 THEN 'image/png'
                ELSE 'audio/wav' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(16 + octet_length(encode(text)) % 64 AS BIGINT) AS width,
           CAST(16 + (octet_length(encode(text)) * 7) % 64 AS BIGINT)
               AS height,
           {_MD5_60_SQL} AS checksum60
    FROM documents
    """,
)
def multimodal_decode_stub(spark, sf_dir):
    """X4 decode path: binary payloads through the Arrow-batched
    mapInPandas kernel (STUBBED codec — deterministic dims + md5-60
    checksum; see operators/multimodal.py). The oracle recomputes every
    output in SQL, so the whole Python batch path — Arrow transfer, UDF
    signature, schema — is under the correctness gate."""
    return decode_assets(_assets(spark, sf_dir))


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH v AS (
        SELECT doc_id AS asset_id, text,
               octet_length(encode(text)) AS blen
        FROM documents WHERE doc_id % 3 = 0
    )
    SELECT asset_id,
           CAST(i AS BIGINT) AS frame_idx,
           CAST(least(32, blen - i * 32) AS BIGINT) AS frame_len,
           CAST(('0x' || substr(md5(substr(text, i * 32 + 1, 32)), 1, 15))
                AS BIGINT) AS frame_checksum60
    FROM v, LATERAL (
        SELECT unnest(generate_series(0, CAST(ceil(blen / 32.0) AS INT) - 1))
            AS i
    ) s
    WHERE i % 2 = 0
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """X4 frame sampling: every 2nd 32-byte pseudo-frame of each
    'video' asset via the one-to-many mapInPandas kernel (row expansion
    inside the Arrow batch — no materialized frame arrays, no shuffle).
    ASCII payloads make byte slices == char slices, so DuckDB can
    recompute each frame's checksum independently."""
    videos = _assets(spark, sf_dir).where(
        F.col("media_type") == "video/mp4"
    )
    return sample_frames(videos, frame_bytes=32, stride=2)


@register(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id AS asset_id,
           """
    + ",\n           ".join(
        f"CASE WHEN {i} <= length(text)"
        f" THEN ascii(substr(text, {i}, 1)) / 256.0"
        f" ELSE 0.0 END AS f{i}"
        for i in range(1, 9)
    )
    + """
    FROM documents
    """,
)
def multimodal_feature_extract(spark, sf_dir):
    """The scalar pandas_udf path under the gate: binary payload →
    8-dim feature vector (stub: first bytes scaled to [0,1);
    production: an embedding model). Payloads are ASCII text bytes, so
    DuckDB recomputes each feature from character codes — the Arrow
    binary→array<float> UDF round-trip is value-checked end to end.

    Output shape: the vector is projected to eight scalar columns
    ``f1..f8`` (``element_at`` on the UDF's array<float>, cast to
    double). The driver's pandas canonicalizer sorts result cells and
    cannot order Python lists, so priority-window queries must emit
    scalar columns only (see the registry docstring); multiples of
    1/256 in [0,1) are exact in float32, so the float→double cast
    loses nothing and matches DuckDB bit-for-bit."""
    from ..operators.multimodal import extract_features

    a = _assets(spark, sf_dir)
    feats = extract_features(F.col("payload"))
    return a.select(
        "asset_id",
        *[
            F.element_at(feats, i).cast("double").alias(f"f{i}")
            for i in range(1, 9)
        ],
    )


@register(
    "props_variant_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.absent')
                         IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_missing_path
    FROM events
    GROUP BY event_type
    """,
)
def props_variant_rollup(spark, sf_dir):
    """X4 Variant tier (Spark 4): the props JSON ingested ONCE as a
    VariantType value — the open-schema semi-structured encoding that
    replaces per-path get_json_object re-parsing — then typed path
    extraction (`variant_get` '$.k' as bigint), safe access to an
    absent path (`try_variant_get` → SQL NULL, no error), and a rollup
    per event type.

    Three semi-structured tiers now certified side by side: string
    path extraction (JSON access in scalar bundles), MapType
    materialization (`props_maptype`), and Variant — the tier that
    scales to heterogeneous 100 TB JSON because the binary encoding
    parses once at ingest and every downstream path read is a cheap
    typed probe, not a string re-parse. Expression-only; one
    aggregation shuffle over 5 groups."""
    e = t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    absent = F.try_variant_get(v, "$.absent", "string")
    return (
        e.select("event_type", k.alias("k"), absent.alias("absent"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.sum(F.when(F.col("absent").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_missing_path"),
        )
    )


@register(
    "multimodal_ppm_decode",
    oracle="""
    WITH img AS (
        SELECT doc_id AS asset_id,
               4 + doc_id % 8 AS w,
               3 + doc_id % 5 AS h,
               text,
               length(text) AS n
        FROM documents
    )
    SELECT asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(w * h AS BIGINT) AS n_px,
           CAST(list_sum(list_transform(range(0, w * h),
                j -> ascii(text[((3 * j + 0) % n) + 1]))) AS BIGINT) AS sum_r,
           CAST(list_sum(list_transform(range(0, w * h),
                j -> ascii(text[((3 * j + 1) % n) + 1]))) AS BIGINT) AS sum_g,
           CAST(list_sum(list_transform(range(0, w * h),
                j -> ascii(text[((3 * j + 2) % n) + 1]))) AS BIGINT) AS sum_b
    FROM img
    """,
)
def multimodal_ppm_decode(spark, sf_dir):
    """X4, REAL codec tier: binary P6 PPM images decoded by the
    production numpy kernel (header parse → frombuffer → reshape →
    vectorized channel sums; operators/multimodal.py:decode_ppm_assets)
    — no stub anywhere in this path, and every output value is under
    the DuckDB gate.

    The images are synthesized in pure Catalyst expressions: per doc a
    w×h canvas (w = 4 + id%8, h = 3 + id%5) whose pixel bytes are the
    doc's ASCII text cycled to w*h*3 bytes, prefixed with the real
    ``P6\\n<w> <h>\\n255\\n`` header and cast to binary. The oracle
    never sees the binary: it recomputes each channel sum
    arithmetically from the text — the two engines reach the same
    bigints through completely independent paths (bytes → numpy vs
    chars → list fold).

    Scale shape: synthesis and decode are one narrow Arrow pass over
    the documents scan; payloads never shuffle; the result is skinny
    scalars."""
    d = t(spark, sf_dir, "documents")
    w = F.lit(4) + F.col("doc_id") % 8
    h = F.lit(3) + F.col("doc_id") % 5
    nbytes = (w * h * 3).cast("int")
    reps = F.ceil(nbytes / F.length("text")).cast("int")
    body = F.substring(F.repeat(F.col("text"), reps), 1, nbytes)
    # ASCII text ⇒ chars == bytes, so the string cast is the byte buffer
    payload = F.concat(
        F.format_string("P6\n%d %d\n255\n", w, h), body
    ).cast("binary")
    assets = d.select(
        F.col("doc_id").alias("asset_id"), payload.alias("payload")
    )
    return decode_ppm_assets(assets)


# --------------------------------------------------------------------------
# X4, REAL codec tier: nearest-neighbor resize (binary → binary → gate)
# --------------------------------------------------------------------------
@register(
    "multimodal_ppm_resize",
    oracle="""
    WITH img AS (
        SELECT doc_id AS asset_id,
               4 + doc_id % 8 AS w,
               3 + doc_id % 5 AS h,
               text,
               length(text) AS n
        FROM documents
    )
    SELECT asset_id,
           CAST(4 AS BIGINT) AS width,
           CAST(4 AS BIGINT) AS height,
           CAST(16 AS BIGINT) AS n_px,
           CAST(list_sum(list_transform(range(0, 16), j ->
                ascii(text[((3 * ((((j // 4) * h) // 4) * w
                                  + (((j % 4) * w) // 4)) + 0) % n) + 1])))
                AS BIGINT) AS sum_r,
           CAST(list_sum(list_transform(range(0, 16), j ->
                ascii(text[((3 * ((((j // 4) * h) // 4) * w
                                  + (((j % 4) * w) // 4)) + 1) % n) + 1])))
                AS BIGINT) AS sum_g,
           CAST(list_sum(list_transform(range(0, 16), j ->
                ascii(text[((3 * ((((j // 4) * h) // 4) * w
                                  + (((j % 4) * w) // 4)) + 2) % n) + 1])))
                AS BIGINT) AS sum_b
    FROM img
    """,
)
def multimodal_ppm_resize(spark, sf_dir):
    """X4, REAL resize tier: the ``resize_ppm_assets`` nearest-neighbor
    kernel under the full value gate. Same Catalyst-synthesized P6
    images as ``multimodal_ppm_decode`` (w = 4+id%8, h = 3+id%5, pixel
    bytes = the doc's ASCII text cycled), resized to a fixed 4x4 —
    DOWN-scaling for wide/tall inputs and UP-scaling for the 4x3 case,
    both directions of the gather — then decoded again by the real PPM
    decoder, so the gate covers decode → resize → re-encode → decode.

    The oracle recomputes every resized channel sum arithmetically:
    output pixel (r, c) maps to source pixel (r*h//4, c*w//4) (the
    kernel's integer floor mapping), whose channel-k byte is the text
    character at (3*(R*w + C) + k) mod n — two engines, same bigints,
    completely independent paths (numpy fancy-indexed gather vs a
    16-element list fold).

    Scale shape: synthesize → resize → decode is ONE narrow Arrow
    pass over the documents scan; payloads never shuffle."""
    d = t(spark, sf_dir, "documents")
    w = F.lit(4) + F.col("doc_id") % 8
    h = F.lit(3) + F.col("doc_id") % 5
    nbytes = (w * h * 3).cast("int")
    reps = F.ceil(nbytes / F.length("text")).cast("int")
    body = F.substring(F.repeat(F.col("text"), reps), 1, nbytes)
    payload = F.concat(
        F.format_string("P6\n%d %d\n255\n", w, h), body
    ).cast("binary")
    assets = d.select(
        F.col("doc_id").alias("asset_id"), payload.alias("payload")
    )
    resized = resize_ppm_assets(assets, 4, 4).select("asset_id", "payload")
    return decode_ppm_assets(resized)


# --------------------------------------------------------------------------
# X4, REAL codec tier #2: RIFF/WAVE PCM audio
# --------------------------------------------------------------------------
@register(
    "multimodal_wav_decode",
    oracle="""
    WITH au AS (
        SELECT doc_id AS asset_id,
               32 + doc_id % 60 AS ns,
               text,
               length(text) AS n
        FROM documents
    )
    SELECT asset_id,
           CAST(ns AS BIGINT) AS n_samples,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(list_sum(list_transform(range(0, ns),
                j -> ascii(text[(j % n) + 1]))) AS BIGINT) AS sum_amp,
           CAST(list_max(list_transform(range(0, ns),
                j -> ascii(text[(j % n) + 1]))) AS BIGINT) AS peak,
           CAST(list_min(list_transform(range(0, ns),
                j -> ascii(text[(j % n) + 1]))) AS BIGINT) AS trough
    FROM au
    """,
)
def multimodal_wav_decode(spark, sf_dir):
    """X4, REAL codec tier #2: RIFF/WAVE PCM audio decoded by the
    production struct+numpy kernel (little-endian header unpack →
    validation → frombuffer → exact amplitude stats;
    operators/multimodal.py:decode_wav_assets) — the audio twin of the
    P6 PPM image path, with no stub anywhere and every output under
    the DuckDB gate.

    The payloads are synthesized in pure Catalyst expressions: a
    canonical 44-byte mono 8-bit 8 kHz WAV header (every multi-byte
    little-endian field chosen so each byte stays < 0x80 — ``char()``
    emits single-byte UTF-8, so the string cast IS the byte buffer)
    followed by 32 + id%60 PCM samples taken from the doc's ASCII text
    cycled. The oracle never sees the binary: it recomputes
    sum/peak/trough arithmetically from the text, so the two engines
    reach the same bigints through completely independent paths
    (bytes → struct/numpy vs chars → list folds). The parsed
    ``sample_rate`` column proves the header fields really travel
    through the binary format.

    Scale shape: synthesis and decode are one narrow Arrow pass over
    the documents scan; payloads never shuffle; skinny scalar output.
    """
    d = t(spark, sf_dir, "documents")
    ns = (F.lit(32) + F.col("doc_id") % 60).cast("int")
    chunk = (F.lit(36) + ns).cast("int")

    def ch(x):
        col = F.lit(x) if isinstance(x, int) else x
        return F.char(col)

    header = F.concat(
        F.lit("RIFF"), ch(chunk), ch(0), ch(0), ch(0),
        F.lit("WAVE"),
        F.lit("fmt "), ch(16), ch(0), ch(0), ch(0),
        ch(1), ch(0),                       # audio_format = 1 (PCM)
        ch(1), ch(0),                       # mono
        ch(64), ch(31), ch(0), ch(0),       # sample_rate 8000 = 0x1F40 LE
        ch(64), ch(31), ch(0), ch(0),       # byte_rate = 8000 (mono 8-bit)
        ch(1), ch(0),                       # block_align
        ch(8), ch(0),                       # bits_per_sample
        F.lit("data"), ch(ns), ch(0), ch(0), ch(0),
    )
    reps = F.ceil(ns / F.length("text")).cast("int")
    body = F.substring(F.repeat(F.col("text"), reps), 1, ns)
    payload = F.concat(header, body).cast("binary")
    assets = d.select(
        F.col("doc_id").alias("asset_id"), payload.alias("payload")
    )
    return decode_wav_assets(assets)


# --------------------------------------------------------------------------
# X4, REAL codec tier #3: YUV4MPEG2 video demux (one row per frame)
# --------------------------------------------------------------------------
@register(
    "multimodal_y4m_frames",
    oracle="""
    WITH vid AS (
        SELECT doc_id AS asset_id,
               2 + doc_id % 3 AS w,
               2 + doc_id % 2 AS h,
               2 + doc_id % 3 AS nf,
               text,
               length(text) AS n
        FROM documents
    ),
    fr AS (
        SELECT asset_id, w, h, n, text,
               UNNEST(range(0, nf)) AS f
        FROM vid
    )
    SELECT asset_id,
           CAST(f AS BIGINT) AS frame_idx,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(list_sum(list_transform(range(0, w * h),
                j -> ascii(text[((f * 3 * w * h + j) % n) + 1])))
               AS BIGINT) AS sum_y,
           CAST(list_sum(list_transform(range(0, w * h),
                j -> ascii(text[((f * 3 * w * h + w * h + j) % n) + 1])))
               AS BIGINT) AS sum_u,
           CAST(list_sum(list_transform(range(0, w * h),
                j -> ascii(text[((f * 3 * w * h + 2 * w * h + j) % n) + 1])))
               AS BIGINT) AS sum_v
    FROM fr
    """,
)
def multimodal_y4m_frames(spark, sf_dir):
    """X4, REAL codec tier #3: YUV4MPEG2 video streams demuxed by the
    production numpy kernel (header-tag parse → FRAME-marker walk →
    per-plane exact sums, one output row per frame;
    operators/multimodal.py:demux_y4m_assets). Completes the real-codec
    trio — P6 image, WAV audio, Y4M video — with the one-to-many
    frame expansion the earlier sampling stub only simulated, and
    every value under the DuckDB gate.

    Streams are synthesized in pure Catalyst: per doc a w x h C444
    clip of nf = 2 + id%3 frames; frame f's 3*w*h plane bytes are the
    doc's ASCII text cycled starting at absolute offset f*3*w*h, each
    frame prefixed with the literal ``FRAME\\n`` marker behind a real
    ``YUV4MPEG2 W.. H.. F25:1 C444`` header. The oracle never sees the
    binary: it recomputes every plane sum arithmetically from the text
    with the same modular offsets — independent paths, identical
    bigints.

    Scale shape: synthesis and demux are one narrow Arrow pass over the
    documents scan; payloads never shuffle; output is one skinny row
    per frame.
    """
    d = t(spark, sf_dir, "documents")
    w = (F.lit(2) + F.col("doc_id") % 3).cast("int")
    h = (F.lit(2) + F.col("doc_id") % 2).cast("int")
    nf = (F.lit(2) + F.col("doc_id") % 3).cast("int")
    wh3 = (w * h * 3).cast("int")
    total = (nf * wh3).cast("int")
    reps = F.ceil(total / F.length("text")).cast("int")
    staged = d.select(
        F.col("doc_id").alias("asset_id"),
        w.alias("w"),
        h.alias("h"),
        nf.alias("nf"),
        wh3.alias("wh3"),
        F.substring(F.repeat(F.col("text"), reps), 1, total).alias("cycled"),
    )
    assets = staged.select(
        "asset_id",
        F.concat(
            F.format_string(
                "YUV4MPEG2 W%d H%d F25:1 C444\n", F.col("w"), F.col("h")
            ),
            F.array_join(
                F.expr(
                    "transform(sequence(0, nf - 1),"
                    " f -> concat('FRAME\n',"
                    "             substring(cycled, f * wh3 + 1, wh3)))"
                ),
                "",
            ),
        ).cast("binary").alias("payload"),
    )
    return demux_y4m_assets(assets)


@register(
    "y4m_scene_cuts",
    oracle="""
    WITH vid AS (
        SELECT doc_id AS asset_id,
               2 + doc_id % 3 AS w,
               2 + doc_id % 2 AS h,
               2 + doc_id % 3 AS nf,
               text,
               length(text) AS n
        FROM documents
    ),
    fr AS (
        SELECT asset_id, w, h, n, text,
               UNNEST(range(0, nf)) AS f
        FROM vid
    )
    SELECT asset_id,
           CAST(f AS BIGINT) AS frame_idx,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(CASE WHEN f = 0 THEN 0 ELSE list_sum(
               list_transform(range(0, w * h),
                   j -> abs(ascii(text[((f * 3 * w * h + j) % n) + 1])
                          - ascii(text[(((f - 1) * 3 * w * h + j) % n)
                                       + 1]))))
               END AS BIGINT) AS sad_prev_y,
           CASE WHEN f = 0 THEN FALSE ELSE list_sum(
               list_transform(range(0, w * h),
                   j -> abs(ascii(text[((f * 3 * w * h + j) % n) + 1])
                          - ascii(text[(((f - 1) * 3 * w * h + j) % n)
                                       + 1])))) >= 30 * w * h
               END AS is_cut
    FROM fr
    """,
)
def y4m_scene_cuts(spark, sf_dir):
    """Shot-boundary (scene-cut) detection over binary Y4M video: the
    ``multimodal_y4m_frames`` synthesis feeds the scene-stats kernel
    (operators/multimodal.py:y4m_scene_stats_assets), which retains
    each frame's luma plane and emits the exact sum of absolute
    per-pixel Y differences vs the previous frame; a frame is a cut
    when SAD >= 30 per pixel — the classic threshold detector every
    video-ingest pipeline runs to pick keyframes for captioning and to
    split clips at shot boundaries before sampling training frames.

    The DuckDB oracle never decodes binary: it recomputes each SAD
    arithmetically from the document text with the same modular
    offsets the synthesis used — independent paths, identical bigints
    (uint8 planes widen to int64 before subtraction in the kernel, so
    both sides are exact integer arithmetic).

    Scale shape: identical to the demux certification — one narrow
    Arrow pass over the documents scan, payloads never shuffle,
    previous-frame state is kernel-local to each asset row."""
    d = t(spark, sf_dir, "documents")
    w = (F.lit(2) + F.col("doc_id") % 3).cast("int")
    h = (F.lit(2) + F.col("doc_id") % 2).cast("int")
    nf = (F.lit(2) + F.col("doc_id") % 3).cast("int")
    wh3 = (w * h * 3).cast("int")
    total = (nf * wh3).cast("int")
    reps = F.ceil(total / F.length("text")).cast("int")
    staged = d.select(
        F.col("doc_id").alias("asset_id"),
        w.alias("w"),
        h.alias("h"),
        nf.alias("nf"),
        wh3.alias("wh3"),
        F.substring(F.repeat(F.col("text"), reps), 1, total).alias("cycled"),
    )
    assets = staged.select(
        "asset_id",
        F.concat(
            F.format_string(
                "YUV4MPEG2 W%d H%d F25:1 C444\n", F.col("w"), F.col("h")
            ),
            F.array_join(
                F.expr(
                    "transform(sequence(0, nf - 1),"
                    " f -> concat('FRAME\n',"
                    "             substring(cycled, f * wh3 + 1, wh3)))"
                ),
                "",
            ),
        ).cast("binary").alias("payload"),
    )
    stats = y4m_scene_stats_assets(assets)
    return stats.select(
        "asset_id",
        "frame_idx",
        "width",
        "height",
        "sad_prev_y",
        (
            (F.col("frame_idx") > 0)
            & (F.col("sad_prev_y") >= 30 * F.col("width") * F.col("height"))
        ).alias("is_cut"),
    )
