"""Multimodal columns: opaque binary payloads + typed metadata, with
decode/feature-extract as Arrow-batched Pandas UDFs.

North-Star surface (SURVEY.md §2B): images/audio/video ride through the
engine as ``BinaryType`` columns with a metadata struct; per-item decode
and feature extraction run in ``mapInPandas`` so bytes move executor-side
in Arrow batches, never through the driver.

The actual media codecs (PIL/ffmpeg/librosa) are NOT in this container,
so ``decode_media`` has two paths:
- ``fake`` (default, tested): a deterministic pseudo-decode that derives
  metadata arithmetically from the payload bytes — the Spark-side
  plumbing (schema, batching, UDF signature, partitioning) is fully real
  and oracle-checked;
- ``real``: raises ``NotImplementedError`` with the dependency it needs —
  the marked stub to swap in a codec where available.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import load_table, pin_before_sort

DECODE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, width int, height int, "
    "n_frames int"
)


def with_media_payload(docs: DataFrame) -> DataFrame:
    """Model documents as media rows: binary payload + typed metadata.

    Real pipelines land bytes from object storage
    (``spark.read.format("binaryFile")``); here the fixture text is
    encoded so every stage downstream is identical.

    NULL-text docs are excluded (= media rows with no payload): the
    decode UDFs would crash on a None payload while the SQL oracles
    would emit NULL metadata — the q95 NULL-text divergence class,
    excluded identically on both sides (every q45-q56/q115 oracle
    carries the matching ``WHERE text IS NOT NULL``).
    """
    return docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("content_type"),
            F.length(F.col("text")).alias("declared_len"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic pseudo-decode: metadata from byte arithmetic.

    Chosen to be re-computable in SQL (the oracle recomputes it from
    octet_length), so the whole decode path is value-hash-checked.
    """
    n = len(payload)
    width = 64 + (n % 512)
    height = 64 + ((n * 7) % 512)
    n_frames = (n + 255) // 256
    return n, width, height, n_frames


#: Deploy-time swap point for the REAL codec: assign a
#: ``bytes -> (n_bytes, width, height, n_frames)`` callable (PIL/ffmpeg
#: wrapper) here and ``decode_media(mode="real")`` routes every Arrow
#: batch through it — schema, batching, and executor shipping are
#: identical to the fake path, which is what the swap-in contract test
#: (tests/test_multimodal_phash.py::test_real_decoder_swap_in) pins.
_REAL_DECODER = None


def decode_media(
    media: DataFrame, mode: str = "fake", with_origin: bool = False
) -> DataFrame:
    """Decode payloads to typed metadata via mapInPandas (Arrow batches).

    ``with_origin=True`` carries ``media_meta.origin`` through the
    decode batch as an output column — the metadata is already IN the
    Arrow batch, so consumers that need it (q46's per-source rollup)
    get it for free instead of paying a corpus-wide join back to the
    source table.
    """
    if mode == "real":
        if _REAL_DECODER is None:
            raise NotImplementedError(
                "real media decode needs PIL/ffmpeg, not present in this "
                "image; install one and assign the per-payload codec to "
                "multimodal._REAL_DECODER — schema and batching are "
                "unchanged (see test_real_decoder_swap_in)"
            )
        decoder = _REAL_DECODER
    else:
        decoder = _fake_decode

    from batch_processing_new_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decoder(p) for p in pdf["payload"]]
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": [m["content_type"] for m in pdf["media_meta"]],
                "n_bytes": [d[0] for d in decoded],
                "width": [d[1] for d in decoded],
                "height": [d[2] for d in decoded],
                "n_frames": [d[3] for d in decoded],
            }
            if with_origin:
                out["origin"] = [m["origin"] for m in pdf["media_meta"]]
            yield pd.DataFrame(out)

    schema = DECODE_SCHEMA + (", origin string" if with_origin else "")
    return media.mapInPandas(run, schema=schema)


@query(
    "q45_multimodal_decode",
    oracle="""
SELECT doc_id,
       'image/fake'                                AS media_type,
       octet_length(encode(text))                  AS n_bytes,
       64 + (octet_length(encode(text)) % 512)     AS width,
       64 + ((octet_length(encode(text)) * 7) % 512) AS height,
       CAST(ceil(octet_length(encode(text)) / 256.0) AS INT) AS n_frames
FROM documents WHERE text IS NOT NULL
ORDER BY doc_id
""",
)
def q45_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> mapInPandas decode -> typed metadata, end to end.

    The oracle recomputes the fake decode from octet_length, so the
    binary encode/Arrow-transfer/decode plumbing is value-hash-checked.
    """
    d = load_table(spark, sf_dir, "documents")
    # pin the Arrow decode pass: range sampling would run it twice
    return pin_before_sort(decode_media(with_media_payload(d))).orderBy(
        "doc_id"
    )


@query(
    "q46_multimodal_filter_agg",
    oracle="""
WITH m AS (
    SELECT source,
           octet_length(encode(text)) AS n_bytes,
           CAST(ceil(octet_length(encode(text)) / 256.0) AS INT) AS n_frames
    FROM documents WHERE text IS NOT NULL
)
SELECT source,
       count(*)                         AS n_items,
       CAST(sum(n_bytes) AS BIGINT)     AS total_bytes,
       CAST(sum(n_frames) AS BIGINT)    AS total_frames
FROM m
WHERE n_bytes >= 128
GROUP BY source
ORDER BY source
""",
)
def q46_multimodal_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational ops over decoded media metadata (filter + agg after the
    Python decode boundary — the typical multimodal pipeline shape)."""
    d = load_table(spark, sf_dir, "documents")
    # origin rides the decode batch (it is already in media_meta) —
    # the previous join back to documents shuffled the whole decoded
    # corpus just to re-attach a column the UDF held in hand
    meta = decode_media(
        with_media_payload(d.select("doc_id", "text", "source")),
        with_origin=True,
    )
    return (
        meta.withColumnRenamed("origin", "source")
        .where(F.col("n_bytes") >= 128)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.sum("n_frames").cast("bigint").alias("total_frames"),
        )
        .orderBy("source")
    )


# ----------------------------------------- resize / frames / features

TARGET_BOX = 224  # fake-resize target (the ubiquitous vision-model input)
FRAME_STRIDE = 4  # keep every 4th frame

RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, out_w int, out_h int"
)
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_key string"
FEATURE_DIM = 8
FEATURE_SCHEMA = "doc_id bigint, feature array<double>"


def resize_media(decoded: DataFrame) -> DataFrame:
    """Fake resize: fit (width, height) into a TARGET_BOX square keeping
    aspect ratio, integer arithmetic only (so the oracle recomputes it
    bit-exactly). A real codec would also emit resized bytes; the
    Spark-side shape — metadata in, metadata out, mapInPandas batch —
    is identical.
    """
    from batch_processing_new_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(decoded.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            g = pdf[["width", "height"]].max(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_w": (pdf["width"] * TARGET_BOX) // g,
                    "out_h": (pdf["height"] * TARGET_BOX) // g,
                }
            )

    return decoded.select("doc_id", "width", "height").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


def sample_frames(decoded: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Fake frame sampling: one output row per kept frame (indexes
    0, stride, 2*stride, ... < n_frames), each tagged with a
    deterministic frame key (md5 of doc_id:frame_idx — what a real
    pipeline would replace with the frame's content hash).

    Cardinality-changing mapInPandas: the batch that comes in is not the
    batch that goes out — the plumbing a real video sampler needs.
    """
    from batch_processing_new_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(decoded.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, keys = [], [], []
            for doc_id, n_frames in zip(pdf["doc_id"], pdf["n_frames"]):
                for k in range(0, int(n_frames), stride):
                    ids.append(doc_id)
                    idxs.append(k)
                    keys.append(
                        hashlib.md5(f"{doc_id}:{k}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_key": keys}
            )

    return decoded.select("doc_id", "n_frames").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


def extract_features(decoded: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Fake feature extraction: an 8-d vector derived from md5 of
    (doc_id, slot, n_bytes) — deterministic, SQL-recomputable, and
    shaped exactly like a real embedding UDF (array<double> out,
    Arrow-batched in)."""
    from batch_processing_new_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(decoded.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def feat(doc_id: int, n_bytes: int) -> list[float]:
            out = []
            for j in range(dim):
                h = hashlib.md5(f"{doc_id}:{j}:{n_bytes}".encode()).hexdigest()
                out.append(round(int(h[:8], 16) / 0xFFFFFFFF, 6))
            return out

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feature": [
                        feat(d, n)
                        for d, n in zip(pdf["doc_id"], pdf["n_bytes"])
                    ],
                }
            )

    return decoded.select("doc_id", "n_bytes").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


_N_BYTES_SQL = "octet_length(encode(text))"
_WIDTH_SQL = f"64 + ({_N_BYTES_SQL} % 512)"
_HEIGHT_SQL = f"64 + (({_N_BYTES_SQL} * 7) % 512)"
_N_FRAMES_SQL = f"CAST(ceil({_N_BYTES_SQL} / 256.0) AS INT)"


@query(
    "q54_multimodal_resize",
    oracle=f"""
WITH m AS (
    SELECT doc_id, {_WIDTH_SQL} AS width, {_HEIGHT_SQL} AS height
    FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, width, height,
       CAST((width  * {TARGET_BOX}) // greatest(width, height) AS INT) AS out_w,
       CAST((height * {TARGET_BOX}) // greatest(width, height) AS INT) AS out_h
FROM m
ORDER BY doc_id
""",
)
def q54_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode -> resize, both Pandas-UDF stages, fully oracle-checked."""
    d = load_table(spark, sf_dir, "documents")
    # pin the two-stage Python decode->resize chain (q45 rationale)
    return pin_before_sort(
        resize_media(decode_media(with_media_payload(d)))
    ).orderBy("doc_id")


@query(
    "q55_frame_sample",
    oracle=f"""
WITH m AS (
    SELECT doc_id, {_N_FRAMES_SQL} AS n_frames
    FROM documents WHERE text IS NOT NULL
),
f AS (
    SELECT doc_id, unnest(range(0, n_frames, {FRAME_STRIDE})) AS f FROM m
)
SELECT doc_id,
       CAST(f AS INT)                            AS frame_idx,
       md5(doc_id::VARCHAR || ':' || f::VARCHAR) AS frame_key
FROM f
ORDER BY doc_id, frame_idx
""",
)
def q55_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode -> stride frame sampling (cardinality-changing Python map)."""
    d = load_table(spark, sf_dir, "documents")
    # pin the decode->frame-sample Python chain (q45 rationale)
    return pin_before_sort(
        sample_frames(decode_media(with_media_payload(d)))
    ).orderBy("doc_id", "frame_idx")


@query(
    "q56_media_features",
    oracle=f"""
WITH m AS (
    SELECT doc_id, {_N_BYTES_SQL} AS n_bytes
    FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       array_to_string(
           [printf('%.6f', round(('0x' || substr(md5(doc_id::VARCHAR || ':' || j::VARCHAR || ':' || n_bytes::VARCHAR), 1, 8))::BIGINT / 4294967295.0, 6))
            FOR j IN generate_series(0, {FEATURE_DIM - 1})], ',') AS feature
FROM m
ORDER BY doc_id
""",
)
def q56_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode -> fake embedding extraction. The pipeline keeps the
    array<double> (extract_features); the QUERY projection fixes each
    element with %.6f and comma-joins — the driver's pandas hasher
    cannot canonicalize array cells (see q65 in CORRECTNESS_r01)."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(decode_media(with_media_payload(d)))
    # pin the decode->features Python chain (q45 rationale)
    return pin_before_sort(
        feats.select(
            "doc_id",
            F.concat_ws(
                ",",
                F.transform("feature", lambda x: F.format_string("%.6f", x)),
            ).alias("feature"),
        )
    ).orderBy("doc_id")


# ------------------------------------- perceptual-hash near-dup (pHash)

PHASH_GRID = 32       # pseudo-decode: payload tiled into a 32x32 image
PHASH_BLOCK = 8       # keep the top-left 8x8 DCT block
PHASH_BITS = PHASH_BLOCK * PHASH_BLOCK - 1  # 63 (DC dropped) -> signed long
PHASH_MAX_HAMMING = 10
# 11 chunks x 6 bits over 63 hash bits: pigeonhole guarantees that any
# pair within PHASH_MAX_HAMMING=10 shares at least one untouched chunk
# (10 flipped bits cannot cover 11 chunks) — the blocking guarantee now
# MATCHES the advertised threshold (7-bit chunks only guaranteed <= 8)
_PHASH_CHUNK_BITS = 6


_DCT_SCALE_BITS = 18  # basis quantum 2^-18: ~4e-6 — far below any
#                       coefficient spacing that could flip a sign bit


def _dct_matrix(n: int = PHASH_GRID):
    """Orthonormal DCT-II basis (float64)."""
    import numpy as np

    j, i = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * j / (2 * n))
    d[0, :] = 1.0 / np.sqrt(n)
    return d


def _dct_matrix_q(n: int = PHASH_GRID):
    """The DCT basis quantized to int64 at 2^{_DCT_SCALE_BITS} — every
    downstream product/sum is then EXACT integer arithmetic (max
    |coef| ~ 1.2e15, inside int64), so the sign-vs-median threshold has
    no float knife-edge for any engine to disagree on. This is the
    fixed-point discipline that let hash60 carry exact oracles
    (q183), applied to the DCT (q115's oracle replays it in SQL)."""
    import numpy as np

    return np.rint(_dct_matrix(n) * (1 << _DCT_SCALE_BITS)).astype(np.int64)


def phash_bytes(payload: bytes) -> int:
    """Classic pHash over the fake-decoded image: tile the payload bytes
    into a {PHASH_GRID}x{PHASH_GRID} grayscale grid, 2-D DCT (the
    int64-quantized basis — see ``_dct_matrix_q``), keep the top-left
    {PHASH_BLOCK}x{PHASH_BLOCK} low-frequency block, drop the DC term,
    threshold the remaining 63 coefficients at their median (exact
    middle order statistic of an odd count) -> 63-bit fingerprint
    (fits a signed BIGINT).

    The DCT/median/sign math is the real algorithm — only the
    pixel source is the deterministic pseudo-decode (a real codec swaps
    in `decoded_pixels = decode(payload)` and nothing else changes).
    Pure-numpy and driver-callable so tests can pin the distributed
    output to this exact function.
    """
    import numpy as np

    b = np.frombuffer(payload, dtype=np.uint8)
    if b.size == 0:
        b = np.zeros(1, dtype=np.uint8)
    img = (
        np.resize(b, PHASH_GRID * PHASH_GRID)
        .reshape(PHASH_GRID, PHASH_GRID)
        .astype(np.int64)
    )
    d = _dct_matrix_q()
    coef = (d @ img @ d.T)[:PHASH_BLOCK, :PHASH_BLOCK].ravel()[1:]
    med = int(np.sort(coef)[coef.size // 2])  # 63 values -> exact middle
    return int(sum(1 << k for k, v in enumerate(coef > med) if v))


def phash_media(media: DataFrame) -> DataFrame:
    """(doc_id, phash) via mapInPandas — one Arrow batch in, one DCT per
    item, bytes never leave the executor."""
    from batch_processing_new_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [phash_bytes(p) for p in pdf["payload"]],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id bigint, phash bigint"
    )


def phash_neardup_pairs(
    media: DataFrame, max_hamming: int = PHASH_MAX_HAMMING
) -> DataFrame:
    """Perceptual near-dup pairs: Hamming(phash) <= max_hamming, blocked
    on 11 x 6-bit hash chunks (pigeonhole guarantees FULL recall up to
    distance 10 = the default threshold; a distance-11+ pair can evade
    every chunk, as in SimHash banding).

    The image-side twin of q39's text SimHash: candidates shuffle on
    (chunk_id, chunk) only — two ints — and verification is one XOR +
    bit_count per candidate. At 100 TB the chunk table is the thing you
    persist; re-screening new media is a broadcast-join against it.
    """
    hashed = phash_media(media).localCheckpoint(eager=False)
    n_chunks = (PHASH_BITS + _PHASH_CHUNK_BITS - 1) // _PHASH_CHUNK_BITS
    mask = (1 << _PHASH_CHUNK_BITS) - 1
    chunks = hashed.select(
        "doc_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))).alias("chunk_id"),
    ).withColumn(
        "chunk",
        F.expr(f"(phash >> (chunk_id * {_PHASH_CHUNK_BITS})) & {mask}"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _phash_oracle() -> str:
    """q115's DuckDB replay: tile utf-8 bytes (pure-ASCII fixture:
    ascii() == byte value) into the 32x32 grid, apply the SAME int64
    DCT basis (the literal below is generated from ``_dct_matrix_q`` at
    import time, so Spark and the oracle always share one matrix),
    median-threshold to the 63-bit hash, then replay the 6-bit-chunk
    blocking join and Hamming verify. All-integer end to end."""
    dq = _dct_matrix_q().tolist()
    m = "[" + ",".join("[" + ",".join(str(v) for v in row) + "]" for row in dq) + "]"
    n_chunks = (PHASH_BITS + _PHASH_CHUNK_BITS - 1) // _PHASH_CHUNK_BITS
    mask = (1 << _PHASH_CHUNK_BITS) - 1
    return f"""
WITH dq AS (SELECT {m} AS m),
px AS (
    -- TRUE UTF-8 bytes via hex pairs (the kernel's np.frombuffer):
    -- ascii() codepoints only coincide with bytes on pure-ASCII text,
    -- and a CJK codepoint (~35k) overflows the INT32 multiply below
    SELECT doc_id, g.i AS i,
           CASE WHEN octet_length(encode(text)) = 0 THEN 0::BIGINT
                ELSE ('0x' || substr(hex(encode(text)),
                      2 * (g.i % octet_length(encode(text))) + 1,
                      2))::BIGINT
           END AS v
    FROM documents, generate_series(0, {PHASH_GRID * PHASH_GRID - 1}) g(i)
    WHERE text IS NOT NULL
),
t1 AS (
    SELECT px.doc_id, px.i // {PHASH_GRID} AS a, k.k,
           sum(px.v * dq.m[k.k + 1][(px.i % {PHASH_GRID}) + 1])::BIGINT AS rs
    FROM px, generate_series(0, {PHASH_BLOCK - 1}) k(k), dq
    GROUP BY px.doc_id, a, k.k
),
t2 AS (
    SELECT t1.doc_id, j.j, t1.k,
           sum(dq.m[j.j + 1][t1.a + 1] * t1.rs)::BIGINT AS coef
    FROM t1, generate_series(0, {PHASH_BLOCK - 1}) j(j), dq
    GROUP BY t1.doc_id, j.j, t1.k
),
coefs AS (
    SELECT doc_id, j * {PHASH_BLOCK} + k AS idx, coef
    FROM t2 WHERE NOT (j = 0 AND k = 0)
),
med AS (
    SELECT doc_id, quantile_disc(coef, 0.5) AS med
    FROM coefs GROUP BY doc_id
),
ph AS (
    SELECT c.doc_id,
           sum(CASE WHEN c.coef > med.med
                    THEN 1::BIGINT << (c.idx - 1) ELSE 0 END)::BIGINT AS phash
    FROM coefs c JOIN med USING (doc_id)
    GROUP BY c.doc_id
),
chunks AS (
    SELECT doc_id, phash, g.cid AS chunk_id,
           (phash >> (g.cid * {_PHASH_CHUNK_BITS})) & {mask} AS chunk
    FROM ph, generate_series(0, {n_chunks - 1}) g(cid)
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.phash AS ph_a, b.phash AS ph_b
    FROM chunks a
    JOIN chunks b ON a.chunk_id = b.chunk_id AND a.chunk = b.chunk
                 AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(xor(ph_a, ph_b)) AS hamming
FROM cand
WHERE bit_count(xor(ph_a, ph_b)) <= {PHASH_MAX_HAMMING}
ORDER BY id_a, id_b
"""


@query("q115_phash_neardup", oracle=_phash_oracle())
def q115_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup pairs over the fake-decoded media corpus
    (Hamming <= {PHASH_MAX_HAMMING} of 63 DCT sign bits), upgraded from
    rows-only to a full value-hash oracle: the int64-quantized DCT
    (``_dct_matrix_q``) makes every coefficient, the median threshold,
    the 63-bit hash, the chunk blocking AND the Hamming verify exact
    integer arithmetic that DuckDB replays bit-for-bit — no float
    knife-edge left for engine builds to disagree on.

    The fixture payloads are distinct texts, so matches are rare by
    design — the operator's behavior on controlled payloads stays
    pinned by tests/test_multimodal_phash.py (exact dup -> 0, one-byte
    flip -> small, independent -> ~32)."""
    d = load_table(spark, sf_dir, "documents")
    return phash_neardup_pairs(with_media_payload(d)).orderBy("id_a", "id_b")
