"""Multimodal column plumbing (SURVEY.md §2B B60 + north star).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct riding alongside — the standard Spark multimodal layout (cf.
``spark.read.format("binaryFile")``: path/length/content). The
decode/feature-extract stage is a ``mapInPandas`` pass over Arrow record
batches: per-batch, bounded-memory, schema declared up front.

The actual media codecs are NOT in this container (SURVEY.md build
constraints), so ``decode_image_stub`` is a clearly-marked deterministic
fake — the Spark-side plumbing (binary column, metadata struct,
mapInPandas batch shape, output schema) is real and oracle-checked: the
fake "decode" derives width/height/checksum from the bytes in a way
DuckDB can recompute from the source text.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from asyncdatapipeline_spark.registry import query
from asyncdatapipeline_spark.sources.tables import load_table


def decode_image_stub(payload: bytes) -> tuple[int, int, str]:
    """STUB decode: deterministic fake for (width, height, checksum).

    A real implementation would hand ``payload`` to PIL/ffmpeg — those
    libs are not in this container. The fake derives dimensions from the
    byte length and checksums the payload, so the full Spark pipeline
    (binary in → struct out) is exercised end-to-end and remains
    oracle-verifiable.
    """
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1, hashlib.md5(payload).hexdigest()


@query(
    "q_multimodal",
    oracle="""
SELECT
  doc_id,
  octet_length(encode(text)) AS n_bytes,
  'image/fake' AS media_type,
  (octet_length(encode(text)) % 640) + 1 AS width,
  (octet_length(encode(text)) % 480) + 1 AS height,
  md5(text) AS checksum
FROM documents
WHERE text IS NOT NULL
""",
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column pipeline (B60).

    text → ``encode(utf-8)`` manufactures the opaque binary payload
    (stand-in for image bytes) + typed metadata → ``mapInPandas``
    "decode" (stubbed, see :func:`decode_image_stub`) emits a typed
    feature row per media object. Batch shape, schema, and partitioning
    are exactly what a real image decode pass uses; only the codec call
    is fake.
    """
    d = load_table(spark, sf_dir, "documents")
    # null text -> null payload (a failed fetch in a real crawl): no
    # media object, no row -- matches the oracle's WHERE text IS NOT NULL
    media = d.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.octet_length(F.col("text")).alias("n_bytes"),
        ).alias("meta"),
    )

    out_schema = (
        "doc_id bigint, n_bytes int, media_type string, "
        "width int, height int, checksum string"
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One Arrow batch at a time → bounded memory however large the
        # corpus; this is where PIL.Image.open(BytesIO(p)) would go.
        for pdf in batches:
            decoded = pdf["payload"].map(decode_image_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "media_type": pdf["meta"].map(lambda m: m["media_type"]),
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "checksum": decoded.map(lambda t: t[2]),
                }
            )

    return media.mapInPandas(decode_batches, schema=out_schema)


_FRAME_BYTES = 64   # bytes per "frame" in the fake video container
_FRAME_STRIDE = 4   # keep every 4th frame


@query(
    "q_mm_frames",
    # Byte-exact oracle: DuckDB cannot slice BLOBs, and substr(text, ...)
    # counts characters, so the frame window is sliced out of the
    # lowercase-hex encoding of the payload instead — 2 hex chars per
    # byte makes hex slicing byte-exact for ANY utf-8 content, and both
    # engines md5 the same hex string (the Spark side checksums
    # frame.hex() to match).
    oracle=f"""
WITH h AS (
  SELECT doc_id, lower(hex(encode(text))) AS hx,
         octet_length(encode(text)) AS nb
  FROM documents
  WHERE text IS NOT NULL AND octet_length(encode(text)) >= {_FRAME_BYTES}
),
f AS (
  SELECT doc_id,
         unnest(generate_series(0,
           CAST(floor((nb - 1) / {_FRAME_BYTES}) AS BIGINT))) AS frame_idx,
         hx, nb
  FROM h
)
SELECT doc_id, frame_idx,
       md5(substring(hx, CAST(frame_idx * {2 * _FRAME_BYTES} + 1 AS BIGINT),
           {2 * _FRAME_BYTES})) AS frame_checksum
FROM f
WHERE frame_idx % {_FRAME_STRIDE} = 0
  AND length(substring(hx, CAST(frame_idx * {2 * _FRAME_BYTES} + 1 AS BIGINT),
        {2 * _FRAME_BYTES})) = {2 * _FRAME_BYTES}
""",
)
def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling over an opaque binary column (B60 family).

    The 1→N-row shape of a real frame sampler: each media payload
    explodes into one row per sampled frame, inside ``mapInPandas`` so
    the expansion streams per Arrow batch instead of materializing all
    frames of all videos (the reason this is NOT an
    ``explode(sequence(...))`` — a real decoder must hold codec state
    per payload, which only the Python side can).

    STUB decode: the "video" is the utf-8 text; a "frame" is a full
    64-byte window, every 4th kept, checksummed (md5 of the frame's
    lowercase-hex form — hex is what a char-counting SQL engine can
    slice byte-exactly, see the oracle note). ffmpeg frame extraction
    would replace the loop 1:1; schema/batching are the real thing,
    and the fake is exact enough for a strict DuckDB oracle.
    """
    d = load_table(spark, sf_dir, "documents")
    media = d.filter(F.col("text").isNotNull()).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def frames_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_sum = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(0, len(payload) // _FRAME_BYTES * _FRAME_BYTES, _FRAME_BYTES):
                    idx = i // _FRAME_BYTES
                    if idx % _FRAME_STRIDE:
                        continue
                    frame = payload[i : i + _FRAME_BYTES]
                    if len(frame) == _FRAME_BYTES:
                        out_ids.append(doc_id)
                        out_idx.append(idx)
                        out_sum.append(
                            hashlib.md5(frame.hex().encode()).hexdigest()
                        )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int64"),
                    "frame_checksum": pd.Series(out_sum, dtype="object"),
                }
            )

    return media.mapInPandas(
        frames_batches, schema="doc_id bigint, frame_idx bigint, frame_checksum string"
    )


@query(
    "q_mm_arrow",
    oracle="""
SELECT
  doc_id,
  octet_length(encode(text)) AS n_bytes,
  md5(text) AS checksum
FROM documents
WHERE text IS NOT NULL
""",
)
def q_mm_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native media decode via ``mapInArrow`` (B60 family).

    Same plumbing as q_multimodal but one level lower: the UDF receives
    raw ``pyarrow.RecordBatch``es — no pandas materialization, the
    right shape when the decode library itself speaks Arrow/numpy
    buffers (zero-copy into the codec). Stub decode = md5 checksum, so
    the full path carries a strict oracle.
    """
    import pyarrow as pa

    d = load_table(spark, sf_dir, "documents")
    media = d.filter(F.col("text").isNotNull()).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def decode_arrow(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for batch in batches:
            doc_ids = batch.column("doc_id")
            payloads = batch.column("payload").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array([len(p) for p in payloads], pa.int32()),
                    pa.array([hashlib.md5(p).hexdigest() for p in payloads]),
                ],
                names=["doc_id", "n_bytes", "checksum"],
            )

    return media.mapInArrow(
        decode_arrow, schema="doc_id bigint, n_bytes int, checksum string"
    )


_RESIZE_BOX = 64  # fit-within box for the stubbed resize


def resize_image_stub(payload: bytes) -> tuple[int, int, int, int, str]:
    """STUB resize-to-fit: deterministic fake for a thumbnailing pass.

    A real implementation hands the payload to PIL's ``thumbnail``; here
    the "image" dims come from the same fake decode as
    :func:`decode_image_stub`, the fit-within-{box}² scaling is the real
    integer math a thumbnailer does, and the "resized payload" is the
    byte prefix sized to the new pixel count — enough to make the whole
    pass oracle-recomputable from the source text.
    """
    w = (len(payload) % 640) + 1
    h = (len(payload) % 480) + 1
    mx = max(w, h)
    if mx <= _RESIZE_BOX:
        nw, nh = w, h
    else:
        nw = max(1, (w * _RESIZE_BOX) // mx)
        nh = max(1, (h * _RESIZE_BOX) // mx)
    # Checksum over the prefix's lowercase-hex form so the DuckDB twin
    # can slice the same bytes exactly (see the q_mm_frames oracle note).
    k = min(len(payload), nw * nh)
    return w, h, nw, nh, hashlib.md5(payload[:k].hex().encode()).hexdigest()


@query(
    "q_mm_resize",
    oracle=f"""
WITH m AS (
  SELECT doc_id, text,
         (octet_length(encode(text)) % 640) + 1 AS width,
         (octet_length(encode(text)) % 480) + 1 AS height
  FROM documents
  WHERE text IS NOT NULL
),
r AS (
  SELECT doc_id, text, width, height,
         CASE WHEN greatest(width, height) <= {_RESIZE_BOX} THEN width
              ELSE greatest(1, (width * {_RESIZE_BOX}) // greatest(width, height))
         END AS new_width,
         CASE WHEN greatest(width, height) <= {_RESIZE_BOX} THEN height
              ELSE greatest(1, (height * {_RESIZE_BOX}) // greatest(width, height))
         END AS new_height
  FROM m
)
SELECT doc_id, width, height, new_width, new_height,
       md5(substring(lower(hex(encode(text))), 1,
           2 * least(octet_length(encode(text)), new_width * new_height)))
         AS resized_checksum
FROM r
""",
)
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize / thumbnailing pass (B60 family: decode →
    feature-extract → **resize** → frame-sample).

    Same Spark plumbing as a real thumbnailer: binary payload in,
    per-Arrow-batch ``mapInPandas`` transform, typed (old dims, new
    dims, resized-payload checksum) row out. Map-only — resize never
    shuffles at any corpus size; only the codec call is stubbed
    (:func:`resize_image_stub`).
    """
    d = load_table(spark, sf_dir, "documents")
    media = d.filter(F.col("text").isNotNull()).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    out_schema = (
        "doc_id bigint, width int, height int, "
        "new_width int, new_height int, resized_checksum string"
    )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            r = pdf["payload"].map(resize_image_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": r.map(lambda t: t[0]),
                    "height": r.map(lambda t: t[1]),
                    "new_width": r.map(lambda t: t[2]),
                    "new_height": r.map(lambda t: t[3]),
                    "resized_checksum": r.map(lambda t: t[4]),
                }
            )

    return media.mapInPandas(resize_batches, schema=out_schema)


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (north star: dedup beyond text)
# ---------------------------------------------------------------------------

_PHASH_GRID = 72          # 8×9 sample grid → 64 dHash comparisons
_PHASH_MAX_HAMMING = 10   # near-dup verdict threshold for phash_pairs


def phash_stub(payload: bytes) -> int:
    """STUB perceptual hash: dHash over a deterministic 8×9 "grayscale
    downsample" of the payload bytes.

    A real implementation decodes the image (PIL), resizes to 9×8
    grayscale, and compares horizontal neighbors; the codec is not in
    this container, so the "pixels" are 72 bytes sampled at a fixed
    stride — which preserves dHash's essential property for the
    plumbing: near-identical payloads produce near-identical
    fingerprints (small Hamming distance), unrelated payloads differ in
    ~32 bits. Bit j (= row*8+col) is set when pixel[row*9+col] >
    pixel[row*9+col+1]; signed-64 wrap matches Spark/DuckDB BIGINT.
    """
    nb = len(payload)
    step = max(1, nb // _PHASH_GRID)
    px = [payload[(k * step) % nb] for k in range(_PHASH_GRID)]
    fp = 0
    for j in range(64):
        r, c = j // 8, j % 8
        if px[r * 9 + c] > px[r * 9 + c + 1]:
            fp |= 1 << j
    return fp - (1 << 64) if fp >= 1 << 63 else fp


@query(
    "q_mm_phash",
    # DuckDB recomputes the identical fingerprint from the hex encoding
    # of the payload (hex slicing is byte-exact for any utf-8 content —
    # see the q_mm_frames oracle note); same signed wrap as the simhash
    # oracle.
    oracle=f"""
WITH m AS (
  SELECT doc_id, lower(hex(encode(text))) AS hx,
         octet_length(encode(text)) AS nb
  FROM documents
  WHERE text IS NOT NULL AND octet_length(encode(text)) >= 1
),
px AS (
  SELECT doc_id,
    list_transform(generate_series(0, {_PHASH_GRID - 1}), k ->
      ('0x' || substr(hx,
        2 * ((k * greatest(1, nb // {_PHASH_GRID})) % nb) + 1, 2))::INT
    ) AS p
  FROM m
),
fp AS (
  SELECT doc_id,
    list_sum(list_transform(generate_series(0, 63), j ->
      CASE WHEN p[(j // 8) * 9 + (j % 8) + 1] > p[(j // 8) * 9 + (j % 8) + 2]
           THEN (1::UBIGINT << j)::HUGEINT ELSE 0::HUGEINT END)) AS ufp
  FROM px
)
SELECT doc_id,
  CAST(CASE WHEN ufp >= 9223372036854775808::HUGEINT
            THEN ufp - 18446744073709551616::HUGEINT
            ELSE ufp END AS BIGINT) AS phash,
  CAST(ufp // 281474976710656 AS BIGINT) AS bucket16
FROM fp ORDER BY doc_id
""",
)
def q_mm_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash fingerprints for image dedup (north star:
    multimodal × dedup): 64-bit dHash per media payload + the same
    16-bit Hamming-prefix bucket q_dedup_simhash uses.

    The decode+hash is a ``mapInPandas`` pass (the codec is inherently
    Python — PIL would replace :func:`phash_stub` 1:1); everything
    downstream is relational: bucket assignment is a map-only
    expression, and near-dup pair generation (:func:`phash_pairs`)
    is a bucket-join + ``bit_count(xor)`` — never all-pairs. Map-only
    end to end at any corpus size; the fingerprint table is the
    persisted artifact an image-dedup pipeline stores per shard.
    """
    d = load_table(spark, sf_dir, "documents")
    media = (
        d.filter(F.col("text").isNotNull())
        .filter(F.octet_length(F.col("text")) >= 1)
        .select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    )

    def phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": pdf["payload"].map(phash_stub).astype("int64"),
                }
            )

    return (
        media.mapInPandas(phash_batches, schema="doc_id bigint, phash bigint")
        .select(
            "doc_id",
            "phash",
            F.shiftrightunsigned("phash", 48).alias("bucket16"),
        )
        .orderBy("doc_id")
    )


def phash_pairs(
    fp: DataFrame, max_hamming: int = _PHASH_MAX_HAMMING
) -> DataFrame:
    """Near-dup image pairs from a fingerprint frame: bucket-join on the
    16-bit prefix, verify with ``bit_count(a XOR b)`` ≤ ``max_hamming``.

    The same bucket-then-verify doctrine as the text dedup family — a
    bucket bounds candidates to docs agreeing on the top 16 bits, so
    pair generation is never all-pairs. (Multi-probe over rotated
    prefixes is the recall knob at scale, exactly as in
    llm/similarity.py's hyperplane LSH.)
    """
    a = fp.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("ph_a"),
        "bucket16",
    )
    b = fp.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("ph_b"),
        "bucket16",
    )
    return (
        a.join(b, "bucket16")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(
                F.col("ph_a").bitwiseXOR(F.col("ph_b"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


_AUDIO_WIN = 256   # bytes per analysis window ("samples")
_AUDIO_HOP = 128   # hop: 50% overlap, the standard STFT framing
_AUDIO_ID_BOUND = 200  # bounded demo corpus (oracle joins bytes×windows)


@query(
    "q_mm_audio",
    # Byte-exact oracle via the hex-slice discipline (q_mm_frames):
    # every payload byte is exploded once from the hex form, windows
    # are joined on the [start, start+win) range, and the energy is an
    # exact INTEGER sum of (byte-128)^2 — no float anywhere.
    oracle=f"""
WITH h AS (
  SELECT doc_id, lower(hex(encode(text))) AS hx,
         octet_length(encode(text)) AS nb
  FROM documents
  WHERE text IS NOT NULL AND doc_id < {_AUDIO_ID_BOUND}
    AND octet_length(encode(text)) >= {_AUDIO_WIN}
),
b AS (
  SELECT doc_id, unnest(generate_series(0, nb - 1)) AS pos, hx FROM h
),
bv AS (
  SELECT doc_id, pos,
         ('0x' || substr(hx, CAST(pos * 2 + 1 AS BIGINT), 2))::INTEGER AS v
  FROM b
),
w AS (
  SELECT doc_id,
         unnest(generate_series(0,
           CAST(floor((nb - {_AUDIO_WIN}) / {_AUDIO_HOP}) AS BIGINT))) AS win_idx,
         nb
  FROM h
)
SELECT w.doc_id, w.win_idx,
       CAST(sum((bv.v - 128) * (bv.v - 128)) AS BIGINT) AS energy,
       CAST(max(abs(bv.v - 128)) AS INTEGER) AS peak
FROM w JOIN bv ON bv.doc_id = w.doc_id
  AND bv.pos >= w.win_idx * {_AUDIO_HOP}
  AND bv.pos < w.win_idx * {_AUDIO_HOP} + {_AUDIO_WIN}
GROUP BY w.doc_id, w.win_idx
ORDER BY w.doc_id, w.win_idx
""",
)
def q_mm_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio energy envelope over an opaque binary column (B60 family,
    the AUDIO member beside image resize/pHash and video frames):
    overlapping analysis windows ({win} bytes, hop {hop} — the 50%-
    overlap STFT framing every librosa/VAD pipeline uses), per-window
    energy Σ(sample−128)² and peak amplitude — the voice-activity /
    silence-trim primitive that decides which audio segments are worth
    transcribing.

    STUB codec: the "waveform" is the payload's bytes as unsigned
    8-bit samples centered at 128 (soundfile/librosa decode slots in
    1:1); the windowing, the 1→N overlapping expansion inside
    ``mapInPandas`` (per-payload decoder state, same reason as
    q_mm_frames), and the Arrow batch shape are the real thing. Energy
    and peak are exact integers, so the hex-slice oracle hash-matches
    with no tolerance.
    """
    d = load_table(spark, sf_dir, "documents")
    media = d.filter(
        F.col("text").isNotNull() & (F.col("doc_id") < _AUDIO_ID_BOUND)
    ).select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def energy_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, es, ps = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                nb = len(payload)
                if nb < _AUDIO_WIN:
                    continue
                n_win = (nb - _AUDIO_WIN) // _AUDIO_HOP + 1
                for widx in range(n_win):
                    seg = payload[
                        widx * _AUDIO_HOP : widx * _AUDIO_HOP + _AUDIO_WIN
                    ]
                    centered = [bv - 128 for bv in seg]
                    ids.append(doc_id)
                    idxs.append(widx)
                    es.append(sum(v * v for v in centered))
                    ps.append(max(abs(v) for v in centered))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(idxs, dtype="int64"),
                    "energy": pd.Series(es, dtype="int64"),
                    "peak": pd.Series(ps, dtype="int32"),
                }
            )

    return media.mapInPandas(
        energy_batches,
        schema="doc_id bigint, win_idx bigint, energy bigint, peak int",
    ).orderBy("doc_id", "win_idx")


q_mm_audio.__doc__ = q_mm_audio.__doc__.format(
    win=_AUDIO_WIN, hop=_AUDIO_HOP
)


# Planted-corruption modulus for the integrity audit: every 41st media
# object ships with a truncated payload (a failed multipart upload /
# bit-rot stand-in, same fixture device as filtering.py's _BENCH_MOD).
_CORRUPT_MOD = 41


@query(
    "q_mm_integrity",
    # The manifest checksum is md5 of the TRUE content, the observed
    # checksum md5 of the (possibly corrupted) stored content — both
    # engines hash identical bytes (planted corruption appends one
    # ASCII byte); counts exact, one division per source row.
    oracle=f"""
WITH m AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % {_CORRUPT_MOD} = 0
              THEN text || '~' ELSE text END AS stored_text,
         octet_length(encode(text)) AS declared_bytes,
         md5(text) AS manifest_md5
  FROM documents WHERE text IS NOT NULL
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_objects,
       CAST(count(*) FILTER (octet_length(encode(stored_text))
                             <> declared_bytes) AS BIGINT)
         AS n_size_mismatch,
       CAST(count(*) FILTER (md5(stored_text) <> manifest_md5) AS BIGINT)
         AS n_checksum_mismatch,
       round(count(*) FILTER (md5(stored_text) <> manifest_md5) * 1.0
             / count(*), 6) AS corrupt_share
FROM m GROUP BY source ORDER BY source
""",
)
def q_mm_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload integrity audit: recompute each media object's
    checksum and size against its ingest manifest (declared byte count
    + md5 recorded at upload time) and report per-source corruption —
    the fixity check every multimodal lake runs on a schedule (failed
    multipart uploads, truncation in transit, bit rot), here with a
    deterministic planted-corruption fixture (every 41st object ships
    one byte short) so both engines must flag the IDENTICAL objects.
    Size mismatch is the cheap first-pass filter; checksum mismatch is
    the authoritative verdict (and catches same-length corruption
    size can't).

    Scale shape: row-local digest + length recomputation over the
    payload scan (binary never shuffles — only per-source counters
    do), one map-combinable aggregate to |sources| rows. At 100 TB
    this is the scan-bound fixity sweep scheduled off-peak; the plan
    is the same shape at any payload size.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    stored_text = F.when(
        F.col("doc_id") % _CORRUPT_MOD == 0, F.concat("text", F.lit("~"))
    ).otherwise(F.col("text"))
    m = d.select(
        "source",
        F.encode(stored_text, "UTF-8").alias("payload"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).alias(
            "declared_bytes"
        ),
        F.md5("text").alias("manifest_md5"),
    )
    size_bad = F.octet_length("payload") != F.col("declared_bytes")
    sum_bad = F.md5("payload") != F.col("manifest_md5")
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_objects"),
            F.sum(F.when(size_bad, 1).otherwise(0))
            .cast("long")
            .alias("n_size_mismatch"),
            F.sum(F.when(sum_bad, 1).otherwise(0))
            .cast("long")
            .alias("n_checksum_mismatch"),
            F.round(
                F.sum(F.when(sum_bad, 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("corrupt_share"),
        )
        .orderBy("source")
    )
