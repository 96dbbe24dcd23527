"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are modeled as `binary` columns beside a metadata
struct (modality, byte size, checksum, fake-decoded dimensions). The
codec itself is stubbed (PIL/librosa/ffmpeg are absent from this
container) as a DETERMINISTIC FAKE — md5-derived dimensions the DuckDB
oracle reproduces. Because the fake is Column-expressible, the default
`decode_media` runs natively in codegen; `decode_media_udf` is the
Arrow-batched mapInPandas twin that a real byte-level codec plugs into
(gated by SPARK_GRAFT_REAL_CODEC, not by import probing), and the two
are tested to produce identical frames.

Design for 100 TB:
- Payload bytes never shuffle: decode is mapInPandas on the scan,
  metadata-only projections drop the binary column before any join/agg
  (column pruning removes it from the parquet read entirely).
- Frame sampling explodes only the sampled indices, not frames.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_project_spark.llm.hashing import v32, v32_py

#: Set SPARK_GRAFT_REAL_CODEC=1 to route decode through a real media
#: codec (PIL/av/librosa) inside `decode_media_udf`. Off by default: the
#: sandbox has no codec libraries, and probing for them implicitly made
#: an unrelated `pip install pillow` a runtime break (round-1 advice).
REAL_CODEC_ENV = "SPARK_GRAFT_REAL_CODEC"

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture: derive a binary payload + metadata struct from documents.

    Stands in for real image/audio bytes (UTF-8 of the text — the
    engine treats it as opaque). modality cycles deterministically so
    per-modality code paths get exercised.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    # pmod, not %: Spark's % keeps the dividend's sign, so a negative
    # doc_id would hit element_at index 0 (a runtime error)
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        "source",
        payload.alias("payload"),
        F.struct(
            modality.alias("modality"),
            F.octet_length(payload).alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — binary column pruned from the scan."""
    return (
        media.select(
            "source",
            F.col("meta.modality").alias("modality"),
            F.col("meta.n_bytes").alias("n_bytes"),
        )
        .groupBy("source", "modality")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("n_bytes").alias("min_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
    )


def _fake_dims(doc_id: int, modality: str) -> tuple[int, int, int]:
    """Deterministic fake decode: md5-derived dimensions.

    Mirrored EXACTLY by the oracle SQL (v32 of the same strings), so the
    stub is still correctness-checked end-to-end.
    """
    w = 16 + v32_py(f"w:{doc_id}") % 1024
    h = 16 + v32_py(f"h:{doc_id}") % 1024
    n = 1 if modality == "image" else 1 + v32_py(f"f:{doc_id}") % 240
    return w, h, n


def _decode_payload(doc_id: int, modality: str, payload: bytes):
    """Per-payload codec hook for `decode_media_udf`.

    Routed by the SPARK_GRAFT_REAL_CODEC env flag (NOT by probing for
    PIL: an importable-but-unwired library must not change behavior).
    Flag off -> deterministic fake dims; flag on -> the real decoder,
    which is intentionally unwired in this container.
    """
    if os.environ.get(REAL_CODEC_ENV) == "1":  # pragma: no cover
        raise NotImplementedError(
            f"{REAL_CODEC_ENV}=1 but no real codec is wired; plug "
            "PIL/av/librosa decode in here"
        )
    w, h, n = _fake_dims(doc_id, modality)
    # NULL payload -> NULL checksum, mirroring the native path's
    # md5(NULL); dims derive from doc_id and stay valid either way
    ck = None if payload is None else hashlib.md5(payload).hexdigest()
    return w, h, n, ck


def decode_media(media: DataFrame) -> DataFrame:
    """Decode metadata natively: (payload, meta) -> typed dimensions.

    The stub decode is md5-derived dimensions + the payload checksum —
    all Column-expressible, so the default path stays inside
    WholeStageCodegen (round 1 ran it as a per-row Python loop: 67x
    slower than the oracle for zero semantic gain). `decode_media_udf`
    is the byte-level Arrow-batched path a real codec plugs into; both
    produce identical frames, asserted by tests.
    """
    sid = F.col("doc_id").cast("string")
    dim = lambda tag: (  # noqa: E731
        F.lit(16) + v32(F.concat(F.lit(f"{tag}:"), sid)) % 1024
    ).cast("int")
    modality = F.col("meta.modality")
    n_frames = (
        F.when(modality == "image", F.lit(1))
        .otherwise(F.lit(1) + v32(F.concat(F.lit("f:"), sid)) % 240)
        .cast("int")
    )
    return media.select(
        "doc_id",
        modality.alias("modality"),
        dim("w").alias("width"),
        dim("h").alias("height"),
        n_frames.alias("n_frames"),
        F.col("meta.checksum").alias("checksum"),
    )


def decode_media_udf(media: DataFrame) -> DataFrame:
    """Arrow-batched byte-level decode: the real-codec plug point.

    mapInPandas so each executor decodes its partition's payloads in
    batches; output drops the binary column immediately. With the stub
    codec this is strictly slower than `decode_media` (same output);
    with SPARK_GRAFT_REAL_CODEC=1 it is the only path that sees the
    payload bytes.
    """

    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, meta, payload in zip(
                pdf["doc_id"], pdf["meta"], pdf["payload"]
            ):
                modality = meta["modality"]
                pay = None if payload is None else bytes(payload)
                w, h, n, ck = _decode_payload(int(doc_id), modality, pay)
                rows.append((int(doc_id), modality, w, h, n, ck))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    # prune BEFORE the Arrow boundary: decode reads only (doc_id,
    # meta, payload) — shipping the rest of the frame (source, text)
    # through Arrow serialization would tax the hottest byte-level
    # stage for nothing (cdc_chunk_hashes applies the same rule)
    return media.select("doc_id", "meta", "payload").mapInPandas(
        decode, DECODED_SCHEMA
    )


def frame_sample(decoded: DataFrame, every: int = 30) -> DataFrame:
    """Sample every `every`-th frame index per video (explode indices).

    Only the sampled indices materialize — the explode is O(frames/every)
    rows, not O(frames).
    """
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")
    return (
        decoded.filter(F.col("modality") == "video")
        .select(
            "doc_id",
            "n_frames",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
            ).alias("frame_idx"),
        )
    )


def resize_plan(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Compute target dimensions preserving aspect ratio (the metadata
    half of a resize stage; the pixel op would live in decode_media).
    Integer arithmetic only — oracle-exact.
    """
    scale_num = F.lit(max_side)
    long_side = F.greatest(F.col("width"), F.col("height"))
    needs = long_side > max_side
    tw = F.when(
        needs, (F.col("width") * scale_num).cast("long") / long_side
    ).otherwise(F.col("width").cast("double"))
    th = F.when(
        needs, (F.col("height") * scale_num).cast("long") / long_side
    ).otherwise(F.col("height").cast("double"))
    return decoded.select(
        "doc_id",
        "modality",
        "width",
        "height",
        F.floor(tw).cast("int").alias("target_width"),
        F.floor(th).cast("int").alias("target_height"),
    )


def payload_simhash(
    media: DataFrame,
    chunk: int = 64,
    stride: int = 32,
    bits: int = 32,
) -> DataFrame:
    """(doc_id, simhash) over BYTE chunks of the opaque binary payload
    — content near-dup for media blobs with NO codec in the loop: blobs
    differing by small byte edits (re-muxed metadata, trailing tags)
    land within a few Hamming bits; pair them with
    `dedup.simhash_near_dups`, exactly as for text. Byte-identical
    blobs are the exact case and already collide on `meta.checksum`.

    Positional fixed-stride chunking (positions 1, 1+stride, ...; each
    chunk `chunk` bytes, the tail chunk truncated). Fixed offsets keep
    the oracle bit-exact but make the signature sensitive to byte
    INSERTIONS (everything downstream shifts); at production scale use
    content-defined chunking (rolling-hash boundaries, as in LBFS/
    backup dedup) for insertion-robust chunks — the aggregate and
    banding downstream are unchanged.

    Plan: positions exploded per blob (a Generate — no shuffle; the
    payload bytes never leave the scan task), md5 per chunk -> 32-bit
    ints, then the same codegen'd bit-majority aggregate as
    `doc_simhash` — the only exchange carries |blobs| x bits longs.
    Zero-byte payloads report simhash = 0, mirroring zero-token docs.
    """
    if chunk < 1 or stride < 1:
        raise ValueError("chunk and stride must be >= 1")
    from flink_project_spark.llm.dedup import simhash_from_hashes
    from flink_project_spark.llm.hashing import v32_from_hex

    p = F.col("payload")
    npos = F.greatest(
        F.octet_length(p) - (chunk - 1), F.lit(1)
    )
    ch = (
        media.filter(F.octet_length(p) > 0)
        .select(
            "doc_id",
            p.alias("_p"),
            F.explode(
                F.sequence(F.lit(1), npos, F.lit(stride))
            ).alias("_pos"),
        )
        .select(
            "doc_id",
            v32_from_hex(
                F.md5(F.col("_p").substr(F.col("_pos"), F.lit(chunk)))
            ).alias("h"),
        )
    )
    return simhash_from_hashes(media, ch, bits)


def payload_near_dups(
    media: DataFrame | None = None,
    chunk: int = 64,
    stride: int = 32,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    sim: DataFrame | None = None,
    expected_docs: int | None = None,
) -> DataFrame:
    """Blob near-dup pairs: `payload_simhash` + the pigeonhole banded
    self-join of `dedup.simhash_near_dups` (never blob x blob).

    ``sim`` accepts a PRECOMPUTED (doc_id, simhash) table (persisted or
    landed) — the self-join consumes the signature frame on both sides,
    so without it the chunk+md5+bit-majority subtree evaluates twice;
    a pipeline computes signatures once and reuses them here, exactly
    as the text path does with its shared simhash table."""
    from flink_project_spark.llm.dedup import simhash_near_dups

    if (media is None) == (sim is None):
        raise ValueError("pass exactly one of media / sim")
    if sim is None:
        sim = payload_simhash(media, chunk, stride, bits)
    return simhash_near_dups(
        sim, bits, bands, max_hamming, expected_docs=expected_docs
    )


#: CDC rolling-hash parameters: polynomial base, window width, and the
#: boundary mask (2^k - 1 => expected chunk ~2^k bytes between clamps).
CDC_BASE = 1000003
CDC_WINDOW = 16
CDC_MASK_BITS = 9  # ~512-byte average chunks
CDC_MIN_CHUNK = 128
CDC_MAX_CHUNK = 2048


def cdc_chunk_hashes(
    media: DataFrame,
    mask_bits: int = CDC_MASK_BITS,
    min_chunk: int = CDC_MIN_CHUNK,
    max_chunk: int = CDC_MAX_CHUNK,
) -> DataFrame:
    """Content-defined chunking of the binary payload (LBFS/backup-dedup
    style): boundaries where a w-byte polynomial rolling hash hits
    `hash & (2^mask_bits - 1) == 0`, clamped to [min_chunk, max_chunk].
    Output: (doc_id, chunk_idx, chunk_len, chunk_md5).

    WHY over `payload_simhash`'s fixed-stride chunks: boundaries derive
    from CONTENT, so inserting/deleting bytes resynchronizes within one
    window — all chunks outside the edit region keep their hashes (the
    property that makes chunk-level dedup of mutated blobs work).
    Downstream is ordinary relational work: exact chunk dedup is a
    groupBy on chunk_md5; blob near-dup is chunk-set overlap via the
    same exploded equi-join as text near-dup.

    Implementation: a genuinely per-byte sequential computation that no
    built-in Column expression expresses — so it runs as Arrow-batched
    `mapInPandas` with the rolling hash VECTORIZED in numpy per blob
    (np.convolve over the byte array; only the boundary clamp walks the
    — typically few hundred — candidate boundaries in Python). Payload
    bytes never shuffle: chunking happens on the scan task and only the
    fixed-width chunk rows leave it.
    """
    if not (0 < min_chunk <= max_chunk):
        raise ValueError("need 0 < min_chunk <= max_chunk")
    mask = (1 << mask_bits) - 1
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("chunk_len", T.IntegerType()),
            T.StructField("chunk_md5", T.StringType()),
        ]
    )

    def chunk(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # np.convolve REVERSES the kernel, so with this descending
        # p^(w-1)..p^0 array the effective window hash at position k is
        # sum_j b[k+j] * p^j (ASCENDING powers, mod 2^64 — exact and
        # identical everywhere). Any cross-engine twin must use that
        # formula, not the array's literal order.
        kernel = np.array(
            [pow(CDC_BASE, CDC_WINDOW - 1 - j, 1 << 64) for j in range(CDC_WINDOW)],
            dtype=np.uint64,
        )
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload or b""), dtype=np.uint8)
                n = len(b)
                if n == 0:
                    continue
                if n >= CDC_WINDOW:
                    with np.errstate(over="ignore"):
                        h = np.convolve(
                            b.astype(np.uint64), kernel, mode="valid"
                        )
                    # candidate boundary AFTER byte i+w-1 where the
                    # window hash masks to zero
                    cands = (np.nonzero((h & np.uint64(mask)) == 0)[0]
                             + CDC_WINDOW)
                else:
                    cands = np.empty(0, dtype=np.int64)
                # clamp walk: emit boundaries respecting min/max chunk
                bounds = []
                start = 0
                ci = 0
                for c in cands:
                    if c - start < min_chunk:
                        continue
                    while c - start > max_chunk:
                        bounds.append((start, start + max_chunk))
                        start += max_chunk
                    # a forced max split may leave < min_chunk to the
                    # content boundary — skip the candidate rather than
                    # emit a sub-min mid-stream chunk (only the final
                    # tail may be shorter than min_chunk)
                    if c - start < min_chunk:
                        continue
                    bounds.append((start, int(c)))
                    start = int(c)
                while n - start > max_chunk:
                    bounds.append((start, start + max_chunk))
                    start += max_chunk
                if n - start > 0:
                    bounds.append((start, n))
                for ci, (s, e) in enumerate(bounds):
                    rows.append(
                        (
                            doc_id,
                            ci,
                            e - s,
                            hashlib.md5(b[s:e].tobytes()).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_idx", "chunk_len", "chunk_md5"]
            )

    return media.select("doc_id", "payload").mapInPandas(chunk, schema)


def blob_chunk_overlap(
    chunks: DataFrame, min_shared: int = 2
) -> DataFrame:
    """Blob pairs sharing >= min_shared CDC chunk hashes — the
    chunk-level dedup join over `cdc_chunk_hashes` output: robust to
    byte insertions (unlike `payload_near_dups`' fixed-stride
    signature) because shared content resynchronizes to identical
    chunks. Same narrow exploded equi-join plan as the text near-dup
    verify stage: rows in flight are (doc_a, doc_b, md5) fixed-width
    triples, never payloads; a corpus-hot chunk (e.g. a common header)
    fans out as hot keys — dedup the (doc_id, chunk_md5) pairs first
    (done here) and cap/salt on the chunk key if a profile
    (`operators.profiling.key_skew_profile`) shows pathological reuse.
    """
    c = chunks.select("doc_id", "chunk_md5").distinct()
    a = c.select(F.col("doc_id").alias("doc_a"), "chunk_md5")
    b = c.select(F.col("doc_id").alias("doc_b"), "chunk_md5")
    return (
        a.join(b, "chunk_md5")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
        .filter(F.col("shared_chunks") >= min_shared)
    )
