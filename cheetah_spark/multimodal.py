"""Multimodal (image/audio/video) column support.

Media is carried as an opaque ``BINARY`` payload column plus typed
metadata — the same envelope stance as the reference's ``Message[[]byte]``
(reference types.go:15-18: "can be any serializable type so long as the
sources and destinations know how to serialize it"); decode happens at
the edge, exactly like the reference's deserializer-defines-schema
model (types.go:152-195).

Two layers:

- **Plumbing (real, tested, oracle-checked)**: payload synthesis, magic-
  byte type sniffing, size/hash metadata — all JVM-side expressions;
  plus the Arrow-batched ``mapInPandas`` decode pipeline with a stable
  feature schema, partition-size-agnostic batching, and binary columns
  crossing the Arrow boundary.
- **Decoders (STUBBED)**: this container has no image/audio libraries,
  so ``decode_features(real_decode=True)`` raises ``NotImplementedError``
  after the import-try; the default deterministic fake derives features
  from the payload bytes so tests/oracles are reproducible anywhere.

Scale notes: payloads at 100 TB dominate row size — the module never
shuffles payload bytes (metadata extraction projects them away before
any wide operation), and decode is mapInPandas (no shuffle, Arrow
batches, bounded memory per batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Magic headers (real file signatures) keyed by synthetic media type.
MAGIC = {
    "png": "89504e47",
    "jpeg": "ffd8ffe0",
    "wav": "52494646",  # RIFF
    "mp4": "66747970",  # ftyp box tag
}
_TYPES = tuple(MAGIC)  # deterministic order: png, jpeg, wav, mp4

DECODE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "width int, height int, n_frames int, sample_rate int"
)


def fake_payload(text: Column, doc_id: Column) -> Column:
    """Deterministic binary payload: 4 magic bytes (by doc_id % 4) +
    utf-8 of the text — stands in for real media bytes."""
    magic_hex = None
    for i, t in enumerate(_TYPES):
        cond = (doc_id % len(_TYPES)) == i
        magic_hex = (
            F.when(cond, MAGIC[t]) if magic_hex is None else magic_hex.when(cond, MAGIC[t])
        )
    return F.concat(F.unhex(magic_hex), F.encode(text, "utf-8"))


def sniff_media_type(payload: Column) -> Column:
    """Magic-byte sniffing on the first 4 payload bytes (JVM-side)."""
    head = F.lower(F.hex(F.substring(payload, 1, 4)))
    expr = None
    for t, magic in MAGIC.items():
        expr = F.when(head == magic, t) if expr is None else expr.when(head == magic, t)
    return expr.otherwise("unknown")


def media_table(docs: DataFrame) -> DataFrame:
    """documents → media envelope: (doc_id, payload BINARY, media_type,
    n_bytes, content_hash). All expressions; no Python per row."""
    payload = fake_payload(F.col("text"), F.col("doc_id"))
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        sniff_media_type(payload).alias("media_type"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.md5(F.lower(F.hex(payload))).alias("content_hash"),
    )




def decode_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (doc_id, payload, …).

    ``real_decode=True`` is the integration point for PIL/ffmpeg-style
    decoders — STUBBED here (no media libraries in this environment):
    it import-probes and raises ``NotImplementedError``. The default
    path emits deterministic fake features so the Spark-side plumbing
    (schema, batching, binary transfer) is fully exercised and tested.
    """
    if real_decode:
        try:
            import PIL.Image  # noqa: F401 — not installed in this container
        except ImportError as e:
            raise NotImplementedError(
                "STUB: real media decode needs image/audio libraries "
                "(PIL/ffmpeg) which are not available in this environment; "
                "wire them here. The default fake-decode path exercises "
                "the full Spark plumbing."
            ) from e

    # NOTE: everything the closure touches is local/stdlib so cloudpickle
    # ships it BY VALUE — executors must not need cheetah_spark installed
    # (the verification driver runs workers without this repo on their
    # import path).
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_features(doc_id: int, media_type: str, n_bytes: int) -> tuple[int, int, int, int]:
            w = 64 + (doc_id * 31) % 1024
            h = 64 + (doc_id * 17) % 768
            if media_type in ("png", "jpeg"):
                return int(w), int(h), 1, 0
            if media_type == "wav":
                return 0, 0, 0, 8000 + (n_bytes % 8) * 4000
            if media_type == "mp4":
                return int(w), int(h), 1 + n_bytes % 240, 0
            return 0, 0, 0, 0

        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [
                fake_features(i, t, n)
                for i, t, n in zip(pdf["doc_id"], pdf["media_type"], pdf["n_bytes"])
            ]
            out = pd.DataFrame(feats, columns=["width", "height", "n_frames", "sample_rate"])
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            out.insert(1, "media_type", pdf["media_type"].to_numpy())
            out.insert(2, "n_bytes", pdf["n_bytes"].to_numpy())
            yield out

    return media.select("doc_id", "media_type", "n_bytes", "payload").mapInPandas(
        decode, schema=DECODE_SCHEMA
    )
