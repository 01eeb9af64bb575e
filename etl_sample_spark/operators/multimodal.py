"""Multimodal columns (driver north_star; SURVEY §2.12 L5).

Images / audio / video are opaque ``binary`` columns plus a typed
metadata struct. The Spark-side plumbing — schemas, Arrow-batched Pandas
UDF signatures via ``mapInPandas``, partition-size control — is real and
tested; the codec step itself is STUBBED (this container ships no
image/audio libraries): ``decode_image(..., fake=False)`` raises
``NotImplementedError``, and ``fake=True`` produces a deterministic fake
decode so batch shapes and schemas are exercised end-to-end.

Scale notes: media bytes dominate row width, so operators here
(1) never shuffle the binary column, (2) use ``mapInPandas`` (streaming
Arrow batches, bounded memory) rather than ``collect``-style UDFs, and
(3) keep metadata in a separate narrow struct so pruning can drop the
payload when only metadata is queried.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_FIELDS = "width INT, height INT, format STRING, n_frames INT"

DECODED_SCHEMA = "doc_id BIGINT, width INT, height INT, n_pixels INT, pixel_mean DOUBLE"

FEATURE_DIM = 8


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministically synthesize a media column on the documents table:
    payload = md5 bytes of the text (16 bytes, stand-in for encoded image
    data), metadata derived arithmetically from ``n_chars``.

    This is the ingest-shape for real media: ``binary`` payload + typed
    metadata struct, exactly what ``spark.read.format("binaryFile")``
    would produce plus a decoder-probe pass.
    """
    return docs.select(
        id_col,
        F.unhex(F.md5(F.col(text_col))).alias("media_bytes"),
        F.struct(
            (32 + F.col("n_chars") % 224).cast("int").alias("width"),
            (32 + (F.col("n_chars") * 7) % 224).cast("int").alias("height"),
            F.when(F.col(id_col) % 2 == 0, "png").otherwise("jpeg").alias("format"),
            (1 + F.col(id_col) % 16).cast("int").alias("n_frames"),
        ).alias("media_meta"),
    )


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode the binary payload into per-image stats via ``mapInPandas``.

    Arrow streams partition data in bounded batches; the UDF sees pandas
    DataFrames with columns (doc_id, media_bytes, media_meta) and yields
    the decoded schema. With ``fake=False`` this raises
    ``NotImplementedError`` at execution time (no codec libs in this
    environment); ``fake=True`` computes deterministic stats from the raw
    bytes so the full distributed path is testable.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs unavailable in this environment; pass fake=True "
                    "to exercise the plumbing with a deterministic fake decoder"
                )
            meta = pdf["media_meta"]
            widths = meta.apply(lambda m: m["width"]).astype("int32")
            heights = meta.apply(lambda m: m["height"]).astype("int32")
            payload = pdf["media_bytes"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": widths,
                    "height": heights,
                    "n_pixels": (widths * heights).astype("int32"),
                    "pixel_mean": payload.apply(lambda b: sum(b) / len(b) if len(b) else 0.0),
                }
            )

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Feature-extraction stub: binary payload → fixed-dim embedding.

    Same contract as a real CLIP/ResNet batch featurizer: mapInPandas,
    one output row per input row, ``array<double>`` feature column.
    """
    schema = f"doc_id BIGINT, features ARRAY<DOUBLE>"

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "feature extractor unavailable; pass fake=True for the deterministic stub"
                )
            feats = pdf["media_bytes"].apply(
                lambda b: [float(b[i % len(b)]) / 255.0 for i in range(FEATURE_DIM)]
                if len(b)
                else [0.0] * FEATURE_DIM
            )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return media.mapInPandas(featurize, schema=schema)


def sample_frames(media: DataFrame, every_nth: int = 4, fake: bool = False) -> DataFrame:
    """Frame-sampling stub for video payloads: one output row per sampled
    frame (row-expanding mapInPandas, the UDTF shape)."""
    schema = "doc_id BIGINT, frame_idx INT, frame_bytes BINARY"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video codecs unavailable; pass fake=True for the deterministic stub"
                )
            rows = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for _, r in pdf.iterrows():
                n_frames = int(r["media_meta"]["n_frames"])
                for fi in range(0, n_frames, every_nth):
                    rows["doc_id"].append(r["doc_id"])
                    rows["frame_idx"].append(fi)
                    rows["frame_bytes"].append(bytes(r["media_bytes"]))
            yield pd.DataFrame(rows)

    return media.mapInPandas(sample, schema=schema)
