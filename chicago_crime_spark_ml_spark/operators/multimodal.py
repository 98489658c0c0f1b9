"""Multimodal column plumbing — image/audio/video as opaque binary
columns with typed metadata (north star; no binary data in the reference
or the testdata, so blobs are derived from text bytes in the demo
queries).

Design for 100 TB of media:
- blobs live in a ``binary`` column (or object-store URIs for >row-size
  media) beside a typed metadata struct — schema'd, partitionable,
  prunable like any other column;
- decode/feature-extraction runs as Arrow-batched ``mapInPandas``
  (one Python worker per partition, vectorized batches — never
  row-at-a-time UDFs);
- the actual codec step is STUBBED here (no image/audio libs in this
  container): ``decode_stub=True`` produces deterministic fake features
  from the bytes, ``decode_stub=False`` raises NotImplementedError where
  a real pillow/ffmpeg call would go. The Spark-side plumbing — schema,
  batch shape, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 4

FEATURES_SCHEMA = (
    "doc_id BIGINT, n_bytes INT, features ARRAY<DOUBLE>"
)


def attach_blob(
    df: DataFrame, text_col: str = "text", blob_col: str = "blob"
) -> DataFrame:
    """Binary column + typed metadata struct (n_bytes, sha256, mime) —
    the storage shape for multimodal corpora. UTF-8 bytes of the text
    stand in for real media bytes in this environment."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn(blob_col, blob).withColumn(
        "blob_meta",
        F.struct(
            F.length(F.col(blob_col)).alias("n_bytes"),
            F.sha2(F.col(blob_col), 256).alias("sha256"),
            F.lit("text/plain").alias("mime"),
        ),
    )


def extract_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    decode_stub: bool = True,
) -> DataFrame:
    """Batch feature extraction over binary blobs via mapInPandas.

    Arrow delivers each partition as pandas batches; the closure sees
    only (id, blob) columns — project BEFORE the Python boundary so only
    the bytes actually needed cross it (column pruning stops at
    mapInPandas; do it by hand).

    The decode itself is a stub: deterministic features from byte stats
    (mean/spread/len — reproducible across runs) where a real pipeline
    would call PIL/torchvision/ffmpeg per batch.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires image/audio libs not in "
                    "this container; run with decode_stub=True"
                )
            ids = []
            feats = []
            nbytes = []
            # NULL blobs are SKIPPED (no sentinel row): the operators are
            # general plumbing and bytes(None) would TypeError inside the
            # Python worker, killing the whole query for one bad row.
            for did, buf in zip(pdf[id_col], pdf[blob_col]):
                if buf is None:
                    continue
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                n = int(arr.size)
                ids.append(did)
                nbytes.append(n)
                feats.append(
                    [
                        float(arr.mean()) / 255.0 if n else 0.0,
                        float(arr.std()) / 255.0 if n else 0.0,
                        float(arr.min()) / 255.0 if n else 0.0,
                        float(n % 997) / 997.0,
                    ]
                )
            if ids:  # an all-NULL batch yields nothing (empty ndarray
                # columns defeat Arrow's list<double> inference)
                yield pd.DataFrame(
                    {"doc_id": ids, "n_bytes": nbytes, "features": feats}
                )

    narrow = df.select(F.col(id_col), F.col(blob_col))
    return narrow.mapInPandas(batches, schema=FEATURES_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id BIGINT, width INT, height INT, n_out_bytes INT, mean_byte DOUBLE"
)

FRAMES_SCHEMA = "doc_id BIGINT, frame_idx INT, frame_features ARRAY<DOUBLE>"


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    decode_stub: bool = True,
) -> DataFrame:
    """Batch image resize over binary blobs (mapInPandas). The codec is
    stubbed (no PIL in this container): deterministic byte-stride
    downsample to width×height bytes stands in for decode→resize→encode.
    The Spark side is the real contract: project only (id, blob) across
    the Arrow boundary, one Python worker per partition, output schema
    fixed so downstream pruning works."""

    def batches(it):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        target = width * height
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real resize requires image libs not in this container"
                )
            ids, out, means = [], [], []
            for did, buf in zip(pdf[id_col], pdf[blob_col]):
                if buf is None:  # NULL blob: skip, don't TypeError
                    continue
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                ids.append(did)
                if arr.size == 0:
                    out.append(0)
                    means.append(0.0)
                    continue
                idx = np.linspace(0, arr.size - 1, num=target).astype(np.int64)
                resized = arr[idx]
                out.append(int(resized.size))
                means.append(float(resized.mean()) / 255.0)
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": ids,
                        "width": width,
                        "height": height,
                        "n_out_bytes": out,
                        "mean_byte": means,
                    }
                )

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        batches, schema=RESIZE_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    n_frames: int,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    decode_stub: bool = True,
) -> DataFrame:
    """Video frame sampling (mapInPandas, 1→N row explosion): each blob
    ("video") yields ``n_frames`` evenly-spaced frame rows with per-frame
    features. Variable output cardinality is the point — mapInPandas
    yields as many rows as the batch produces, unlike a scalar UDF. The
    decode is stubbed: equal byte-chunks stand in for ffmpeg frame
    extraction; per-frame features are deterministic chunk stats."""

    def batches(it):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg, not in this container"
                )
            ids, idxs, feats = [], [], []
            for doc_id, buf in zip(pdf[id_col], pdf[blob_col]):
                if buf is None:  # NULL blob: skip, don't TypeError
                    continue
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                chunks = np.array_split(arr, n_frames) if arr.size else []
                for i, ch in enumerate(chunks):
                    ids.append(doc_id)
                    idxs.append(i)
                    feats.append(
                        [
                            float(ch.mean()) / 255.0 if ch.size else 0.0,
                            float(ch.std()) / 255.0 if ch.size else 0.0,
                            float(ch.size),
                        ]
                    )
            if ids:
                yield pd.DataFrame(
                    {"doc_id": ids, "frame_idx": idxs, "frame_features": feats}
                )

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        batches, schema=FRAMES_SCHEMA
    )


AUDIO_SCHEMA = (
    "doc_id BIGINT, window_idx INT, rms DOUBLE, peak DOUBLE, n_samples INT"
)


def audio_window_envelope(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    window_samples: int = 256,
    decode_stub: bool = True,
) -> DataFrame:
    """Windowed audio envelope (RMS + peak per fixed-size sample window)
    over binary audio blobs — the waveform-summarization step an audio
    training pipeline runs before filtering/captioning. mapInPandas,
    Arrow-batched; the PCM decode is STUBBED (no audio libs in this
    container): bytes are interpreted as uint8 "samples" deterministically,
    where a real pipeline would call soundfile/ffmpeg per batch. Fan-out
    (one row per window) happens inside the Python stage — no shuffle;
    the schema, batching, and windowing arithmetic are the real thing.
    """

    def batches(it):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real PCM decode requires audio libs not in this "
                    "container; run with decode_stub=True"
                )
            out = {k: [] for k in ("doc_id", "window_idx", "rms", "peak", "n_samples")}
            for did, buf in zip(pdf[id_col], pdf[blob_col]):
                if buf is None:  # NULL blob: skip, don't TypeError
                    continue
                arr = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.float64)
                arr = (arr - 128.0) / 128.0  # center like signed PCM
                for w in range(max(1, -(-arr.size // window_samples))):
                    seg = arr[w * window_samples:(w + 1) * window_samples]
                    n = int(seg.size)
                    out["doc_id"].append(int(did))
                    out["window_idx"].append(w)
                    out["rms"].append(
                        float(np.sqrt((seg ** 2).mean())) if n else 0.0
                    )
                    out["peak"].append(float(np.abs(seg).max()) if n else 0.0)
                    out["n_samples"].append(n)
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        batches, schema=AUDIO_SCHEMA
    )


def extract_features_arrow(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
) -> DataFrame:
    """mapInArrow twin of :func:`extract_features`: operates on pyarrow
    RecordBatches directly — no pandas materialization, no index/dtype
    conversion overhead on the Python side of the Arrow boundary. Same
    deterministic byte-stat features; equality with the pandas path is
    asserted in tests. Prefer this form when the per-batch work is
    numpy-expressible and batches are large (the conversion overhead is
    what you save)."""

    def batches(it):
        import numpy as np  # noqa: PLC0415
        import pyarrow as pa  # noqa: PLC0415

        for batch in it:
            ids = batch.column(batch.schema.get_field_index(id_col))
            blobs = batch.column(batch.schema.get_field_index(blob_col))
            feats, nbytes = [], []
            for buf in blobs:
                arr = np.frombuffer(buf.as_py(), dtype=np.uint8)
                n = int(arr.size)
                nbytes.append(n)
                feats.append(
                    [
                        float(arr.mean()) / 255.0 if n else 0.0,
                        float(arr.std()) / 255.0 if n else 0.0,
                        float(arr.min()) / 255.0 if n else 0.0,
                        float(n % 997) / 997.0,
                    ]
                )
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    # must match FEATURES_SCHEMA exactly: n_bytes is INT
                    # (arrow int32) — mapInArrow does no implicit casting,
                    # unlike the pandas path
                    pa.array(nbytes, type=pa.int32()),
                    pa.array(feats, type=pa.list_(pa.float64())),
                ],
                names=["doc_id", "n_bytes", "features"],
            )

    narrow = df.select(F.col(id_col), F.col(blob_col))
    return narrow.mapInArrow(batches, schema=FEATURES_SCHEMA)
