"""Multimodal column plumbing (BASELINE.json north star).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (schemas.MEDIA_ASSET). The Spark-side plumbing — schema,
partitioning, Arrow batch shape, mapInPandas signatures — is real and
tested; the codec calls themselves are STUBBED (this container ships no
image/audio libraries) behind ``_decode_stub``, clearly marked.

Scale design: decode/feature-extract run as ``mapInPandas`` so each task
streams Arrow batches (no per-row Python overhead, no driver collect);
payloads stay columnar end-to-end. Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory holds
``batch × max_payload`` comfortably.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of feature extraction — fixed-size float vector + status.
FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, "
    "feature array<float>, status string"
)

FEATURE_DIM = 8


def _decode_stub(payload: bytes | None, media_type: str) -> list[float]:
    """STUB decoder — deterministic fake features from the raw bytes.

    Real deployments replace this with PIL/torchvision/ffmpeg calls; the
    container has none of those, so we derive a stable FEATURE_DIM-vector
    from byte statistics (keeps tests deterministic and the plumbing real).
    Raises on None payload to exercise the error path.
    """
    if payload is None:
        raise NotImplementedError("no payload; real decoder would fetch/stream")
    n = len(payload)
    return [
        float(n % 251),
        float(payload[0] if n else 0),
        float(payload[-1] if n else 0),
        float(sum(payload[:64]) % 997),
        float(len(media_type)),
        float(n % 7),
        float(n % 13),
        float(n % 17),
    ]


def pil_available() -> bool:
    """True iff Pillow is importable (the ``multimodal`` extra)."""
    try:
        import PIL  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


def pil_image_features(payload: bytes | None, media_type: str) -> list[float]:
    """REAL image decoder (Pillow) with the same contract as
    ``_decode_stub`` — drop-in for ``extract_features(decoder=...)``.

    Lazy-imports PIL inside the closure so the module (and the stub
    path) works in containers without it, mirroring the matplotlib
    gating in ``operators/plots.py``. Features (FEATURE_DIM=8):
    width, height, bands, mean/min/max luma, occupied-luma-bin count,
    payload bytes — deterministic per payload, no RNG.
    """
    import io  # noqa: PLC0415

    from PIL import Image  # noqa: PLC0415 — optional 'multimodal' extra

    if payload is None:
        raise NotImplementedError("no payload; real decoder would fetch/stream")
    img = Image.open(io.BytesIO(payload))
    img.load()
    w, h = img.size
    bands = len(img.getbands())
    hist = img.convert("L").histogram()
    n = max(1, w * h)
    occupied = [i for i, c in enumerate(hist) if c]
    return [
        float(w),
        float(h),
        float(bands),
        float(sum(i * c for i, c in enumerate(hist)) / n),
        float(occupied[0] if occupied else 0),
        float(occupied[-1] if occupied else 0),
        float(len(occupied)),
        float(len(payload)),
    ]


def extract_features(assets: DataFrame, *, decoder=None) -> DataFrame:
    """Decode + featurize media assets via ``mapInPandas``.

    One Arrow batch in, one out; per-asset failures are captured in
    ``status`` instead of failing the task (at 100 TB a single corrupt
    payload must not kill a stage). ``decoder`` is any
    ``(payload, media_type) -> list[float]`` (len FEATURE_DIM) callable;
    defaults to the deterministic byte-stats stub, with
    ``pil_image_features`` as the shipped real-image option.
    """
    decode = decoder or _decode_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, status, nbytes = [], [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                try:
                    feats.append(decode(payload, mtype))
                    status.append("ok")
                except Exception as e:  # noqa: BLE001 — per-row tolerance
                    feats.append([0.0] * FEATURE_DIM)
                    status.append(f"error:{type(e).__name__}")
                nbytes.append(0 if payload is None else len(payload))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": nbytes,
                    "feature": feats,
                    "status": status,
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: explodes per-asset frame indices from
    metadata (``meta['n_frames']``) — the decode of each sampled frame is
    the stubbed step. Demonstrates the explode-then-mapInPandas shape that
    keeps frame fan-out distributed."""
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0)
    )
    # Frameless assets (n_frames <= 0 or missing meta) contribute NO rows —
    # without the filter, sequence(0, greatest(-1, 0)) would fabricate a
    # phantom frame_idx 0 for them.
    return (
        assets.where(n_frames > 0)
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


#: Output schema of resize — the MEDIA_ASSET shape plus an audit column.
RESIZE_SCHEMA = (
    "asset_id long, media_type string, payload binary, "
    "meta map<string,string>, status string"
)


def resize_assets(assets: DataFrame, *, max_bytes: int = 256) -> DataFrame:
    """Resize/transcode media payloads via ``mapInPandas`` — binary in,
    binary out, metadata updated in place.

    The codec call is STUBBED (a real deployment swaps the body for
    PIL ``thumbnail`` / ffmpeg scale): payloads longer than ``max_bytes``
    are deterministically truncated and tagged ``meta['resized']='true'``,
    shorter ones pass through untouched. What is REAL — and what this
    operator exists to pin — is the Spark-side shape a 100 TB media
    pipeline needs: Arrow batches stream binary columns through Python
    without per-row overhead, output payloads stay columnar (never
    collected), per-asset failures land in ``status`` instead of killing
    the stage, and the output schema is again MEDIA_ASSET-compatible so
    resize chains with ``extract_features``/``frame_sample_plan``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas, status = [], [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                meta = dict(meta) if meta is not None else {}
                try:
                    if payload is None:
                        raise NotImplementedError(
                            "no payload; real codec would fetch/stream"
                        )
                    if len(payload) > max_bytes:
                        payload = payload[:max_bytes]
                        meta["resized"] = "true"
                    status.append("ok")
                except Exception as e:  # noqa: BLE001 — per-row tolerance
                    status.append(f"error:{type(e).__name__}")
                payloads.append(payload)
                metas.append(meta)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload": payloads,
                    "meta": metas,
                    "status": status,
                }
            )

    return assets.mapInPandas(run, schema=RESIZE_SCHEMA)
