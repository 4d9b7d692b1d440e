"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The decode libraries (PIL / torchaudio / video codecs) are NOT available in
this environment, so the codec step is STUBBED: each actor probes for its
library in ``__init__`` (once per actor — the actor-pool pattern the real
model-loading stage would use) and, when absent, substitutes a
clearly-marked deterministic fake decode (pure function of the payload
bytes). Everything around the stub — schema, batch sizing for large binary
payloads, actor signature, output layout — is real and tested; swapping the
fake for a real codec changes only the inner function.

Schema of the synthetic ``media`` table:
    media_id:int64  kind:string(image|audio|video)  payload:binary
    meta:string (JSON: {"width","height"} | {"sample_rate","seconds"} |
                 {"width","height","fps","seconds"})
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 16

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),
    ("payload", pa.binary()),
    ("meta", pa.string()),
])

# Large binary payloads: keep batches small so batch x concurrency fits in
# a worker heap (a 4K image ~8 MB decoded -> 16/batch ~128 MB peak).
MEDIA_BATCH_SIZE = 16


def synth_media_table(n_rows: int, seed: int = 7) -> pa.Table:
    """Deterministic fake media corpus (payload bytes are seeded noise)."""
    import random

    rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
    for i in range(n_rows):
        rng = random.Random(seed * 99991 + i)
        kind = ("image", "audio", "video")[i % 3]
        payload = rng.randbytes(rng.randrange(256, 4096))
        if kind == "image":
            meta = {"width": rng.choice([640, 1024]), "height": rng.choice([480, 768])}
        elif kind == "audio":
            meta = {"sample_rate": 16000, "seconds": rng.randrange(1, 30)}
        else:
            meta = {"width": 640, "height": 480, "fps": 25,
                    "seconds": rng.randrange(1, 60)}
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["meta"].append(json.dumps(meta, sort_keys=True))
    return pa.table(rows, schema=MEDIA_SCHEMA)


def _fake_vector(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoded-content feature vector."""
    crc = zlib.crc32(payload)
    rng = np.random.RandomState(crc & 0x7FFFFFFF)
    return rng.rand(dim).astype(np.float64)


class _MediaActor:
    """Base: library probe in __init__ (once per actor), batch work in
    __call__. Subclasses set LIB and implement _process_row."""

    LIB: str = ""
    KIND: str = ""

    def __init__(self):
        try:
            __import__(self.LIB)
            self._backend = self.LIB
        except ImportError:
            # STUB: deterministic fake decode (marked in the output)
            self._backend = "stub"

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        metas = batch.column("meta").to_pylist()
        out = {"media_id": [], "backend": [], "feature": [], "info": []}
        for mid, kind, payload, meta in zip(ids, kinds, payloads, metas):
            if kind != self.KIND:
                continue
            feature, info = self._process_row(payload, json.loads(meta))
            out["media_id"].append(mid)
            out["backend"].append(self._backend)
            out["feature"].append(feature.tolist())
            out["info"].append(json.dumps(info, sort_keys=True))
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "backend": pa.array(out["backend"], pa.string()),
            "feature": pa.array(out["feature"], pa.list_(pa.float64())),
            "info": pa.array(out["info"], pa.string()),
        })

    def _process_row(self, payload: bytes, meta: dict):
        raise NotImplementedError


class ImageFeatures(_MediaActor):
    """decode -> resize(64x64) -> feature vector. Real path would use PIL;
    stub path derives everything deterministically from the bytes."""

    LIB = "PIL"
    KIND = "image"
    TARGET = (64, 64)

    def _process_row(self, payload: bytes, meta: dict):
        if self._backend != "stub":  # pragma: no cover - PIL absent here
            raise NotImplementedError("real PIL decode not wired in sandbox")
        vec = _fake_vector(payload, FEATURE_DIM)
        info = {"src_w": meta.get("width"), "src_h": meta.get("height"),
                "resized_to": list(self.TARGET)}
        return vec, info


class AudioFeatures(_MediaActor):
    """decode -> 1 s windows -> per-window energy (stub: seeded)."""

    LIB = "torchaudio"
    KIND = "audio"

    def _process_row(self, payload: bytes, meta: dict):
        if self._backend != "stub":  # pragma: no cover
            raise NotImplementedError("real audio decode not wired in sandbox")
        seconds = int(meta.get("seconds", 1))
        vec = _fake_vector(payload, min(FEATURE_DIM, max(1, seconds)))
        if len(vec) < FEATURE_DIM:
            vec = np.pad(vec, (0, FEATURE_DIM - len(vec)))
        return vec, {"windows": seconds, "sample_rate": meta.get("sample_rate")}


class VideoFrameSample(_MediaActor):
    """sample 1 frame/s up to 8 -> per-frame features (stub: seeded)."""

    LIB = "cv2"
    KIND = "video"
    MAX_FRAMES = 8

    def _process_row(self, payload: bytes, meta: dict):
        if self._backend != "stub":  # pragma: no cover
            raise NotImplementedError("real video decode not wired in sandbox")
        n_frames = min(self.MAX_FRAMES, int(meta.get("seconds", 1)))
        frame_indices = [int(i * meta.get("fps", 25)) for i in range(n_frames)]
        vec = _fake_vector(payload, FEATURE_DIM)
        return vec, {"sampled_frames": frame_indices}


class MediaFeatures:
    """Single-scan dispatcher: one actor holds all three modality
    processors (each probes its codec lib once in __init__) and routes
    every batch to each by kind. One pass over the corpus — branching
    three ``map_batches`` off the same un-materialized upstream would
    re-execute the scan 3x (the re-execution trap BASELINE.md documents
    for the explode path). At write-time-partitioned-by-kind deployments
    the per-kind actor classes above can run as disjoint scans instead."""

    def __init__(self):
        self._stages = (ImageFeatures(), AudioFeatures(), VideoFrameSample())

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.concat_tables([stage(batch) for stage in self._stages])


def media_features(media_ds, concurrency=None):
    """Per-modality decode/feature actor pool over the media corpus —
    single scan, small batches (large binary payloads)."""
    return media_ds.map_batches(
        MediaFeatures,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        zero_copy_batch=True,
        concurrency=concurrency if concurrency is not None else 2,
    )
