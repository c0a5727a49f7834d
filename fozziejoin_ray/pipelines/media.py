"""Multimodal stages: media columns as opaque binary + typed metadata.

The execution plumbing (schemas, actor-pool signatures, batch sizing,
output layout) is real and tested; the codec kernels themselves are
STUBS because no image/audio libraries exist in this environment —
each decode stage either raises ``NotImplementedError`` (strict mode)
or produces a deterministic fake derived from the payload bytes
(``fake=True``), so pipelines exercise the full Ray path end-to-end.

Design notes for 100 TB media:
- media payloads are ``binary`` columns; keep ``batch_size`` small
  (payload_bytes x batch_size x concurrency must fit worker heap) and
  raise ``DataContext.target_max_block_size`` so wide rows don't split
  into absurdly small blocks;
- decode/resize/feature stages are actor pools (codec contexts are
  expensive: construct once per actor in ``__init__``);
- outputs store derived features + (kind, media_ref) lineage, never
  re-encode the payload unless asked.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int, *, seed: int = 5, kind: str = "image") -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    refs, payloads, w, h, dur = [], [], [], [], []
    for i in range(n):
        refs.append("m://%016x" % rng.randint(0, 2**31))
        payloads.append(rng.bytes(rng.randint(64, 256)))
        w.append(int(rng.randint(16, 512)))
        h.append(int(rng.randint(16, 512)))
        dur.append(int(rng.randint(0, 60000)) if kind != "image" else 0)
    return pa.table(
        {
            "media_ref": pa.array(refs),
            "kind": pa.array([kind] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "duration_ms": pa.array(dur, pa.int32()),
        }
    )


class ImageFeatureExtractor:
    """Actor-pool stage: payload -> fixed-size float32 feature vector.

    Real deployment: ``__init__`` loads the codec + model ONCE per actor;
    ``__call__`` decodes and embeds a batch. Here the decode is stubbed.
    """

    FEATURE_DIM = 32

    def __init__(self, fake: bool = True):
        self.fake = fake
        # real impl: self.codec = load_image_codec(); self.model = load_model()

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires an image codec library, not present in this environment"
            )
        # deterministic fake: bytes -> seeded feature vector
        rng = np.random.RandomState(zlib.crc32(payload) % (2**31 - 1))
        return rng.rand(self.FEATURE_DIM).astype(np.float32)

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [self._decode(p) for p in t.column("payload").to_pylist()]
        arr = pa.array([f.tolist() for f in feats], pa.list_(pa.float32(), self.FEATURE_DIM))
        return pa.table(
            {
                "media_ref": t["media_ref"],
                "kind": t["kind"],
                "features": arr,
            }
        )


class FrameSampler:
    """Actor-pool stage: video payload -> k sampled frame references.
    Decode stubbed; emits deterministic frame offsets."""

    def __init__(self, k: int = 4, fake: bool = True):
        self.k = k
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        refs, frame_idx, ts = [], [], []
        for ref, dur in zip(t.column("media_ref").to_pylist(), t.column("duration_ms").to_pylist()):
            if not self.fake:
                raise NotImplementedError("video decode not available in this environment")
            for i in range(self.k):
                refs.append(ref)
                frame_idx.append(i)
                ts.append(int(dur * i / max(1, self.k)))
        return pa.table(
            {
                "media_ref": pa.array(refs),
                "frame": pa.array(frame_idx, pa.int32()),
                "ts_ms": pa.array(ts, pa.int32()),
            }
        )


def extract_image_features(
    media: rd.Dataset, *, fake: bool = True, concurrency=(1, 4), batch_size: int = 256
) -> rd.Dataset:
    """Small batches: payload bytes dominate memory, not row count."""
    return media.map_batches(
        ImageFeatureExtractor,
        fn_constructor_args=(fake,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(
    media: rd.Dataset, *, k: int = 4, fake: bool = True, concurrency=(1, 4), batch_size: int = 128
) -> rd.Dataset:
    return media.map_batches(
        FrameSampler,
        fn_constructor_args=(k, fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
