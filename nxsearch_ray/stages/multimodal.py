"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with
metadata columns beside them; decode / feature-extraction runs as an
actor-pool `map_batches` stage with SMALL batches (wide rows — see the
block-size note in SURVEY.md §7).

The decode libraries (Pillow, torchaudio, …) are NOT in this
container, so the actual pixel/sample decode is stubbed: by default
the stage raises `NotImplementedError` at actor construction when the
library is missing; with ``deterministic_fake=True`` it emits
deterministic pseudo-features derived from the payload bytes so that
schema, batching, actor lifecycle and downstream layout are all real
and testable.  Swapping in a real decoder is a one-method change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nxsearch_ray.functions.hashing import sequence_hashes, splitmix64

FEATURE_DIM = 8

IMAGE_FEATURES_SCHEMA = pa.schema([
    ("page_id", pa.int64()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("channels", pa.int8()),
    ("payload_bytes", pa.int64()),
    ("payload_hash", pa.uint64()),
    ("features", pa.list_(pa.float32(), FEATURE_DIM)),
])


class ImageFeatureActor:
    """Decode + feature-extract stage for a binary image column.

    ``__init__`` loads the decoder once per actor (the real pattern for
    model-bearing stages); per-batch work is vectorized over payload
    bytes.
    """

    def __init__(self, *, binary_col: str = "payload",
                 id_col: str = "page_id",
                 deterministic_fake: bool = False):
        self.binary_col = binary_col
        self.id_col = id_col
        self.fake = deterministic_fake
        if not deterministic_fake:
            try:
                from PIL import Image  # noqa: F401  (not in container)
                self._decoder = Image
            except ImportError as e:
                raise NotImplementedError(
                    "image decode requires Pillow, which is not in this "
                    "environment; construct with deterministic_fake=True "
                    "to exercise the pipeline plumbing") from e

    def _fake_decode(self, payloads: list[bytes]) -> dict:
        lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                           count=len(payloads))
        flat = np.frombuffer(b"".join(payloads), dtype=np.uint8) \
            .astype(np.uint64)
        offsets = np.zeros(len(payloads) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        h = sequence_hashes(flat, offsets)
        width = (h % np.uint64(1920) + np.uint64(16)).astype(np.int32)
        height = (splitmix64(h) % np.uint64(1080)
                  + np.uint64(16)).astype(np.int32)
        feats = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
        for j in range(FEATURE_DIM):
            feats[:, j] = (splitmix64(h ^ np.uint64(j + 1))
                           .astype(np.float64) / 2.0 ** 64)
        return {"width": width, "height": height,
                "channels": np.full(len(payloads), 3, dtype=np.int8),
                "payload_bytes": lens, "payload_hash": h,
                "features": feats}

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [p or b"" for p in
                    batch.column(self.binary_col).to_pylist()]
        d = self._fake_decode(payloads)  # real decoder would branch here
        return pa.Table.from_arrays(
            [batch.column(self.id_col).cast(pa.int64()),
             pa.array(d["width"]), pa.array(d["height"]),
             pa.array(d["channels"]), pa.array(d["payload_bytes"]),
             pa.array(d["payload_hash"], type=pa.uint64()),
             pa.FixedSizeListArray.from_arrays(
                 pa.array(d["features"].reshape(-1)), FEATURE_DIM)],
            schema=IMAGE_FEATURES_SCHEMA)


def image_features_stage(ds, *, binary_col: str = "payload",
                         id_col: str = "page_id",
                         deterministic_fake: bool = False,
                         concurrency=(1, 4), batch_size: int = 64):
    """Small batch_size: binary payloads are wide; concurrency × batch
    × payload must fit the worker heap."""
    return ds.map_batches(
        ImageFeatureActor,
        fn_constructor_kwargs=dict(binary_col=binary_col, id_col=id_col,
                                   deterministic_fake=deterministic_fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
