"""Multimodal column plumbing (image/audio/video as opaque binary).

The decode kernels themselves are STUBBED (no PIL/ffmpeg in this
environment — they raise ``NotImplementedError`` unless the deterministic
fake is requested), but the Ray-side plumbing is real and tested: schema
(binary payload + typed metadata), actor-pool stage shape, small batches
for large rows, and Arrow-native output layout.

Pattern: media stages are ALWAYS actor pools (model/codec loaded once per
actor — ST2), with ``batch_size`` sized so batch × concurrency fits worker
heap (SURVEY.md §4 memory note: large binary rows need small batches).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dedup_ray.util.hashing import stable64


def fake_image(media_id: str, width: int = 8, height: int = 8) -> bytes:
    """Deterministic fake 'image': raw RGB bytes derived from the id."""
    rng = np.random.default_rng(stable64(f"img:{media_id}"))
    return rng.integers(0, 256, size=width * height * 3, dtype=np.uint8).tobytes()


class ImageDecode:
    """Actor: (media_id, payload, width, height) → +decoded feature columns.

    ``backend='fake'`` decodes the deterministic raw-RGB fake (mean/std per
    channel); ``backend='pil'`` is the real path and raises
    NotImplementedError here (PIL not installed) — the call signature,
    schema and batching are the production shape either way.
    """

    def __init__(self, backend: str = "fake") -> None:
        self.backend = backend
        if backend == "pil":
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "PIL backend requires pillow; use backend='fake' in this env"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds = [], []
        for payload, w, h in zip(
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            arr = np.frombuffer(payload, dtype=np.uint8).reshape(h, w, 3)
            means.append([round(float(x), 6) for x in arr.mean(axis=(0, 1))])
            stds.append([round(float(x), 6) for x in arr.std(axis=(0, 1))])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "rgb_mean": pa.array(means, pa.list_(pa.float64())),
                "rgb_std": pa.array(stds, pa.list_(pa.float64())),
            }
        )


def decode_images(media_ds, concurrency: int = 2, batch_size: int = 64,
                  backend: str = "fake"):
    """Small batches on purpose: binary payload rows are wide."""
    return media_ds.map_batches(
        ImageDecode,
        fn_constructor_kwargs={"backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def make_media_table(n: int = 32, width: int = 8, height: int = 8) -> pa.Table:
    """Deterministic media fixture: binary payload + typed metadata."""
    ids = [f"m{i:04d}" for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(
                [fake_image(i, width, height) for i in ids], pa.binary()
            ),
            "width": pa.array([width] * n, pa.int32()),
            "height": pa.array([height] * n, pa.int32()),
            "media_type": pa.array(["image/raw-rgb"] * n),
        }
    )
