"""Multimodal column plumbing (image/audio/video as opaque binary).

Backends per stage, by decreasing capability in THIS environment:

- ``png`` / ``wav`` — REAL decoders from the published file formats
  (``stages/codecs.py``: stdlib zlib/wave + numpy; no PIL/ffmpeg needed).
  Real PNG and RIFF-PCM payloads decode end to end.
- ``fake`` / ``raw`` — deterministic raw-RGB / raw-PCM payloads, the CI
  path that needs no container format at all.
- ``avi`` — REAL video container decode (``stages/codecs.py``: RIFF
  'AVI ' walk, uncompressed 24-bit DIB frames — the interchange form
  every player accepts; stdlib ``struct`` + numpy).
- ``jpeg`` — REAL baseline-JPEG decode (``stages/codecs.py``: ITU T.81
  sequential DCT — Huffman + IDCT + 4:2:0 upsampling, stdlib + numpy).
- ``gif`` — REAL GIF87a/89a decode (``stages/codecs.py``: full LZW with
  variable code width, palettes, interlacing).
- ``pil`` / ``ffmpeg`` — the full-codec seams (WebP/progressive JPEG,
  compressed video bitstreams); import-gated and raising
  ``NotImplementedError`` where the libraries are absent.

Pattern: media stages are ALWAYS actor pools (model/codec loaded once per
actor — ST2), with ``batch_size`` sized so batch × concurrency fits worker
heap (SURVEY.md §4 memory note: large binary rows need small batches).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dedup_ray.util.hashing import stable64


def fake_image(media_id: str, width: int = 8, height: int = 8) -> bytes:
    """Deterministic fake 'image': raw RGB bytes derived from the id."""
    rng = np.random.default_rng(stable64(f"img:{media_id}"))
    return rng.integers(0, 256, size=width * height * 3, dtype=np.uint8).tobytes()


class ImageDecode:
    """Actor: (media_id, payload, width, height) → +decoded feature columns.

    ``backend='fake'`` decodes the deterministic raw-RGB fake;
    ``backend='png'`` / ``backend='jpeg'`` decode REAL PNG / baseline-JPEG
    payloads (``stages/codecs.py``, no external library);
    ``backend='pil'`` is the full-codec seam (WebP/progressive), used
    when pillow is importable and raising otherwise.
    Output: per-channel mean/std (3 entries for RGB; greyscale/alpha
    channels as produced by the image).
    """

    def __init__(self, backend: str = "fake") -> None:
        self.backend = backend
        self._pil = None
        if backend == "pil":
            try:
                import PIL.Image

                self._pil = PIL.Image
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "PIL backend requires pillow; use backend='png' (real "
                    "PNG decode, no dependency) or 'fake' in this env"
                ) from e

    def _decode(self, payload: bytes, w, h) -> np.ndarray:
        if self.backend == "png":
            from dedup_ray.stages.codecs import png_decode

            return png_decode(payload)
        if self.backend == "jpeg":
            from dedup_ray.stages.codecs import jpeg_decode

            return jpeg_decode(payload)
        if self.backend == "gif":
            from dedup_ray.stages.codecs import gif_decode

            return gif_decode(payload)
        if self.backend == "pil":  # pragma: no cover - env-dependent
            import io

            return np.asarray(self._pil.open(io.BytesIO(payload)).convert("RGB"))
        return np.frombuffer(payload, dtype=np.uint8).reshape(h, w, 3)

    @staticmethod
    def _as_3d(arr: np.ndarray) -> np.ndarray:
        # greyscale decoders (jpeg/gif on 1-channel input) return 2-D;
        # normalize so the channel-stats loop sees one channel
        return arr[:, :, None] if arr.ndim == 2 else arr

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds = [], []
        for payload, w, h in zip(
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            arr = self._as_3d(self._decode(payload, w, h))
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


class ImageResize:
    """Actor: nearest-neighbor resize.  ``backend='raw'`` operates on
    raw-RGB payloads; ``backend='png'`` decodes REAL PNG payloads and
    re-encodes the resized image as PNG (codec round-trip, still zero
    external dependencies); ``backend='pil'`` is the full-codec seam.
    Output keeps the binary-payload schema so resize chains into
    decode/feature stages."""

    def __init__(self, out_w: int, out_h: int, backend: str = "raw") -> None:
        self.out_w, self.out_h = out_w, out_h
        if backend == "pil":  # pragma: no cover - env-dependent
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "PIL backend requires pillow; use backend='png' (real "
                    "PNG round-trip, no dependency) or 'raw'"
                ) from e
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        ow, oh = self.out_w, self.out_h
        png = self.backend == "png"
        if png:
            from dedup_ray.stages.codecs import png_decode, png_encode
        for payload, w, h in zip(
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            if png:
                arr = png_decode(payload)
                h, w = arr.shape[:2]
            else:
                arr = np.frombuffer(payload, dtype=np.uint8).reshape(h, w, 3)
            yi = (np.arange(oh) * h // oh).astype(np.int64)
            xi = (np.arange(ow) * w // ow).astype(np.int64)
            resized = arr[yi][:, xi]
            out.append(png_encode(resized) if png else resized.tobytes())
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(out, pa.binary()),
                "width": pa.array([ow] * n, pa.int32()),
                "height": pa.array([oh] * n, pa.int32()),
                "media_type": batch["media_type"],
            }
        )


def resize_images(media_ds, out_w: int, out_h: int, concurrency: int = 2,
                  batch_size: int = 64, backend: str = "raw"):
    return media_ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={
            "out_w": out_w, "out_h": out_h, "backend": backend,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class VideoFrameSample:
    """Actor: video → every Nth frame as its own raw-RGB image row — the
    fan-out (flat_map) media shape.  ``backend='raw'`` reads concatenated
    raw RGB frames; ``backend='avi'`` decodes REAL AVI containers
    (``stages/codecs.py``, uncompressed DIB — no external library).
    Compressed bitstreams (H.264/VP9) remain behind the ffmpeg seam."""

    def __init__(self, every: int = 2, backend: str = "raw") -> None:
        self.every = every
        if backend not in ("raw", "avi"):  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "compressed-video backends not available in this "
                "environment; use backend='avi' (real AVI/DIB container "
                "decode) or 'raw'"
            )
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames, ws, hs = [], [], [], [], []
        for mid, payload, w, h, nf in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
            batch["n_frames"].to_pylist(),
        ):
            if self.backend == "avi":
                from dedup_ray.stages.codecs import avi_decode

                arr, _fps = avi_decode(payload)
                nf, h, w = arr.shape[:3]
                for k in range(0, nf, self.every):
                    ids.append(mid)
                    fidx.append(k)
                    frames.append(arr[k].tobytes())
                    ws.append(w)
                    hs.append(h)
                continue
            fsize = w * h * 3
            for k in range(0, nf, self.every):
                ids.append(mid)
                fidx.append(k)
                frames.append(payload[k * fsize : (k + 1) * fsize])
                ws.append(w)
                hs.append(h)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "payload": pa.array(frames, pa.binary()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "media_type": pa.array(["image/raw-rgb"] * len(ids)),
            }
        )


def sample_video_frames(video_ds, every: int = 2, concurrency: int = 2,
                        batch_size: int = 8, backend: str = "raw"):
    """Tiny batches: video rows are the widest payloads in the engine."""
    return video_ds.map_batches(
        VideoFrameSample,
        fn_constructor_kwargs={"every": every, "backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AudioWindow:
    """Actor: PCM audio → fixed-length windows with RMS energy.
    ``backend='raw'`` reads bare int16 samples; ``backend='wav'`` decodes
    REAL RIFF/WAVE containers (``stages/codecs.py``, stdlib ``wave``),
    averaging channels to mono.  Compressed codecs (mp3/ogg) remain behind
    the ffmpeg seam."""

    def __init__(self, window_samples: int = 1024, backend: str = "raw") -> None:
        self.window = window_samples
        if backend not in ("raw", "wav"):  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "compressed-codec backends not available; use backend='wav' "
                "(real RIFF/WAVE decode) or 'raw'"
            )
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widx, rms = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            if self.backend == "wav":
                from dedup_ray.stages.codecs import wav_decode

                pcm, _rate = wav_decode(payload)
                if pcm.ndim > 1:  # channel-mean to mono
                    pcm = pcm.astype(np.float64).mean(axis=1)
                pcm = np.asarray(pcm, np.float64)
            else:
                pcm = np.frombuffer(payload, dtype=np.int16).astype(np.float64)
            n_win = max(1, len(pcm) // self.window)
            trimmed = pcm[: n_win * self.window].reshape(n_win, -1)
            e = np.sqrt((trimmed**2).mean(axis=1))
            ids.extend([mid] * n_win)
            widx.extend(range(n_win))
            rms.extend(np.round(e, 6).tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "window_idx": pa.array(widx, pa.int32()),
                "rms": pa.array(rms, pa.float64()),
            }
        )


def window_audio(audio_ds, window_samples: int = 1024, concurrency: int = 2,
                 batch_size: int = 32, backend: str = "raw"):
    return audio_ds.map_batches(
        AudioWindow,
        fn_constructor_kwargs={
            "window_samples": window_samples, "backend": backend,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def make_png_media_table(n: int = 8, width: int = 8, height: int = 8) -> pa.Table:
    """REAL-PNG media fixture: the SAME pixels as ``make_media_table``
    (ids match, so the two fixtures are feature-comparable) encoded
    through ``codecs.png_encode`` — actual PNG files, decodable by any
    viewer."""
    from dedup_ray.stages.codecs import png_encode

    ids = [f"m{i:04d}" for i in range(n)]
    payloads = []
    for i in ids:
        arr = np.frombuffer(
            fake_image(i, width, height), np.uint8
        ).reshape(height, width, 3)
        payloads.append(png_encode(arr))
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([width] * n, pa.int32()),
            "height": pa.array([height] * n, pa.int32()),
            "media_type": pa.array(["image/png"] * n),
        }
    )


def make_wav_audio_table(n: int = 8, n_samples: int = 4096,
                         rate: int = 16000) -> pa.Table:
    """REAL-WAV audio fixture: the SAME planted PCM samples as
    ``make_audio_table`` (ids match) wrapped in RIFF containers."""
    from dedup_ray.stages.codecs import wav_encode

    ids = [f"a{i:04d}" for i in range(n)]
    payloads = []
    for i in ids:
        rng = np.random.default_rng(stable64(f"pcm:{i}"))
        pcm = rng.integers(-32768, 32767, size=n_samples, dtype=np.int16)
        payloads.append(wav_encode(pcm, rate))
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array([rate] * n, pa.int32()),
            "media_type": pa.array(["audio/wav"] * n),
        }
    )


def make_video_table(n: int = 4, width: int = 8, height: int = 8,
                     n_frames: int = 6) -> pa.Table:
    """Deterministic raw-frame video fixture."""
    ids = [f"v{i:04d}" for i in range(n)]
    payloads = [
        b"".join(
            fake_image(f"{i}/f{k}", width, height) for k in range(n_frames)
        )
        for i in ids
    ]
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([width] * n, pa.int32()),
            "height": pa.array([height] * n, pa.int32()),
            "n_frames": pa.array([n_frames] * n, pa.int32()),
            "media_type": pa.array(["video/raw-rgb"] * n),
        }
    )


def make_jpeg_media_table(n: int = 8, width: int = 8, height: int = 8,
                          quality: int = 100,
                          subsample: bool = False) -> pa.Table:
    """REAL-JPEG media fixture: the SAME pixels as ``make_media_table``
    (ids match) encoded through ``codecs.jpeg_encode`` — actual baseline
    JPEG files, decodable by any viewer.  At the default quality 100 the
    decode error is ≤2/255 per channel, so features computed on this
    table are comparable (within tolerance) to the raw fixture's."""
    from dedup_ray.stages.codecs import jpeg_encode

    ids = [f"m{i:04d}" for i in range(n)]
    payloads = []
    for i in ids:
        arr = np.frombuffer(
            fake_image(i, width, height), np.uint8
        ).reshape(height, width, 3)
        payloads.append(jpeg_encode(arr, quality=quality,
                                    subsample=subsample))
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([width] * n, pa.int32()),
            "height": pa.array([height] * n, pa.int32()),
            "media_type": pa.array(["image/jpeg"] * n),
        }
    )


def make_avi_video_table(n: int = 4, width: int = 8, height: int = 8,
                         n_frames: int = 6, fps: int = 10) -> pa.Table:
    """REAL-AVI video fixture: the SAME planted frames as
    ``make_video_table`` (ids match, so frame samples are comparable)
    wrapped in RIFF 'AVI ' containers via ``codecs.avi_encode`` — actual
    AVI files, playable by any AVI-aware tool."""
    from dedup_ray.stages.codecs import avi_encode

    ids = [f"v{i:04d}" for i in range(n)]
    payloads = []
    for i in ids:
        frames = np.stack([
            np.frombuffer(
                fake_image(f"{i}/f{k}", width, height), np.uint8
            ).reshape(height, width, 3)
            for k in range(n_frames)
        ])
        payloads.append(avi_encode(frames, fps=fps))
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([width] * n, pa.int32()),
            "height": pa.array([height] * n, pa.int32()),
            "n_frames": pa.array([n_frames] * n, pa.int32()),
            "media_type": pa.array(["video/x-msvideo"] * n),
        }
    )


def make_audio_table(n: int = 8, n_samples: int = 4096) -> pa.Table:
    """Deterministic int16-PCM audio fixture."""
    ids = [f"a{i:04d}" for i in range(n)]
    payloads = []
    for i in ids:
        rng = np.random.default_rng(stable64(f"pcm:{i}"))
        payloads.append(
            rng.integers(-32768, 32767, size=n_samples, dtype=np.int16).tobytes()
        )
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array([16000] * n, pa.int32()),
            "media_type": pa.array(["audio/pcm-s16le"] * n),
        }
    )


MAGIC_PNG = b"\x89PNG\r\n\x1a\n"
MAGIC_JPEG = b"\xff\xd8\xff"
MAGIC_GIF = b"GIF8"
MAGIC_RIFF = b"RIFF"


# (name, magic-byte prefix) tested IN ORDER; first match wins.  The
# leading ASCII magics are the ones the oracle-checked query synthesizes
# as VARCHAR; the media magics below them route real payloads to the
# per-type decoder stages (codecs.py).  PNG/JPEG magics start with
# non-ASCII bytes a text payload cannot contain; GIF8/RIFF are pure
# ASCII and CAN head a text row, so the sniff oracle mirrors those two
# cases explicitly (review finding r3).
CONTENT_MAGICS: list[tuple[str, bytes]] = [
    ("pdf", b"%PDF-"),
    ("html", b"<!DOCTYPE"),
    ("html", b"<html"),
    ("xml", b"<?xml"),
    ("png", MAGIC_PNG),
    ("jpeg", MAGIC_JPEG),
    ("gif", MAGIC_GIF),
    ("riff", MAGIC_RIFF),  # WAV/AVI; bytes 8-12 pick the container
]
CONTENT_FALLBACK = "other"


class MediaRouter:
    """Actor: mixed-format binary payloads → per-type decoded dimensions.

    The composite the sniffer exists for: magic-byte detection picks the
    decoder (all REAL: png/jpeg/gif images, RIFF wav/avi containers),
    each payload is parsed by its own codec, and the output rows carry
    dimensions read from INSIDE the container (decoded array shapes,
    sample counts, frame counts) — so a routing or parse defect is
    visible as a value mismatch, not a type string.  Unknown payloads
    pass through as ``content_type='other'`` with null dims."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dedup_ray.stages.codecs import (
            avi_decode,
            gif_decode,
            jpeg_decode,
            png_decode,
            wav_decode,
        )

        types, d1, d2 = [], [], []
        for payload in batch["payload"].to_pylist():
            p = payload or b""
            if p[: len(MAGIC_PNG)] == MAGIC_PNG:
                arr = png_decode(p)
                types.append("png")
                d1.append(arr.shape[1])   # decoded width
                d2.append(arr.shape[0])   # decoded height
            elif p[: len(MAGIC_JPEG)] == MAGIC_JPEG:
                arr = jpeg_decode(p)
                types.append("jpeg")
                d1.append(arr.shape[1])
                d2.append(arr.shape[0])
            elif p[:4] == MAGIC_GIF:
                arr = gif_decode(p)
                types.append("gif")
                d1.append(arr.shape[1])
                d2.append(arr.shape[0])
            elif p[:4] == MAGIC_RIFF and p[8:12] == b"WAVE":
                pcm, rate = wav_decode(p)
                types.append("wav")
                d1.append(len(pcm))       # decoded sample count
                d2.append(rate)
            elif p[:4] == MAGIC_RIFF and p[8:12] == b"AVI ":
                frames, _fps = avi_decode(p)
                types.append("avi")
                d1.append(frames.shape[0])  # decoded frame count
                d2.append(frames.shape[2])  # decoded width
            else:
                types.append("other")
                d1.append(None)
                d2.append(None)
        return pa.table({
            "media_id": batch["media_id"],
            "content_type": pa.array(types, pa.string()),
            "dim1": pa.array(d1, pa.int64()),
            "dim2": pa.array(d2, pa.int64()),
        })


def route_media(media_ds, concurrency: int = 2, batch_size: int = 64):
    """Mixed binary payloads → (media_id, content_type, dim1, dim2)
    through one actor pool; codecs load once per actor."""
    return media_ds.map_batches(
        MediaRouter,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sniff_content_type(ds, payload_col: str = "payload",
                       id_col: str = "doc_id"):
    """Magic-byte content-type detection over an opaque binary column —
    the first pass a crawler runs before routing payloads to per-type
    decoders (the actor-pool stages above).

    Vectorized over the Arrow binary buffers: per magic, one prefix
    comparison of the first ``len(magic)`` bytes of every row (gathered
    from the flat data buffer by offsets — no per-row Python, no bytes
    copied beyond the prefixes).  Rules apply in ``CONTENT_MAGICS``
    order; null/short payloads fall through to ``other``.  Output:
    ``(id_col, content_type)``.
    """

    def f(t: pa.Table) -> pa.Table:
        col = t[payload_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.coalesce(col, pa.scalar(b"", col.type))
        if isinstance(col, pa.LargeBinaryArray):
            off = np.frombuffer(col.buffers()[1], np.int64,
                                len(col) + 1, col.offset * 8)
        else:
            off = np.frombuffer(col.buffers()[1], np.int32,
                                len(col) + 1, col.offset * 4)
        nbytes = int(off[-1] - off[0])
        data = (np.frombuffer(col.buffers()[2], np.uint8, nbytes,
                              int(off[0]))
                if nbytes else np.zeros(0, np.uint8))
        base = (off[:-1] - off[0]).astype(np.int64)
        lens = np.diff(off).astype(np.int64)
        out = np.full(t.num_rows, CONTENT_FALLBACK, dtype=object)
        undecided = np.ones(t.num_rows, bool)
        for name, magic in CONTENT_MAGICS:
            m = np.frombuffer(magic, np.uint8)
            cand = undecided & (lens >= len(m))
            if not cand.any():
                continue
            idx = base[cand][:, None] + np.arange(len(m))
            hit = (data[idx] == m).all(axis=1)
            rows = np.flatnonzero(cand)[hit]
            out[rows] = name
            undecided[rows] = False
        return pa.table({
            id_col: t[id_col],
            "content_type": pa.array(out, pa.string()),
        })

    return ds.map_batches(f, batch_format="pyarrow")
