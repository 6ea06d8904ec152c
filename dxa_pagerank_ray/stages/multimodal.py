"""Multimodal (image / audio / video) columns as opaque ``binary``.

Large-scale training-data pipelines carry media next to text: here the
convention is one Arrow ``binary`` column per payload plus typed
metadata columns, processed by **actor-pool ``map_batches`` stages**
with small batch sizes (a batch x concurrency of multi-MB payloads must
fit the worker heap — SURVEY.md §4 memory pressure).  The reference has
no media path; this follows the same stage shape as its stateful
superstep workers (actor state built once in ``__init__``,
``RunLumpPrRoundTask.java:57-65`` analogue).

The image/audio codec libraries are not installed in this environment,
so the *codec* is stubbed two ways, clearly marked:

- ``codec="real"``: raises ``NotImplementedError`` unless PIL/soundfile
  import succeeds (gated import — the production path);
- ``codec="fake"`` (default): a deterministic in-repo container format
  (``FAKEIMG1``/``FAKEAUD1``/``FAKEVID1`` headers, see ``encode_*``)
  whose decode is pure numpy — the Ray-side plumbing (schema, batch
  size, actor signature, output layout) is real and tested.

Payload container formats (big-endian):

    FAKEIMG1 | u16 width | u16 height | width*height u8 pixels (gray)
    FAKEAUD1 | u32 sample_rate | u32 n_samples | n i16 samples
    FAKEVID1 | u16 n_frames | n_frames x FAKEIMG1 blocks
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

_IMG_MAGIC = b"FAKEIMG1"
_AUD_MAGIC = b"FAKEAUD1"
_VID_MAGIC = b"FAKEVID1"


def _pseudo_bytes(key: str, n: int) -> bytes:
    """Deterministic byte stream from a key (blake2b counter mode)."""
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.blake2b(f"{key}:{i}".encode(), digest_size=64).digest()
        i += 1
    return bytes(out[:n])


# ---------------------------------------------------------------- encoders
# (fixture-side: build deterministic payloads for tests/benchmarks)

def encode_fake_image(key: str, width: int, height: int) -> bytes:
    px = _pseudo_bytes(f"img:{key}", width * height)
    return _IMG_MAGIC + struct.pack(">HH", width, height) + px


def encode_fake_audio(key: str, sample_rate: int, n_samples: int) -> bytes:
    raw = _pseudo_bytes(f"aud:{key}", 2 * n_samples)
    return _AUD_MAGIC + struct.pack(">II", sample_rate, n_samples) + raw


def encode_fake_video(key: str, n_frames: int, width: int, height: int) -> bytes:
    frames = b"".join(
        encode_fake_image(f"{key}:f{i}", width, height) for i in range(n_frames)
    )
    return _VID_MAGIC + struct.pack(">H", n_frames) + frames


def _row_params(media_id: int, seed: int) -> tuple[int, int, int, int, int]:
    """Per-row fixture parameters derived from the id alone (hash
    counter, not an RNG *sequence*) so any id subset — any partitioning
    of a distributed generator — produces identical rows."""
    d = hashlib.blake2b(f"media:{seed}:{media_id}".encode(),
                        digest_size=16).digest()
    width = 8 + d[0] % 25                      # 8..32
    height = 8 + d[1] % 25
    rate = 8000 if d[2] % 2 == 0 else 16000
    n_samples = 64 + (d[3] | (d[4] << 8)) % 193  # 64..256
    n_frames = 2 + d[5] % 4                    # 2..5
    return width, height, rate, n_samples, n_frames


def media_rows(ids: np.ndarray, seed: int = 42) -> pa.Table:
    """Fixture rows for an arbitrary id array (partition-independent)."""
    imgs, auds, vids = [], [], []
    for i in np.asarray(ids, dtype=np.int64).tolist():
        w, h, rate, ns, nf = _row_params(i, seed)
        imgs.append(encode_fake_image(f"{seed}:{i}", w, h))
        auds.append(encode_fake_audio(f"{seed}:{i}", rate, ns))
        vids.append(encode_fake_video(f"{seed}:{i}", nf, 8, 8))
    return pa.table(
        {
            "media_id": pa.array(np.asarray(ids, dtype=np.int64), pa.int64()),
            "image": pa.array(imgs, pa.binary()),
            "audio": pa.array(auds, pa.binary()),
            "video": pa.array(vids, pa.binary()),
        }
    )


def media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media fixture: images, audio, and tiny videos keyed
    by ``media_id`` (sizes vary per row so batch-size math is exercised)."""
    return media_rows(np.arange(n, dtype=np.int64), seed)


def write_media_parquet(path: str, n: int, seed: int = 42,
                        num_blocks: int = 8) -> None:
    """Distributed on-disk media fixture: each task generates its own
    id range (``media_rows`` is partition-independent) and the sink is
    one parquet file per block — the resumable-output layout every
    other source in this repo uses.  This replaces the driver-built
    in-memory table as the entry-point media source."""
    import ray.data as rd

    def gen(batch: dict) -> pa.Table:
        return media_rows(batch["id"], seed)

    rd.range(n, override_num_blocks=num_blocks).map_batches(
        gen, batch_format="numpy"
    ).write_parquet(path)


# ---------------------------------------------------------------- decoders

def _decode_fake_image(buf: bytes) -> np.ndarray:
    if buf[:8] != _IMG_MAGIC:
        raise ValueError("not a FAKEIMG1 payload")
    w, h = struct.unpack(">HH", buf[8:12])
    return np.frombuffer(buf, dtype=np.uint8, count=w * h, offset=12).reshape(h, w)


def _decode_fake_audio(buf: bytes) -> tuple[int, np.ndarray]:
    if buf[:8] != _AUD_MAGIC:
        raise ValueError("not a FAKEAUD1 payload")
    rate, n = struct.unpack(">II", buf[8:16])
    raw = np.frombuffer(buf, dtype=">i2", count=n, offset=16)
    return rate, raw.astype(np.int16)


def _iter_fake_video(buf: bytes):
    if buf[:8] != _VID_MAGIC:
        raise ValueError("not a FAKEVID1 payload")
    (n_frames,) = struct.unpack(">H", buf[8:10])
    off = 10
    for _ in range(n_frames):
        w, h = struct.unpack(">HH", buf[off + 8 : off + 12])
        end = off + 12 + w * h
        yield buf[off:end]
        off = end


class ImageDecoder:
    """Actor-pool stage: binary image column -> shape + feature columns.

    ``codec="real"`` would hold the PIL handle built once per actor; the
    library is absent here, so it is a clearly-marked stub
    (NotImplementedError) and ``codec="fake"`` decodes the deterministic
    container instead.
    """

    def __init__(self, media_col: str = "image", id_col: str = "media_id",
                 codec: str = "fake") -> None:
        self.media_col, self.id_col = media_col, id_col
        self.codec = codec
        if codec == "real":
            try:
                from PIL import Image  # noqa: F401  (gated import)
            except ImportError as e:  # pragma: no cover - env has no PIL
                raise NotImplementedError(
                    "real image codec requires PIL, which is not installed; "
                    "use codec='fake' (deterministic stub)"
                ) from e
        elif codec != "fake":
            raise ValueError(f"unknown codec {codec!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, means, stds = [], [], [], []
        for buf in batch[self.media_col]:
            img = _decode_fake_image(buf.as_py())
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            means.append(float(img.mean()))
            stds.append(float(img.std()))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "mean_px": pa.array(means, pa.float64()),
                "std_px": pa.array(stds, pa.float64()),
            }
        )


class ImageResizer:
    """Actor-pool stage: nearest-neighbor resize to a fixed size,
    re-encoded into the same container (numpy index-grid resize — the
    real stage would call the codec's resampler)."""

    def __init__(self, out_w: int = 16, out_h: int = 16,
                 media_col: str = "image", id_col: str = "media_id") -> None:
        self.out_w, self.out_h = out_w, out_h
        self.media_col, self.id_col = media_col, id_col
        # index grids depend only on output size -> precompute per actor
        self._yi = {}

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape
        key = (h, w)
        if key not in self._yi:
            self._yi[key] = (
                (np.arange(self.out_h) * h // self.out_h)[:, None],
                (np.arange(self.out_w) * w // self.out_w)[None, :],
            )
        yi, xi = self._yi[key]
        return img[yi, xi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for i, buf in enumerate(batch[self.media_col]):
            img = self._resize(_decode_fake_image(buf.as_py()))
            out.append(
                _IMG_MAGIC + struct.pack(">HH", self.out_w, self.out_h)
                + img.astype(np.uint8).tobytes()
            )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "image": pa.array(out, pa.binary()),
                "width": pa.array([self.out_w] * len(out), pa.int32()),
                "height": pa.array([self.out_h] * len(out), pa.int32()),
            }
        )


class AudioFeatures:
    """Actor-pool stage: binary audio -> (duration, rms, zero-crossings)."""

    def __init__(self, media_col: str = "audio", id_col: str = "media_id",
                 codec: str = "fake") -> None:
        self.media_col, self.id_col = media_col, id_col
        if codec == "real":
            try:
                import soundfile  # noqa: F401  (gated import)
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "real audio codec requires soundfile; use codec='fake'"
                ) from e
        elif codec != "fake":
            raise ValueError(f"unknown codec {codec!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, rmss, zcs = [], [], []
        for buf in batch[self.media_col]:
            rate, samples = _decode_fake_audio(buf.as_py())
            x = samples.astype(np.float64)
            durs.append(len(x) / rate)
            rmss.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
            zcs.append(int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "duration_s": pa.array(durs, pa.float64()),
                "rms": pa.array(rmss, pa.float64()),
                "zero_crossings": pa.array(zcs, pa.int64()),
            }
        )


class FrameSampler:
    """Actor-pool stage: video -> every k-th frame as its own row
    (``(media_id, frame_idx, image)``) — row-expanding map_batches."""

    def __init__(self, every_k: int = 2, media_col: str = "video",
                 id_col: str = "media_id") -> None:
        self.k = every_k
        self.media_col, self.id_col = media_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, buf in zip(batch[self.id_col], batch[self.media_col]):
            for i, frame in enumerate(_iter_fake_video(buf.as_py())):
                if i % self.k == 0:
                    ids.append(mid.as_py())
                    idxs.append(i)
                    frames.append(frame)
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "image": pa.array(frames, pa.binary()),
            }
        )


# ------------------------------------------------------------ Ray wiring
# Small batch sizes: payloads are the heavy axis, not row count.

def decode_images(ds, concurrency: int = 4, batch_size: int = 64, **kw):
    return ds.map_batches(ImageDecoder, fn_constructor_kwargs=kw,
                          batch_format="pyarrow", concurrency=(1, concurrency),
                          batch_size=batch_size)


def resize_images(ds, out_w: int = 16, out_h: int = 16,
                  concurrency: int = 4, batch_size: int = 64, **kw):
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs=dict(out_w=out_w, out_h=out_h, **kw),
        batch_format="pyarrow", concurrency=(1, concurrency), batch_size=batch_size)


def audio_features(ds, concurrency: int = 4, batch_size: int = 64, **kw):
    return ds.map_batches(AudioFeatures, fn_constructor_kwargs=kw,
                          batch_format="pyarrow", concurrency=(1, concurrency),
                          batch_size=batch_size)


def sample_frames(ds, every_k: int = 2, concurrency: int = 4,
                  batch_size: int = 32, **kw):
    return ds.map_batches(
        FrameSampler, fn_constructor_kwargs=dict(every_k=every_k, **kw),
        batch_format="pyarrow", concurrency=(1, concurrency), batch_size=batch_size)


# ---------------------------------------------------- sequential reference

def media_expected_tables(n: int, seed: int = 42,
                          every_k: int = 2) -> dict[str, pa.Table]:
    """Driver-oracle reference: the three media-query outputs computed
    SEQUENTIALLY on one in-memory batch (no Ray, no partitioning, no
    actor pool).  The per-row math is the stage classes' own ``__call__``
    — numpy row ops are bit-deterministic, so a DuckDB scan of these
    tables hash-matches the distributed run iff the fixture writer,
    batching, actor-pool execution and row expansion are all
    partition-independent (the plumbing the media family exists to
    test; content itself is additionally pinned by golden hashes in
    tests/test_multimodal.py)."""
    t = media_table(n, seed)
    decode = ImageDecoder()(t).sort_by("media_id")
    audio = AudioFeatures()(t).sort_by("media_id")
    frames = FrameSampler(every_k=every_k)(t)
    means = [float(_decode_fake_image(b.as_py()).mean())
             for b in frames["image"]]
    frame_stats = pa.table({
        "media_id": frames["media_id"],
        "frame_idx": frames["frame_idx"],
        "mean_px": pa.array(means, pa.float64()),
    }).sort_by([("media_id", "ascending"), ("frame_idx", "ascending")])
    return {"media_decode": decode, "media_audio_features": audio,
            "media_frame_sample": frame_stats}


def write_media_expected(path: str, n: int, seed: int = 42,
                         every_k: int = 2) -> None:
    """Materialize :func:`media_expected_tables` as one parquet file per
    query under ``path`` (driver-oracle side table)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    for name, tbl in media_expected_tables(n, seed, every_k).items():
        pq.write_table(tbl, os.path.join(path, f"{name}.parquet"))
