"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as Arrow ``binary`` columns
with a ``media_type`` and metadata columns. Decode / resize /
feature-extract / frame-sample are **actor-pool** ``map_batches`` stages:
codec state initialises once per actor in ``__init__``, work happens per
batch, and ``batch_size`` must stay small because each row may carry
megabytes (see ``recommended_batch_size``).

The heavyweight image/audio libraries are not in this container, so
the codec layer is pluggable: if PIL/libav were importable they would
be used; natively the engine decodes binary PNM (P5/P6), WAV, and
baseline JPEG for REAL (ops/jpeg.py — pure-numpy Huffman + IDCT,
ground-truth-tested against DC-only fixtures), plus the synthetic
``FAKEIMG`` payloads produced by :func:`attach_payloads`. PNG and
progressive JPEG still raise ``NotImplementedError`` cleanly. The
Ray-side plumbing — schemas, actor signatures, batch sizing, output
layout — is identical across codecs.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

import ray.data

from rdf_mapper_ray.ops.readers import read_table

_MAGIC = b"FAKEIMG0"


def recommended_batch_size(mean_payload_bytes: int,
                           target_batch_bytes: int = 64 << 20) -> int:
    """Size batches so batch x concurrency fits in a worker heap."""
    return max(1, target_batch_bytes // max(1, mean_payload_bytes))


def _fake_payload(text: str) -> bytes:
    """Deterministic synthetic 'image': 8-byte magic + packed (w, h) +
    pseudo-pixel bytes derived from the text."""
    n = len(text)
    w = 16 + n % 101
    h = 16 + (n * 7) % 101
    body = hashlib.sha256(text.encode()).digest()
    reps = (w * h) // len(body) + 1
    return _MAGIC + struct.pack("<II", w, h) + (body * reps)[: w * h]


def _jpeg_payload(text: str) -> bytes:
    """Deterministic REAL grayscale baseline JPEG with the same dim
    formula as _fake_payload: per-block constants from sha256(text),
    DC-only encoded (ops/jpeg.py) so decode is pixel-exact."""
    from rdf_mapper_ray.ops.jpeg import encode_gray_dc
    n = len(text)
    w = 16 + n % 101
    h = 16 + (n * 7) % 101
    by, bx = -(-h // 8), -(-w // 8)
    seed = hashlib.sha256(text.encode()).digest()
    reps = (by * bx) // len(seed) + 1
    raw = np.frombuffer((seed * reps)[:by * bx], dtype=np.uint8)
    ks = raw.astype(np.int64) - 128
    return encode_gray_dc(w, h, ks.reshape(by, bx))


def attach_payloads(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """documents batch -> (item_id, media_type, payload) batch.
    Every 7th doc (id % 7 == 3) carries a REAL baseline JPEG instead
    of the synthetic FAKEIMG, so the decode stages exercise the
    genuine codec path in every pipeline run; both payload kinds obey
    the same (width, height) = f(len(text)) formula the SQL oracles
    replay."""
    texts = batch.column(text_col).to_pylist()
    ids = batch.column(id_col).to_pylist()
    payloads, kinds = [], []
    for i, t in zip(ids, texts):
        if int(i) % 7 == 3:
            payloads.append(_jpeg_payload(t or ""))
            kinds.append("image/jpeg")
        else:
            payloads.append(_fake_payload(t or ""))
            kinds.append("image/x-fake")
    return pa.Table.from_pydict({
        "item_id": batch.column(id_col),
        "media_type": pa.array(kinds, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
    })


def multimodal_dataset(sf_dir: str) -> "ray.data.Dataset":
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return ds.map_batches(attach_payloads, batch_format="pyarrow")


class _FakeCodec:
    """Deterministic stand-in codec for the synthetic FAKEIMG payloads."""

    def decode(self, payload: bytes) -> tuple[int, int, bytes]:
        w, h = struct.unpack("<II", payload[8:16])
        return w, h, payload[16:16 + w * h]


class _PNMCodec:
    """REAL decoder for binary PNM images (P6 RGB / P5 grayscale) —
    pure header parsing + raw sample bytes, no external libraries.
    Returns (width, height, samples): 3 bytes/pixel for P6, 1 for P5."""

    def decode(self, payload: bytes) -> tuple[int, int, bytes]:
        magic = payload[:2]
        pos = 2
        fields: list[int] = []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos:pos + 1].isspace():
                pos += 1
            if payload[pos:pos + 1] == b"#":        # comment line
                pos = payload.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1                                    # single WS after maxval
        w, h, maxval = fields
        if maxval > 255:
            raise NotImplementedError("16-bit PNM not supported")
        depth = 3 if magic == b"P6" else 1
        return w, h, payload[pos:pos + w * h * depth]


class _JPEGCodec:
    """REAL baseline-JPEG decoder (ops/jpeg.py — pure numpy Huffman +
    IDCT, grayscale and YCbCr, restart markers). Progressive JPEG
    still refuses cleanly."""

    def __init__(self) -> None:
        from rdf_mapper_ray.ops.jpeg import JPEGDecoder
        self._dec = JPEGDecoder()

    def decode(self, payload: bytes) -> tuple[int, int, bytes]:
        return self._dec.decode(payload)


class _Codec:
    """Magic-byte dispatch: FAKEIMG (synthetic), binary PNM (real),
    baseline JPEG (real, ops/jpeg.py); PNG/progressive-JPEG/...
    raise until PIL exists here."""

    def __init__(self) -> None:
        self._fake = _FakeCodec()
        self._pnm = _PNMCodec()
        self._jpeg = _JPEGCodec()

    def decode(self, payload: bytes) -> tuple[int, int, bytes]:
        if payload[:8] == _MAGIC:
            return self._fake.decode(payload)
        if payload[:2] in (b"P5", b"P6"):
            return self._pnm.decode(payload)
        if payload[:2] == b"\xff\xd8":
            return self._jpeg.decode(payload)
        raise NotImplementedError(
            "decoding this format requires PIL, which is not available "
            "in this environment; FAKEIMG, binary PNM (P5/P6) and "
            "baseline JPEG are supported natively")


def _load_codec():
    try:  # pragma: no cover - PIL not in this container
        import PIL.Image  # noqa: F401
        raise NotImplementedError(
            "PIL backend plumbing not implemented in this round")
    except ImportError:
        return _Codec()


class DecodeImage:
    """Actor-pool stage: payload -> (item_id, width, height, n_pixels).

    Codec loads once per actor (``__init__``); pass
    ``concurrency=N, batch_size=recommended_batch_size(...)`` to
    ``map_batches``.
    """

    def __init__(self) -> None:
        self.codec = _load_codec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, npx = [], [], [], []
        for i, payload in zip(batch.column("item_id").to_pylist(),
                              batch.column("payload").to_pylist()):
            w, h, pixels = self.codec.decode(payload)
            ids.append(i)
            ws.append(w)
            hs.append(h)
            npx.append(len(pixels))
        return pa.Table.from_pydict({
            "item_id": pa.array(ids, type=pa.int64()),
            "width": pa.array(ws, type=pa.int64()),
            "height": pa.array(hs, type=pa.int64()),
            "n_pixels": pa.array(npx, type=pa.int64()),
        })


class ImageFeatures:
    """Actor-pool stage: payload -> 8-bin byte-histogram feature vector
    (the deterministic stand-in for a CNN embedding; batched numpy)."""

    def __init__(self, bins: int = 8) -> None:
        self.codec = _load_codec()
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column("payload").to_pylist():
            _w, _h, pixels = self.codec.decode(payload)
            arr = np.frombuffer(pixels, dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=self.bins, range=(0, 256))
            feats.append((hist / max(1, len(arr))).astype(np.float32))
        return pa.Table.from_pydict({
            "item_id": batch.column("item_id"),
            "feature": pa.array([f.tolist() for f in feats],
                                type=pa.list_(pa.float32())),
        })


class ResizePlan:
    """payload metadata -> scaled dims, preserving aspect ratio (integer
    math so the oracle is exact). A real backend would also emit resized
    bytes; the stub emits the plan the Ray pipeline would execute."""

    def __init__(self, max_side: int = 64) -> None:
        self.codec = _load_codec()
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ows, ohs, nws, nhs = [], [], [], [], []
        for i, payload in zip(batch.column("item_id").to_pylist(),
                              batch.column("payload").to_pylist()):
            w, h, _ = self.codec.decode(payload)
            m = max(w, h)
            if m <= self.max_side:
                nw, nh = w, h
            else:
                nw = w * self.max_side // m
                nh = h * self.max_side // m
            ids.append(i)
            ows.append(w)
            ohs.append(h)
            nws.append(nw)
            nhs.append(nh)
        return pa.Table.from_pydict({
            "item_id": pa.array(ids, type=pa.int64()),
            "width": pa.array(ows, type=pa.int64()),
            "height": pa.array(ohs, type=pa.int64()),
            "new_width": pa.array(nws, type=pa.int64()),
            "new_height": pa.array(nhs, type=pa.int64()),
        })


class ResizeExec:
    """REAL resize executor — upgrades ResizePlan from metadata to
    pixels for the natively-decodable formats: decode (FAKEIMG
    grayscale grid or binary PNM P5/P6), nearest-neighbor resample with
    ONE numpy fancy-index per image (no per-pixel Python), re-encode as
    binary PNM. Actor-pool stage: the codec constructs once per actor;
    size batches with recommended_batch_size so payload bytes ×
    concurrency fit the worker heap. PIL-only formats keep refusing
    cleanly (same contract as DecodeImage)."""

    def __init__(self, max_side: int = 64) -> None:
        self.codec = _load_codec()
        self.max_side = max_side

    def _resize(self, w: int, h: int, samples: bytes
                ) -> tuple[int, int, int, bytes]:
        depth = 3 if len(samples) == 3 * w * h else 1
        m = max(w, h)
        if m <= self.max_side:
            nw, nh = w, h
        else:
            nw = max(1, w * self.max_side // m)
            nh = max(1, h * self.max_side // m)
        a = np.frombuffer(samples, dtype=np.uint8)
        a = a[: w * h * depth].reshape(h, w, depth)
        rows = (np.arange(nh) * h) // nh
        cols = (np.arange(nw) * w) // nw
        out = a[rows[:, None], cols[None, :], :]
        return nw, nh, depth, out.tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nws, nhs, payloads = [], [], [], []
        for i, payload in zip(batch.column("item_id").to_pylist(),
                              batch.column("payload").to_pylist()):
            w, h, samples = self.codec.decode(payload)
            nw, nh, depth, body = self._resize(w, h, samples)
            magic = b"P6" if depth == 3 else b"P5"
            header = b"%s\n%d %d\n255\n" % (magic, nw, nh)
            ids.append(i)
            nws.append(nw)
            nhs.append(nh)
            payloads.append(header + body)
        return pa.Table.from_pydict({
            "item_id": pa.array(ids, type=pa.int64()),
            "new_width": pa.array(nws, type=pa.int64()),
            "new_height": pa.array(nhs, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        })


class FrameSample:
    """'video' payload -> every k-th 1 KiB chunk as a frame row
    (flat output: one row per sampled frame — fan-out inside the batch)."""

    def __init__(self, chunk: int = 1024, every: int = 4) -> None:
        self.chunk = chunk
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for i, payload in zip(batch.column("item_id").to_pylist(),
                              batch.column("payload").to_pylist()):
            n_chunks = (len(payload) + self.chunk - 1) // self.chunk
            for c in range(0, n_chunks, self.every):
                ids.append(i)
                idxs.append(c)
                frames.append(payload[c * self.chunk:(c + 1) * self.chunk])
        return pa.Table.from_pydict({
            "item_id": pa.array(ids, type=pa.int64()),
            "frame_index": pa.array(idxs, type=pa.int64()),
            "frame": pa.array(frames, type=pa.binary()),
        })


class DecodeAudio:
    """Actor-pool stage: REAL WAV decoding via the stdlib ``wave``
    module — no external audio libraries needed. payload →
    (item_id, channels, sample_rate, n_frames, duration_ms, rms).

    ``rms`` is the root-mean-square amplitude of the 16-bit samples
    (the baseline loudness feature a filtering pipeline thresholds on),
    computed with one numpy pass per payload."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave
        ids, chs, rates, frames, durs, rms = [], [], [], [], [], []
        for i, payload in zip(batch.column("item_id").to_pylist(),
                              batch.column("payload").to_pylist()):
            with wave.open(io.BytesIO(payload)) as w:
                n = w.getnframes()
                rate = w.getframerate()
                width = w.getsampwidth()
                channels = w.getnchannels()
                raw = w.readframes(n)
            if width == 2:
                samples = np.frombuffer(raw, dtype=np.int16)
            elif width == 1:
                samples = np.frombuffer(raw, dtype=np.uint8)
                samples = samples.astype(np.int16) - 128
            else:
                raise NotImplementedError(f"{width * 8}-bit WAV")
            ids.append(i)
            chs.append(channels)
            rates.append(rate)
            frames.append(n)
            durs.append(n * 1000 // max(1, rate))
            x = samples.astype(np.float64)
            rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
        return pa.Table.from_pydict({
            "item_id": pa.array(ids, type=pa.int64()),
            "channels": pa.array(chs, type=pa.int64()),
            "sample_rate": pa.array(rates, type=pa.int64()),
            "n_frames": pa.array(frames, type=pa.int64()),
            "duration_ms": pa.array(durs, type=pa.int64()),
            "rms": pa.array(rms, type=pa.float64()),
        })


def decode_dims(sf_dir: str, concurrency: int = 4) -> "ray.data.Dataset":
    return multimodal_dataset(sf_dir).map_batches(
        DecodeImage, batch_format="pyarrow",
        batch_size=recommended_batch_size(16 << 10),
        concurrency=concurrency)


def resize_plan(sf_dir: str, concurrency: int = 4) -> "ray.data.Dataset":
    return multimodal_dataset(sf_dir).map_batches(
        ResizePlan, batch_format="pyarrow",
        batch_size=recommended_batch_size(16 << 10),
        concurrency=concurrency)


def image_features(sf_dir: str, concurrency: int = 4) -> "ray.data.Dataset":
    return multimodal_dataset(sf_dir).map_batches(
        ImageFeatures, batch_format="pyarrow",
        batch_size=recommended_batch_size(16 << 10),
        concurrency=concurrency)


# dims are pure functions of n_chars=length(text): SQL-checkable plumbing
DECODE_ORACLE_SQL = """
SELECT doc_id AS item_id,
       16 + length(text) % 101 AS width,
       16 + (length(text) * 7) % 101 AS height,
       (16 + length(text) % 101) * (16 + (length(text) * 7) % 101)
         AS n_pixels
FROM documents
ORDER BY item_id
"""

RESIZE_ORACLE_SQL = """
WITH d AS (
  SELECT doc_id AS item_id,
         16 + length(text) % 101 AS width,
         16 + (length(text) * 7) % 101 AS height
  FROM documents
),
m AS (
  SELECT *, greatest(width, height) AS mx FROM d
)
SELECT item_id, width, height,
       CASE WHEN mx <= 64 THEN width ELSE width * 64 // mx END AS new_width,
       CASE WHEN mx <= 64 THEN height ELSE height * 64 // mx END AS new_height
FROM m
ORDER BY item_id
"""


class AudioSpectral:
    """REAL spectral features from WAV payloads — numpy's FFT is all it
    takes, no scipy/librosa: frames of ``n_fft`` samples (hann window),
    averaged power spectrum, then (spectral centroid in Hz, zero-
    crossing rate, ``n_bands`` log-spaced band energies) — the classic
    audio-quality / content-filter feature row. One rfft per payload's
    frame matrix (vectorized over frames), channels averaged to mono."""

    def __init__(self, n_fft: int = 256, n_bands: int = 8) -> None:
        self.n_fft = n_fft
        self.n_bands = n_bands
        self._window = np.hanning(n_fft)

    def _features(self, samples: np.ndarray, rate: int, channels: int
                  ) -> tuple[float, float, list]:
        x = samples.astype(np.float64)
        if channels > 1:
            x = x[: len(x) // channels * channels] \
                .reshape(-1, channels).mean(axis=1)
        if len(x) == 0:
            return 0.0, 0.0, [0.0] * self.n_bands
        zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) \
            if len(x) > 1 else 0.0
        n = (len(x) // self.n_fft) * self.n_fft
        if n == 0:                   # shorter than one frame: pad one
            frames = np.zeros((1, self.n_fft))
            frames[0, : len(x)] = x
        else:
            frames = x[:n].reshape(-1, self.n_fft)
        spec = np.abs(np.fft.rfft(frames * self._window, axis=1)) ** 2
        p = spec.mean(axis=0)
        freqs = np.fft.rfftfreq(self.n_fft, d=1.0 / max(1, rate))
        tot = p.sum()
        centroid = float((freqs * p).sum() / tot) if tot > 0 else 0.0
        # log-spaced band edges over (first bin, nyquist]
        edges = np.geomspace(freqs[1] if len(freqs) > 1 else 1.0,
                             freqs[-1], self.n_bands + 1)
        idx = np.searchsorted(freqs, edges)
        bands = [float(p[idx[i]:max(idx[i] + 1, idx[i + 1])].sum())
                 for i in range(self.n_bands)]
        return centroid, zcr, bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave
        ids, cents, zcrs, bands = [], [], [], []
        for i, payload in zip(batch.column("item_id").to_pylist(),
                              batch.column("payload").to_pylist()):
            with wave.open(io.BytesIO(payload)) as w:
                rate = w.getframerate()
                width = w.getsampwidth()
                channels = w.getnchannels()
                raw = w.readframes(w.getnframes())
            if width == 2:
                samples = np.frombuffer(raw, dtype=np.int16)
            elif width == 1:
                samples = (np.frombuffer(raw, dtype=np.uint8)
                           .astype(np.int16) - 128)
            else:
                raise NotImplementedError(f"{width * 8}-bit WAV")
            c, z, b = self._features(samples, rate, channels)
            ids.append(i)
            cents.append(c)
            zcrs.append(z)
            bands.append(b)
        return pa.Table.from_pydict({
            "item_id": pa.array(ids, type=pa.int64()),
            "spec_centroid_hz": pa.array(cents, type=pa.float64()),
            "zcr": pa.array(zcrs, type=pa.float64()),
            "band_energy": pa.array(bands,
                                    type=pa.list_(pa.float64())),
        })


# --- video frame-sampling plan ------------------------------------------------


def frame_sample_plan(ds: "ray.data.Dataset", id_col: str,
                      duration_col: str, stride_ms: int = 500
                      ) -> "ray.data.Dataset":
    """Frame-sampling PLAN for video rows: one output row per sampled
    frame at t = 0, stride, 2·stride, … < duration_ms. This is the
    fan-out half of a decode stage — the plan rows are what an
    actor-pool decoder consumes (each task then seeks exactly its
    (item, t) pairs, so decode parallelism is per-frame, not
    per-video, and one 10-hour video cannot straggle a whole block).

    Map-side only, zero exchanges; the expansion is vectorized
    (repeat + arange-minus-offsets, no Python loop).
    -> (id, frame_idx, t_ms)."""
    def expand(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        dur = batch.column(duration_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        counts = np.maximum(
            (dur + stride_ms - 1) // stride_ms, 0).astype(np.int64)
        total = int(counts.sum())
        rep = np.repeat(np.arange(len(ids)), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        idx = np.arange(total, dtype=np.int64) - starts[rep]
        return pa.Table.from_pydict({
            id_col: pa.array(ids[rep].astype(np.int64)),
            "frame_idx": pa.array(idx),
            "t_ms": pa.array(idx * stride_ms),
        })

    return ds.map_batches(expand, batch_format="pyarrow")


def mm_frame_sample_query(sf_dir: str, stride_ms: int = 500):
    """Synthetic per-document video durations (derived
    deterministically from n_chars, 1-20 s) -> sampled frame grid."""
    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "n_chars"])

    def meta(batch: pa.Table) -> pa.Table:
        n = batch.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "duration_ms": pa.array((n % 20 + 1) * 1000),
        })

    return frame_sample_plan(ds.map_batches(meta,
                                            batch_format="pyarrow"),
                             "doc_id", "duration_ms",
                             stride_ms=stride_ms)


def mm_frame_sample_oracle_sql(stride_ms: int = 500) -> str:
    # bounded uncorrelated grid + range join: DuckDB 1.0 has no
    # correlated generate_series (max duration 20 s -> 40 frames)
    return f"""
WITH meta AS (
  SELECT doc_id, (n_chars % 20 + 1) * 1000 AS duration_ms
  FROM documents
),
grid AS (SELECT i FROM range(0, 40) t(i))
SELECT doc_id, i AS frame_idx,
       i * {stride_ms} AS t_ms
FROM meta JOIN grid ON i * {stride_ms} < duration_ms
ORDER BY doc_id, frame_idx
"""
