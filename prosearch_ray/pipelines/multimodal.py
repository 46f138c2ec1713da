"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
decoded / feature-extracted / resized / frame-sampled by actor-pool
``map_batches`` stages.

Two decode kernels:

* ``RealDecoder`` (the default) — REAL byte-level decoding of BMP, PNG
  (all five row filters), PCM WAV and the documented FRAMESEQ video
  container, implemented from the public specs in pure stdlib+numpy
  (``media_codec.py``; PIL/librosa/ffmpeg are not in this environment).
  ``synthesize_media_real`` generates genuinely-encoded payloads whose
  pixel/sample content follows a closed-form rule of ``doc_id``, so a SQL
  oracle can predict the decoded integer statistics EXACTLY — if the
  decoder mis-parses a single pixel, the oracle hash mismatches.
* ``FakeDecoder`` — the round-2 deterministic stub (md5 pseudo-metadata
  over utf-8 text payloads), kept for the ``media_features`` oracle entry
  and as the documented drop-in shape for codecs this container lacks
  (JPEG/MP3/MP4).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

from prosearch_ray.pipelines import media_codec as mc
from prosearch_ray.pipelines.common import read

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),        # image | audio | video
    ("payload", pa.binary()),     # opaque encoded bytes
    ("n_bytes", pa.int64()),
])


def synthesize_media(sf_dir: str) -> "rd.Dataset":
    """Deterministic fake media table derived from documents.text bytes —
    exercises binary-column flow without external data."""
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        payloads = [x.encode("utf-8") for x in t.column("text").to_pylist()]
        kinds = ["image" if i % 3 else "audio" for i in ids]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }, schema=MEDIA_SCHEMA)

    return docs.map_batches(fn, batch_format="pyarrow")


class FakeDecoder:
    """Actor-pool decode stage (stub kernel).

    Real deployment: replace ``_decode_one`` with PIL/librosa/ffmpeg; the
    actor signature, batch size guidance (small batches for MB-scale
    payloads) and output schema stay unchanged.
    """

    FEATURE_DIM = 8

    def __init__(self):
        self._ready = True  # real decoder: load codec/model once per actor

    def _decode_one(self, kind: str, payload: bytes):
        # md5 (not blake2b) so the stub's pseudo-metadata is reproducible
        # by the SQL oracle: digest bytes 0..7 == little-endian bytes of
        # DuckDB md5_number_upper
        h = hashlib.md5(payload).digest()
        width = 64 + h[0]
        height = 64 + h[1]
        feat = (np.frombuffer(h, dtype=np.uint8)[: self.FEATURE_DIM]
                .astype(np.float64) / 255.0)
        return width, height, feat

    def __call__(self, t: pa.Table) -> pa.Table:
        widths, heights, feats = [], [], []
        for kind, payload in zip(t.column("kind").to_pylist(),
                                 t.column("payload").to_pylist()):
            w, hgt, f = self._decode_one(kind, payload)
            widths.append(w)
            heights.append(hgt)
            feats.append(f.tolist())
        return pa.table({
            "media_id": t.column("media_id"),
            "kind": t.column("kind"),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "features": pa.array(feats, pa.list_(pa.float64())),
        })


def decode_media(ds: "rd.Dataset", *, use_stub: bool = False,
                 concurrency: int = 2, batch_size: int = 64) -> "rd.Dataset":
    """Decode/feature-extract a media Dataset via an actor pool.

    The default kernel is ``RealDecoder`` (real BMP/PNG/WAV/FRAMESEQ byte
    decoding); ``use_stub=True`` selects the md5 pseudo-metadata stub (the
    drop-in shape for codecs this container lacks)."""
    cls = FakeDecoder if use_stub else RealDecoder
    return ds.map_batches(cls, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


def media_features(sf_dir: str) -> "rd.Dataset":
    """End-to-end multimodal pipeline on the stub decoder: synthesize binary
    payloads -> actor-pool decode -> typed feature rows."""
    return decode_media(synthesize_media(sf_dir), use_stub=True)


# --------------------------------------------------------------------------
# Real decode path: genuinely-encoded payloads, closed-form oracle
# --------------------------------------------------------------------------

_WAV_RATE = 8000


def _media_params(doc_id: int) -> dict:
    """The deterministic synthesis rule (shared by the SQL oracle): kind
    cycles wav/bmp/png/frameseq; image channels hold an x-gradient
    ``(base + frame + x) % 256`` so decoded stats depend on pixel ORDER,
    not just dimensions; audio alternates +amp/-amp."""
    return {
        "kix": doc_id % 4,
        "w": 8 * (2 + doc_id % 5),
        "h": 8 * (2 + (doc_id // 5) % 5),
        "r": doc_id % 256,
        "g": (doc_id * 7) % 256,
        "b": (doc_id * 13) % 256,
        "nframes": 2 + doc_id % 6,
        "nsamples": 500 + (doc_id * 11) % 4000,
        "amp": 1 + doc_id % 30000,
    }


def _gradient_frame(p: dict, frame: int) -> np.ndarray:
    x = np.arange(p["w"], dtype=np.int64)
    chans = [((c + frame + x) % 256).astype(np.uint8)
             for c in (p["r"], p["g"], p["b"])]
    row = np.stack(chans, axis=1)               # (W, 3)
    return np.broadcast_to(row, (p["h"], p["w"], 3)).copy()


def _encode_payload(doc_id: int) -> tuple:
    p = _media_params(doc_id)
    k = p["kix"]
    if k == 0:
        s = np.full(p["nsamples"], p["amp"], np.int64)
        s[1::2] = -p["amp"]
        return "audio", mc.encode_wav(s.astype(np.int16), _WAV_RATE)
    if k == 1:
        return "image", mc.encode_bmp(_gradient_frame(p, 0))
    if k == 2:
        return "image", mc.encode_png(_gradient_frame(p, 0))
    frames = [_gradient_frame(p, f) for f in range(p["nframes"])]
    return "video", mc.encode_frameseq(frames)


def synthesize_media_real(sf_dir: str) -> "rd.Dataset":
    """Deterministic media table with GENUINELY ENCODED payloads (BMP, PNG
    with cycling row filters, PCM WAV, FRAMESEQ) — no external data."""
    docs = read(sf_dir, "documents", columns=["doc_id"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        kinds, payloads = [], []
        for i in ids:
            kind, pl = _encode_payload(int(i))
            kinds.append(kind)
            payloads.append(pl)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }, schema=MEDIA_SCHEMA)

    return docs.map_batches(fn, batch_format="pyarrow")


_DECODE_SCHEMA = pa.schema([
    ("media_id", pa.int64()), ("codec", pa.string()),
    ("width", pa.int64()), ("height", pa.int64()),
    ("n_frames", pa.int64()), ("sample_rate", pa.int64()),
    ("n_samples", pa.int64()), ("duration_ms", pa.int64()),
    ("pix_sum", pa.int64()), ("amp_max", pa.int64()),
])


class RealDecoder:
    """Actor-pool decode stage over real bytes: sniffs the container magic,
    parses headers, decodes pixels/samples, and emits exact integer
    statistics (``pix_sum`` = sum of every decoded channel byte across all
    frames; ``amp_max`` = max |sample|).  Payload-level work is numpy-
    vectorized; the per-row loop is inherent to per-payload decoding."""

    def __init__(self):
        self._sniff = mc.sniff_kind  # real deployment: load codecs once

    @staticmethod
    def _decode_one(payload: bytes) -> tuple:
        codec = mc.sniff_kind(payload)
        if codec == "wav":
            samples, rate, _ = mc.decode_wav(payload)
            n = len(samples)
            amp = int(np.abs(samples.astype(np.int64)).max()) if n else 0
            return (codec, 0, 0, 0, rate, n, n * 1000 // rate, 0, amp)
        if codec in ("bmp", "png"):
            arr = (mc.decode_bmp(payload) if codec == "bmp"
                   else mc.decode_png(payload))
            h, w, _ = arr.shape
            return (codec, w, h, 1, 0, 0, 0, int(arr.sum(dtype=np.int64)), 0)
        # frameseq: every frame decoded
        n = mc.frameseq_len(payload)
        tot, w, h = 0, 0, 0
        for _, fb in mc.iter_frameseq(payload):
            arr = mc.decode_bmp(fb)
            h, w, _ = arr.shape
            tot += int(arr.sum(dtype=np.int64))
        return (codec, w, h, n, 0, 0, 0, tot, 0)

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = [self._decode_one(pl.as_py())
                for pl in t.column("payload")]
        cols = list(zip(*rows)) if rows else [[]] * 9
        return pa.table({
            "media_id": t.column("media_id"),
            "codec": pa.array(cols[0], pa.string()),
            "width": pa.array(cols[1], pa.int64()),
            "height": pa.array(cols[2], pa.int64()),
            "n_frames": pa.array(cols[3], pa.int64()),
            "sample_rate": pa.array(cols[4], pa.int64()),
            "n_samples": pa.array(cols[5], pa.int64()),
            "duration_ms": pa.array(cols[6], pa.int64()),
            "pix_sum": pa.array(cols[7], pa.int64()),
            "amp_max": pa.array(cols[8], pa.int64()),
        }, schema=_DECODE_SCHEMA)


class MediaTransformer:
    """Actor-pool transform stage: images -> 2x block-mean resize; video ->
    sample every 2nd frame WITHOUT decoding skipped ones; audio -> 2x
    decimation.  Emits exact integer statistics of the TRANSFORMED media."""

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {k: [] for k in ("out_width", "out_height", "out_frames",
                               "out_samples", "out_pix_sum", "out_amp_max")}
        for pl in t.column("payload"):
            payload = pl.as_py()
            codec = mc.sniff_kind(payload)
            ow = oh = ofr = osm = ops = oam = 0
            if codec == "wav":
                samples, rate, _ = mc.decode_wav(payload)
                dec = samples[::2]
                osm = len(dec)
                oam = int(np.abs(dec.astype(np.int64)).max()) if osm else 0
            elif codec in ("bmp", "png"):
                arr = (mc.decode_bmp(payload) if codec == "bmp"
                       else mc.decode_png(payload))
                h, w, _ = arr.shape
                small = mc.resize_block_mean(arr, w // 2, h // 2)
                oh, ow, _ = small.shape
                ofr = 1
                ops = int(small.sum(dtype=np.int64))
            else:
                n = mc.frameseq_len(payload)
                ofr = (n + 1) // 2
                for _, fb in mc.iter_frameseq(payload, step=2):
                    arr = mc.decode_bmp(fb)
                    oh, ow, _ = arr.shape
                    ops += int(arr.sum(dtype=np.int64))
            for k, v in zip(out, (ow, oh, ofr, osm, ops, oam)):
                out[k].append(v)
        return pa.table({"media_id": t.column("media_id"),
                         **{k: pa.array(v, pa.int64())
                            for k, v in out.items()}})


def media_decode(sf_dir: str) -> "rd.Dataset":
    """Real end-to-end multimodal decode: synthesize encoded payloads ->
    actor-pool byte-level decode -> exact integer stats (SQL-oracled)."""
    return (synthesize_media_real(sf_dir)
            .map_batches(RealDecoder, batch_format="pyarrow",
                         batch_size=64, concurrency=2, num_cpus=1)
            .sort("media_id"))


def media_transform(sf_dir: str) -> "rd.Dataset":
    """Real multimodal transforms (resize / frame-sample / decimate) over
    encoded payloads, emitting exact transformed stats (SQL-oracled)."""
    return (synthesize_media_real(sf_dir)
            .map_batches(MediaTransformer, batch_format="pyarrow",
                         batch_size=64, concurrency=2, num_cpus=1)
            .sort("media_id"))
