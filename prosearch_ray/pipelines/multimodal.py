"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decoded/feature-extracted by an actor-pool ``map_batches`` stage.

The image/audio codec libraries are not available in this environment, so the
DECODE KERNEL IS A STUB — ``FakeDecoder`` derives deterministic
pseudo-metadata (width/height/feature vector) from the payload bytes, and
``decode_media`` raises ``NotImplementedError`` unless the stub is explicitly
requested.  Everything around the kernel — schema, binary Arrow columns,
actor signature, batch sizing for large payloads, output layout — is real and
tested, so swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

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

    ``use_stub=False`` (the default) raises: real codecs are not available in
    this environment; pass ``use_stub=True`` for the deterministic fake."""
    if not use_stub:
        raise NotImplementedError(
            "media codecs (PIL/librosa/ffmpeg) are not installed in this "
            "environment; pass use_stub=True for the deterministic stub")
    return ds.map_batches(FakeDecoder, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


def media_features(sf_dir: str) -> "rd.Dataset":
    """End-to-end multimodal pipeline on the stub decoder: synthesize binary
    payloads -> actor-pool decode -> typed feature rows."""
    return decode_media(synthesize_media(sf_dir), use_stub=True)
