"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``large_binary``
columns next to typed metadata (mime, width/height or sample_rate,
...). The decode/feature kernels that need codec libraries are STUBBED
— this container has no image/audio libs — behind clearly-marked
hooks: ``real=False`` (default) runs a deterministic fake decode (a
pure function of the payload bytes) so the Ray-side plumbing (schema,
actor-pool signature, batch sizing, output layout) is real and tested;
``real=True`` raises NotImplementedError where PIL/libsndfile calls
would go.

Batch sizing note: binary payloads dominate block size — stages default
to small ``batch_size`` (ray_guide: large binary rows need small
batches; raise target_max_block_size rather than splitting absurdly
small).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.large_binary()),
    ]
)


def media_from_documents(batch: pa.Table) -> pa.Table:
    """Derive a synthetic media table from documents (payload = utf-8
    bytes standing in for an encoded image; deterministic)."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "mime": pa.array(["image/fake" for _ in ids], pa.string()),
            "payload": pa.array([(t or "").encode() for t in texts], pa.large_binary()),
        }
    )


class ImageDecodeStage:
    """Actor-pool decode stage: payload -> (width, height, channels,
    feature vector). Deterministic fake unless real=True."""

    def __init__(self, real: bool = False, feat_dim: int = 16):
        self.real = real
        self.feat_dim = feat_dim

    def _decode_fake(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        digest = hashlib.blake2b(payload, digest_size=32).digest()
        width = 16 + digest[0] % 240
        height = 16 + digest[1] % 240
        feats = (
            np.frombuffer(
                hashlib.blake2b(payload, digest_size=self.feat_dim * 4).digest(),
                dtype=np.uint32,
            ).astype(np.float32)
            / np.float32(2**32)
        )
        return width, height, 3, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError(
                "real image decode requires PIL/opencv — not available in "
                "this environment; wire the codec call here"
            )
        ids, ws, hs, cs, feats = [], [], [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            w, h, c, f = self._decode_fake(payload or b"")
            ids.append(mid)
            ws.append(w)
            hs.append(h)
            cs.append(c)
            feats.append(f.tolist())
        # in-pipeline self-check (the pq_topk.check_ok pattern): the
        # stub decode's CONTRACT — dims inside the fake sensor range,
        # 3 channels, feat_dim unit-interval features — verified from
        # the OUTPUT values so the rows-only driver gate carries a
        # pass/fail signal, not just a row count.
        # features live in [0, 1]: the uint32 -> float32 conversion
        # rounds words within 128 of 2^32 up to exactly 2^32, so 1.0
        # is a legitimate boundary value (~5e-7 per feature), not a
        # contract violation
        ok = [
            16 <= w <= 255
            and 16 <= h <= 255
            and c == 3
            and len(f) == self.feat_dim
            and all(0.0 <= x <= 1.0 for x in f)
            for w, h, c, f in zip(ws, hs, cs, feats)
        ]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "channels": pa.array(cs, pa.int32()),
                "features": pa.array(feats, pa.list_(pa.float32(), self.feat_dim)),
                "check_ok": pa.array(ok, pa.bool_()),
            }
        )


class FrameSampleStage:
    """Video frame-sampling plumbing: emits one row per sampled frame
    index (every ``stride``th of ``n_frames`` derived from payload
    size) — flat-map shape, fake timing metadata; the real ffmpeg call
    is the NotImplementedError hook."""

    def __init__(self, real: bool = False, stride: int = 10):
        self.real = real
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError("real frame sampling requires ffmpeg")
        ids, frames, ts = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            n_frames = max(1, len(payload or b"") // 40)
            for fi in range(0, n_frames, self.stride):
                ids.append(mid)
                frames.append(fi)
                ts.append(fi / 30.0)
        # self-check over the OUTPUT SEQUENCE STRUCTURE, independent
        # of the generator loop above: within each media's emitted
        # run, indices start at 0 and step by exactly stride (catches
        # dropped/duplicated/reordered frames), and each timestamp is
        # consistent with its index at 30 fps. A per-row re-derivation
        # from payload would be tautological; the run-structure check
        # is a genuine invariant of the output rows.
        ok = [True] * len(frames)
        i = 0
        while i < len(frames):
            j = i
            while j < len(frames) and ids[j] == ids[i]:
                j += 1
            run = frames[i:j]
            good = run[0] == 0 and all(
                b - a == self.stride for a, b in zip(run, run[1:])
            )
            for k in range(i, j):
                ok[k] = (
                    good and ts[k] * 30.0 == float(frames[k])
                )
            i = j
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_index": pa.array(frames, pa.int32()),
                "t_seconds": pa.array(ts, pa.float64()),
                "check_ok": pa.array(ok, pa.bool_()),
            }
        )


class ImageResizeStage:
    """Actor-pool resize stage (task-brief: decode / feature-extract /
    RESIZE / frame-sample). The geometry is fully real: fit the source
    (width, height) into a ``max_side`` box preserving aspect ratio,
    never upscaling. The pixel transform itself is the codec hook
    (real=True raises like the decode stage); in fake mode the payload
    passes through so downstream schema/size accounting is exercised
    end-to-end."""

    def __init__(self, real: bool = False, max_side: int = 224):
        self.real = real
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError(
                "real resize requires PIL/opencv — wire the codec call here"
            )
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        out_w, out_h, scales = [], [], []
        for w, h in zip(ws, hs):
            side = max(w, h)
            s = min(1.0, self.max_side / side) if side else 1.0
            out_w.append(max(1, int(round(w * s))))
            out_h.append(max(1, int(round(h * s))))
            scales.append(s)
        cols = {
            name: batch[name]
            for name in batch.column_names
            if name != "check_ok"
        }
        cols["out_width"] = pa.array(out_w, pa.int32())
        cols["out_height"] = pa.array(out_h, pa.int32())
        cols["scale"] = pa.array(scales, pa.float64())
        # self-check: resize never upscales, fits the max_side box,
        # keeps >= 1 px sides, and preserves aspect ratio to within
        # integer rounding (|out_w*h - out_h*w| <= max(w, h)).
        in_ok = (
            batch["check_ok"].to_pylist()
            if "check_ok" in batch.column_names
            else [True] * len(out_w)
        )
        ok = [
            p
            and ow >= 1
            and oh >= 1
            and s <= 1.0
            and max(ow, oh) <= max(self.max_side, 1)
            and abs(ow * h - oh * w) <= max(w, h, 1)
            for p, ow, oh, s, w, h in zip(
                in_ok, out_w, out_h, scales, ws, hs
            )
        ]
        cols["check_ok"] = pa.array(ok, pa.bool_())
        return pa.table(cols)
