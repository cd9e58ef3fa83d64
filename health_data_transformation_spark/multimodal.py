"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing is real — binary payload column, deterministic
metadata extraction, Arrow-batched ``mapInPandas`` decode pipeline with a
stable output schema and partition-preserving shape.  Two media paths
run REAL computation with zero external deps: 16-bit PCM audio energy
(``audio_energy_windows``) and a full 24-bpp BMP codec
(``bmp_encode_gray24`` / ``bmp_decode`` / ``bmp_resize_nn`` — container
headers, bottom-up row order, 4-byte stride padding, BGR channels,
nearest-neighbor resampling).  Only codecs that genuinely need an
external library (JPEG/PNG entropy coding, video) remain stubbed: the
default ``decode_fn`` raises NotImplementedError, and a deterministic
fake decoder is provided for tests.

At 100 TB: binary payloads dominate row width, so the decode pipeline
(a) projects only (id, payload) into the Python worker, (b) streams
Arrow batches (bounded memory per task), and (c) returns fixed-width
features — the wide binary never re-enters the JVM row.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = "doc_id bigint, n_bytes int, width int, height int"
DECODE_SCHEMA = "doc_id bigint, n_bytes int, feature_mean double, feature_dim int"


def with_payload(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary payload column (stands in for image
    bytes; in production this is the raw media column itself)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def with_fake_media_meta(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Typed metadata for a media column, derived deterministically.

    Real pipelines read this from container headers; here width/height
    come from a content hash so the differential oracle can verify the
    plumbing end-to-end.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumns(
        {
            "payload": payload,
            "n_bytes": F.length(payload),
            "width": F.conv(F.substring(F.md5(text_col), 1, 4), 16, 10).cast("int") % 640,
            "height": F.conv(F.substring(F.md5(text_col), 5, 4), 16, 10).cast("int") % 480,
        }
    )


def decode_media_stub(payload: bytes) -> dict:
    """Placeholder for a real decoder (PIL/ffmpeg/torchaudio are not in
    this container)."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "environment; use fake_decode for deterministic testing"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic fake decoder: 'features' from the raw bytes.

    feature_mean is the byte mean floor-quantized to 6 decimals via exact
    integer arithmetic, so any engine (the DuckDB oracle included) can
    recompute it bit-identically — no float-rounding-mode dependence.
    """
    n = len(payload)
    mean = ((sum(payload) * 1_000_000) // n) / 1e6 if n else 0.0
    return {"n_bytes": n, "feature_mean": mean, "feature_dim": 8}


def decode_pipeline(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode_fn: Callable[[bytes], dict] = decode_media_stub,
) -> DataFrame:
    """Arrow-batched decode over mapInPandas.

    Projects to (id, payload) first so only those bytes cross the
    JVM->Python boundary; output schema is fixed and narrow.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            feats = [decode_fn(p) for p in batch[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col].values,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "feature_mean": [f["feature_mean"] for f in feats],
                    "feature_dim": [f["feature_dim"] for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, out_w int, out_h int, out_bytes int, resized_md5 string"


def resize_media_stub(payload: bytes, w: int, h: int) -> bytes:
    """Placeholder for a real image resize (PIL not in this container)."""
    raise NotImplementedError(
        "image resize requires PIL/opencv not present in this environment; "
        "use fake_resize for deterministic testing"
    )


def fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic fake resize: cycle-pad/truncate the payload to the
    w*h target byte size — preserves the real operator's contract
    (fixed output size regardless of input size)."""
    target = w * h
    if not payload:
        return b"\x00" * target
    reps = -(-target // len(payload))  # ceil
    return (payload * reps)[:target]


def resize_pipeline(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    resize_fn: Callable[[bytes, int, int], bytes] = resize_media_stub,
) -> DataFrame:
    """Arrow-batched image resize over mapInPandas.

    Same boundary discipline as decode_pipeline: (id, payload) projected
    before Python, fixed narrow output (the resized bytes are summarized
    by md5 here; a real pipeline would write them to a binary sink
    column of exactly the same schema shape).
    """
    import hashlib

    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            resized = [resize_fn(bytes(p), out_w, out_h) for p in batch[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col].values,
                    "out_w": out_w,
                    "out_h": out_h,
                    "out_bytes": [len(r) for r in resized],
                    "resized_md5": [hashlib.md5(r).hexdigest() for r in resized],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_md5 string"


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 16,
    stride: int = 4,
) -> DataFrame:
    """Video-style frame sampling over an opaque binary payload.

    Treats the payload as a sequence of ``frame_bytes``-sized frames and
    emits every ``stride``-th frame's fingerprint — the shape of a
    keyframe-extraction pipeline (N input rows -> variable output rows,
    bounded by len/frame_bytes/stride).  Real video decode drops into
    the same ``mapInPandas`` slot; the frame hash stands in for the
    decoded tensor.
    """
    import hashlib
    import math

    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                payload = bytes(payload)
                n_frames = math.ceil(len(payload) / frame_bytes)
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(
                            payload[i * frame_bytes : (i + 1) * frame_bytes]
                        ).hexdigest()
                    )
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_md5": hashes})

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAME_SCHEMA)


AUDIO_ENERGY_SCHEMA = "doc_id bigint, win_idx int, energy bigint"


def audio_energy_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window_samples: int = 32,
) -> DataFrame:
    """Audio-style windowed energy over an opaque binary payload.

    Interprets the payload as 16-bit little-endian PCM and emits the
    exact integer energy (sum of squared samples) of each full
    non-overlapping ``window_samples`` window — the voice-activity /
    silence-trim primitive of every audio curation pipeline.  Unlike
    the decode/resize stubs, this needs NO media library: PCM framing
    plus integer arithmetic is the real computation, so the operator
    runs honestly end-to-end and the oracle recomputes it from the
    same bytes.  Same boundary discipline as decode_pipeline: (id,
    payload) projected before Python, Arrow-batched, fixed narrow
    output; output rows are bounded by payload_bytes / (2 *
    window_samples) per input row.
    """
    import numpy as np
    import pandas as pd

    frame_bytes = 2 * window_samples

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            ids, idxs, energies = [], [], []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                payload = bytes(payload)
                n_win = len(payload) // frame_bytes
                if not n_win:
                    continue
                samples = np.frombuffer(
                    payload[: n_win * frame_bytes], dtype="<i2"
                ).astype(np.int64)
                sq = samples * samples
                per_win = sq.reshape(n_win, window_samples).sum(axis=1)
                ids.extend([doc_id] * n_win)
                idxs.extend(range(n_win))
                energies.extend(per_win.tolist())
            yield pd.DataFrame(
                {"doc_id": ids, "win_idx": idxs, "energy": energies}
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=AUDIO_ENERGY_SCHEMA
    )


# ---------------------------------------------------------------------------
# REAL image path: 24-bpp BMP codec, pure stdlib + numpy byte arithmetic
# (the q193-audio pattern applied to images: no PIL/ffmpeg in the env,
# but BMP needs neither — the container is headers + padded BGR rows)
# ---------------------------------------------------------------------------

BMP_HEADER_BYTES = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def _bmp_stride(width: int) -> int:
    return (width * 3 + 3) // 4 * 4


def bmp_encode_pixels(px) -> bytes:
    """Encode an (H, W, 3) uint8 BGR pixel array as a real 24-bpp BMP:
    bottom-up row order, rows padded to 4-byte boundaries."""
    import struct

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    height, width, _ = px.shape
    stride = _bmp_stride(width)
    img_size = stride * height
    header = struct.pack(
        "<2sIHHI", b"BM", BMP_HEADER_BYTES + img_size, 0, 0, BMP_HEADER_BYTES
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = px[::-1].reshape(height, width * 3)  # bottom-up
    return header + info + rows.tobytes()


def bmp_encode_gray24(data: bytes, width: int = 30) -> bytes:
    """Pack raw bytes as a grayscale 24-bpp BMP (B=G=R=byte), one byte
    per pixel left-to-right top-to-bottom, zero-padded to fill the last
    row.  width=30 deliberately makes the row stride NOT a multiple of
    3*width (90 -> 92) so the padding path is exercised."""
    import numpy as np

    n = len(data)
    height = max(1, -(-n // width))
    flat = np.zeros(height * width, dtype=np.uint8)
    flat[:n] = np.frombuffer(data, dtype=np.uint8)
    return bmp_encode_pixels(np.repeat(flat, 3).reshape(height, width, 3))


class BmpMagicError(ValueError):
    """Payload is not a BMP container (missing 'BM' magic)."""


class BmpFormatError(ValueError):
    """Valid BMP container but an unsupported variant (non-24-bpp,
    compressed, or unknown header)."""


def bmp_pixels(payload: bytes):
    """REAL BMP decode: validate the container, return the (H, W, 3)
    uint8 BGR pixel array in top-down row order.  Handles both
    bottom-up (positive height) and top-down (negative height) files
    and arbitrary stride padding; rejects non-24-bpp or compressed
    variants explicitly rather than mis-decoding them.  Raises typed
    exceptions (BmpMagicError / BmpFormatError) so quarantine
    classification keys on type, not message text."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise BmpMagicError("not a BMP payload (missing 'BM' magic)")
    (off,) = struct.unpack_from("<I", payload, 10)
    hdr, width, height, planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr < 40 or planes != 1:
        raise BmpFormatError(f"unsupported BMP header (size={hdr}, planes={planes})")
    if bpp != 24 or comp != 0:
        raise BmpFormatError(f"only uncompressed 24-bpp supported (bpp={bpp}, comp={comp})")
    top_down = height < 0
    height = abs(height)
    stride = _bmp_stride(width)
    body = np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=off)
    px = body.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    return px if top_down else px[::-1]


def bmp_decode(payload: bytes) -> dict:
    """Real image decode for the decode_pipeline slot: parse the BMP,
    return pixel-level features.  feature_mean is the R-channel mean
    floor-quantized to 6 decimals via exact integer arithmetic (the
    fake_decode determinism contract, now over REAL decoded pixels)."""
    import numpy as np

    px = bmp_pixels(payload)
    height, width, _ = px.shape
    n_pixels = width * height
    psum = int(px[:, :, 2].astype(np.int64).sum())
    mean = ((psum * 1_000_000) // n_pixels) / 1e6  # ppm-ok: Python int arithmetic, arbitrary precision
    return {"n_bytes": len(payload), "feature_mean": mean, "feature_dim": 3}


def bmp_resize_nn(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Real nearest-neighbor resize: decode the BMP, resample the pixel
    grid (src row = r*H//out_h, src col = c*W//out_w — the standard NN
    index map), re-encode as a real BMP of the target size."""
    import numpy as np

    px = bmp_pixels(payload)
    height, width, _ = px.shape
    rr = (np.arange(out_h, dtype=np.int64) * height) // out_h
    cc = (np.arange(out_w, dtype=np.int64) * width) // out_w
    return bmp_encode_pixels(px[rr][:, cc])


def with_bmp_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", width: int = 30
) -> DataFrame:
    """Materialize a REAL BMP binary column from the text bytes (the
    ingest step of an image pipeline, with the text standing in for the
    sensor): Arrow-batched, (id, text) projected before Python, output
    is (id, payload binary)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    id_col: batch[id_col].values,
                    "payload": [
                        bmp_encode_gray24(t.encode("utf-8"), width)
                        for t in batch[text_col]
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} bigint, payload binary"
    )


RESIZE_FEATURES_SCHEMA = (
    "doc_id bigint, out_w int, out_h int, out_bytes int, resized_pixel_sum bigint"
)


def resize_features_pipeline(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Real image resize end-to-end: BMP decode -> nearest-neighbor
    resample -> BMP re-encode -> decode of the resized file, emitting
    the resized container size and the R-channel pixel sum (both
    recomputable relationally from the source bytes, so the oracle
    verifies the whole codec chain).  Boundary discipline as always:
    (id, payload) projected before Python, fixed narrow output."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            ids, sizes, sums = [], [], []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                resized = bmp_resize_nn(bytes(payload), out_w, out_h)
                px = bmp_pixels(resized)
                ids.append(doc_id)
                sizes.append(len(resized))
                sums.append(int(px[:, :, 2].astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "out_w": out_w,
                    "out_h": out_h,
                    "out_bytes": sizes,
                    "resized_pixel_sum": sums,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=RESIZE_FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------------
# Decode quarantine: the P9 validation-split pattern (operators/validate.py,
# reference load_hhs.py's numeric-range quarantine) applied to BINARY
# payloads.  A corrupt container must not kill the batch job OR silently
# produce garbage features — each payload either decodes or lands in a
# classified quarantine row, and the split is total (n_ok + n_bad ==
# n_in, enforced by construction: exactly one output row per input).
# ---------------------------------------------------------------------------

DECODE_QUARANTINE_SCHEMA = (
    "doc_id bigint, status string, n_bytes int, pixel_sum bigint"
)


def classify_bmp_error(exc: Exception) -> str:
    """Stable quarantine reason taxonomy for BMP decode failures.

    Keys on the decoder's TYPED exceptions (BmpMagicError /
    BmpFormatError), not message substrings — a reworded error message
    can no longer silently reclassify failures into 'corrupt' (ADVICE
    r5).  Anything else (struct.error on a truncated header, numpy
    buffer-too-small on a truncated body) is 'corrupt'."""
    if isinstance(exc, BmpMagicError):
        return "bad_magic"
    if isinstance(exc, BmpFormatError):
        return "bad_format"
    return "corrupt"


def decode_quarantine_pipeline(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """BMP decode with quarantine: one output row per payload — status
    'ok' with real pixel features, or a classified failure reason with
    NULL features.  Arrow-batched mapInPandas, (id, payload)-only
    projection; at 100 TB the corrupt fraction rides the same pass as
    the decode, no second scan."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            ids, statuses, sizes, sums = [], [], [], []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                ids.append(doc_id)
                if payload is None:
                    # The classic quarantine input: a NULL binary must
                    # land in a quarantine row, not raise TypeError in
                    # the Arrow worker and kill the whole task (ADVICE
                    # r5 — bytes(None) ran outside the try).
                    sizes.append(0)
                    statuses.append("null_payload")
                    sums.append(None)
                    continue
                try:
                    raw = bytes(payload)
                    sizes.append(len(raw))
                    px = bmp_pixels(raw)
                except Exception as exc:
                    if len(sizes) < len(ids):
                        sizes.append(0)
                    statuses.append(classify_bmp_error(exc))
                    sums.append(None)
                    continue
                statuses.append("ok")
                sums.append(int(px[:, :, 2].astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "status": statuses,
                    "n_bytes": sizes,
                    "pixel_sum": pd.array(sums, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=DECODE_QUARANTINE_SCHEMA
    )


def corrupt_bmp_for_test(payload: bytes, mode: int) -> bytes:
    """Deterministic corruption harness for the quarantine differential
    (test/oracle use): mode 0 = intact, 1 = magic flipped, 2 = bpp
    field rewritten to 8, 3 = truncated mid-body."""
    if mode == 1:
        return b"XX" + payload[2:]
    if mode == 2:
        return payload[:28] + b"\x08\x00" + payload[30:]
    if mode == 3:
        return payload[: BMP_HEADER_BYTES - 8]
    return payload


def with_corrupted_bmp_payload(
    df: DataFrame,
    mode_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 30,
) -> DataFrame:
    """with_bmp_payload + deterministic per-row corruption selected by
    ``mode_col`` — the ingest harness for the quarantine differential."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    id_col: batch[id_col].values,
                    "payload": [
                        corrupt_bmp_for_test(
                            bmp_encode_gray24(t.encode("utf-8"), width), int(m)
                        )
                        for t, m in zip(batch[text_col], batch[mode_col])
                    ],
                }
            )

    return df.select(id_col, text_col, mode_col).mapInPandas(
        run, schema=f"{id_col} bigint, payload binary"
    )


PATCH_GRID_SCHEMA = (
    "doc_id bigint, patch_row int, patch_col int, n_px int, r_sum bigint"
)


def patch_grid_stats(channel, patch_h: int, patch_w: int):
    """Exact per-patch (pixel count, sum) grids for one channel plane:
    cut an (H, W) array into a (patch_h x patch_w) lattice where edge
    patches keep their true partial extent.  ``np.add.reduceat`` on
    the boundary indices does all patches in O(pixels); the count
    grid is the outer product of the row/col extents.  Returns
    (counts, sums), both shaped (ceil(H/patch_h), ceil(W/patch_w))."""
    import numpy as np

    ch = np.asarray(channel, dtype=np.int64)
    height, width = ch.shape
    row_cuts = np.arange(0, height, patch_h)
    col_cuts = np.arange(0, width, patch_w)
    sums = np.add.reduceat(
        np.add.reduceat(ch, row_cuts, axis=0), col_cuts, axis=1
    )
    row_ext = np.diff(np.append(row_cuts, height))
    col_ext = np.diff(np.append(col_cuts, width))
    return np.outer(row_ext, col_ext), sums


def patch_grid_pipeline(
    df: DataFrame,
    patch_h: int,
    patch_w: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """ViT-style patchification over a REAL image column: decode the
    BMP, cut the pixel grid into a (patch_h x patch_w) patch lattice
    (edge patches keep their true partial extent — the resolution-
    agnostic variant), and emit per-patch pixel count + R-channel sum.
    This is the vision-transformer / CLIP preprocessing primitive
    ("image -> N patch tokens") expressed with the engine's multimodal
    boundary discipline: Arrow-batched mapInPandas, (id, payload)-only
    projection before Python, fixed narrow output schema, one output
    row per patch.  The per-patch sums use ``np.add.reduceat`` on the
    row/col boundary indices — O(pixels) per image, no Python loop
    over patches.  At 100 TB the patch fanout is a constant factor of
    the pixel payload already being read; nothing shuffles until the
    (bounded) patch rows leave the decode pass."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            ids, prs, pcs, npx, rsum = [], [], [], [], []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                px = bmp_pixels(bytes(payload))
                counts, sums = patch_grid_stats(
                    px[:, :, 2], patch_h, patch_w
                )
                for pr in range(counts.shape[0]):
                    for pc in range(counts.shape[1]):
                        ids.append(doc_id)
                        prs.append(pr)
                        pcs.append(pc)
                        npx.append(int(counts[pr, pc]))
                        rsum.append(int(sums[pr, pc]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "patch_row": prs,
                    "patch_col": pcs,
                    "n_px": npx,
                    "r_sum": rsum,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=PATCH_GRID_SCHEMA
    )
