"""Planted real-media corpus: actual PNG/BMP/PGM/PPM/WAV payloads.

Unlike the utf8-ref pseudo-payloads (``ops.multimodal.
media_refs_with_payloads`` — the sandbox blob-store substitute), these
are REAL encoded media bytes built by ``core.codecs`` encoders, so the
distributed decode path (magic sniff → pixel decode → feature /
resize / re-encode) runs end-to-end on genuine codec structure:
multi-filter PNG rows, bottom-up BMP padding, PNM headers, RIFF/WAV
frames.

The correctness gate is encode-side: ``media_truth`` records the
dimensions, format, and byte length of each payload BEFORE encoding
(plus an integer pixel checksum for pytest). The fixture build writes
the payloads and the truth to parquet; the Spark query decodes the
payload parquet and must reproduce the truth — encoder and decoder
are independent inverses, so agreement is a real codec check, not an
identity.

Deterministic: ``np.random.default_rng(seed)`` (PCG64 stream
stability is a numpy compatibility guarantee) + fixed iteration
order.
"""

from __future__ import annotations

import numpy as np

from ..core import codecs

N_IMAGES = 64
N_WAVS = 8


def _image_for(i: int) -> np.ndarray:
    """Deterministic test image i: seeded noise + gradient so rows
    differ (exercises Sub/Up/Average/Paeth filters non-trivially)."""
    rng = np.random.default_rng(1000 + i)
    # span the 256 thumbnail-fit boundary so both scale<1 and scale=1
    # arms of the resize arithmetic are exercised
    h = int(rng.integers(8, 520))
    w = int(rng.integers(8, 640))
    kind = i % 4  # gray / rgb / rgba / gray (pnm needs gray or rgb)
    ch = {0: 0, 1: 3, 2: 4, 3: 0}[kind]
    shape = (h, w) if ch == 0 else (h, w, ch)
    base = rng.integers(0, 256, size=shape, dtype=np.uint8)
    ramp = (np.arange(h, dtype=np.int32)[:, None] * 255 // max(h - 1, 1)
            ).astype(np.uint8)
    if ch == 0:
        return ((base.astype(np.int32) + ramp) // 2).astype(np.uint8)
    return ((base.astype(np.int32) + ramp[:, :, None]) // 2).astype(
        np.uint8)


def _encode_for(i: int, arr: np.ndarray) -> tuple[bytes, str]:
    """Rotate payload i through the encoder surface: PNG with each of
    the five row filters + the cycle mode, then BMP / PGM / PPM where
    the array shape allows."""
    slot = i % 8
    if slot < 6:
        mode = "cycle" if slot == 5 else slot
        return codecs.png_encode(arr, filter_mode=mode), "png"
    if slot == 6 and arr.ndim == 3 and arr.shape[2] == 3:
        return codecs.bmp_encode(arr), "bmp"
    if arr.ndim == 2:
        return codecs.pnm_encode(arr), "pgm"
    if arr.ndim == 3 and arr.shape[2] == 3:
        return codecs.pnm_encode(arr), "ppm"
    return codecs.png_encode(arr, filter_mode=4), "png"


def media_payloads() -> list[dict]:
    """The planted corpus: N_IMAGES image rows + N_WAVS wav rows of
    (media_ref, payload)."""
    rows = []
    for i in range(N_IMAGES):
        arr = _image_for(i)
        payload, _fmt = _encode_for(i, arr)
        rows.append({"media_ref": f"media://img/{i:04d}",
                     "payload": payload})
    for i in range(N_WAVS):
        rng = np.random.default_rng(5000 + i)
        n = int(rng.integers(800, 48000))
        ch = 1 + i % 2
        samples = rng.integers(-30000, 30000, size=(n, ch),
                               dtype=np.int16)
        rate = [8000, 16000, 22050, 44100][i % 4]
        rows.append({"media_ref": f"media://wav/{i:04d}",
                     "payload": codecs.wav_encode(samples, rate)})
    return rows


def media_truth() -> list[dict]:
    """Encode-side ground truth for the image rows: dims/format from
    the source array, n_bytes from the encoded payload, px_sum as an
    exact integer pixel checksum (pytest-only; the SQL oracle checks
    dims/format/n_bytes and computes the thumbnail fit itself)."""
    rows = []
    for i in range(N_IMAGES):
        arr = _image_for(i)
        payload, fmt = _encode_for(i, arr)
        rows.append({
            "media_ref": f"media://img/{i:04d}",
            "src_width": int(arr.shape[1]),
            "src_height": int(arr.shape[0]),
            "format": fmt,
            "n_bytes": len(payload),
            "px_sum": int(arr.astype(np.int64).sum()),
        })
    return rows


N_SCANS = 24
SCAN_H, SCAN_W = 160, 220


def _scan_lines_for(i: int) -> list[dict]:
    """Planted text-line layout for scan page i: 2-5 ink lines with
    1-3 word gaps each. Vertical separation >= 10 px (outside the
    CNN's +-2 px vertical receptive spread), gap width 3 px (inside
    the 1x5 horizontal max-pool's bridge reach) — so the forward pass
    must merge words and must NOT merge lines."""
    rng = np.random.default_rng(9000 + i)
    lines, y = [], 8
    for _ in range(int(rng.integers(2, 6))):
        h = int(rng.integers(4, 9))
        if y + h > SCAN_H - 8:
            break
        x0 = int(rng.integers(6, 30))
        x1 = int(rng.integers(x0 + 40, SCAN_W - 6))
        n_gaps = int(rng.integers(1, 4))
        gaps = sorted(int(g) for g in rng.choice(
            np.arange(x0 + 8, x1 - 11, 8), size=min(
                n_gaps, max(1, (x1 - x0 - 20) // 8)), replace=False))
        lines.append({"x0": x0, "y0": y, "x1": x1, "y1": y + h,
                      "gaps": gaps})
        y += h + int(rng.integers(10, 26))
    return lines


def scan_payloads() -> list[dict]:
    """Scan-page corpus: each page is a REAL PNG (core.codecs encoder)
    of the rendered planted lines — the input to the image → CNN →
    DBNet-postprocess detection path."""
    from ..core import codecs, nn
    rows = []
    for i in range(N_SCANS):
        scan = nn.render_lines(_scan_lines_for(i), SCAN_H, SCAN_W)
        rows.append({"media_ref": f"media://scan/{i:04d}",
                     "payload": codecs.png_encode(
                         scan, filter_mode=i % 5)})
    return rows


def scan_truth() -> list[dict]:
    """The planted line rectangles (pre-render ground truth) for
    recall/containment checks in pytest."""
    rows = []
    for i in range(N_SCANS):
        for j, ln in enumerate(_scan_lines_for(i)):
            rows.append({"media_ref": f"media://scan/{i:04d}",
                         "line_idx": j, **{k: ln[k] for k in
                                           ("x0", "y0", "x1", "y1")}})
    return rows


def wav_truth() -> list[dict]:
    """Encode-side ground truth for the wav rows."""
    rows = []
    for i in range(N_WAVS):
        rng = np.random.default_rng(5000 + i)
        n = int(rng.integers(800, 48000))
        ch = 1 + i % 2
        samples = rng.integers(-30000, 30000, size=(n, ch),
                               dtype=np.int16)
        rate = [8000, 16000, 22050, 44100][i % 4]
        rows.append({
            "media_ref": f"media://wav/{i:04d}",
            "sample_rate": rate, "n_channels": ch, "n_frames": n,
            "duration_ms": n * 1000 // rate,
            "peak": int(np.abs(samples.astype(np.int32)).max()),
        })
    return rows
