"""Numpy CNN inference: the forward-pass half of the model seam.

The reference's detection path runs a trained DBNet backbone
(``model/db_net/nets/``, torch/onnx forward pass) whose output — a
per-pixel text-probability map — feeds the deterministic postprocess
this repo already implements (``core.dbnet``). Until now the forward
pass itself was absent: the prob map arrived as a planted contract
payload. This module supplies a REAL convolutional forward pass in
pure numpy — im2col conv2d, relu, stride-1 max-pool dilation,
sigmoid — so an actual page IMAGE (decoded by ``core.codecs``) runs
image → CNN → probability map → ``db_postprocess`` → boxes with no
planted model output anywhere on the path.

No torch and no trained weights exist in this sandbox, so the shipped
``DET_CNN`` weights are hand-constructed rather than learned: conv1
computes local ink density (box kernel) and horizontal ink runs,
the 1x5 stride-1 max-pool closes inter-character gaps the way a
trained DBNet's wide receptive field does, and conv2 + a steep
sigmoid sharpen the result into a near-binary text-region map. The
ARCHITECTURE and the execution path are exactly what a trained
checkpoint would use — swap the ``.npz`` tensors for trained ones and
nothing else changes. All arithmetic is float64 with a fixed
operation order, so the map is bit-identical across executors and the
single-process golden builder.

Layout conventions: images are (H, W) float64 in [0, 1] with 1 = ink;
conv weights are (C_out, C_in, KH, KW); padding is zero 'same'.
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------ ops


def conv2d(x: np.ndarray, w: np.ndarray,
           b: np.ndarray | None = None) -> np.ndarray:
    """'same' zero-padded 2-D convolution (cross-correlation, the CNN
    convention). x: (C_in, H, W); w: (C_out, C_in, KH, KW);
    returns (C_out, H, W). im2col + one matmul — the vectorized path;
    no Python per-pixel loops."""
    c_in, h, wd = x.shape
    c_out, c_in_w, kh, kw = w.shape
    if c_in != c_in_w:
        raise ValueError(f"conv2d: {c_in} input channels, "
                         f"weights expect {c_in_w}")
    ph, pw = kh // 2, kw // 2
    xp = np.zeros((c_in, h + 2 * ph, wd + 2 * pw), dtype=np.float64)
    xp[:, ph:ph + h, pw:pw + wd] = x
    # im2col via as_strided: (C_in, KH, KW, H, W) view, no copy
    s = xp.strides
    cols = np.lib.stride_tricks.as_strided(
        xp, shape=(c_in, kh, kw, h, wd),
        strides=(s[0], s[1], s[2], s[1], s[2]), writeable=False)
    out = np.einsum("oikl,iklhw->ohw", w.astype(np.float64), cols,
                    optimize=True)
    if b is not None:
        out += np.asarray(b, dtype=np.float64)[:, None, None]
    return out


def relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


def sigmoid(x: np.ndarray) -> np.ndarray:
    # split by sign for numerical stability (no overflow warnings)
    out = np.empty_like(x, dtype=np.float64)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    e = np.exp(x[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def maxpool2d(x: np.ndarray, kh: int, kw: int) -> np.ndarray:
    """Stride-1 'same' max pool over (C, H, W) — the dilation
    component (DBNet's trained receptive field bridges character gaps;
    this does it morphologically). Zero-padded, odd kernels."""
    if kh % 2 == 0 or kw % 2 == 0:
        raise ValueError("maxpool2d: odd kernels only")
    c, h, wd = x.shape
    ph, pw = kh // 2, kw // 2
    xp = np.full((c, h + 2 * ph, wd + 2 * pw), -np.inf)
    xp[:, ph:ph + h, pw:pw + wd] = x
    s = xp.strides
    win = np.lib.stride_tricks.as_strided(
        xp, shape=(c, kh, kw, h, wd),
        strides=(s[0], s[1], s[2], s[1], s[2]), writeable=False)
    return win.max(axis=(1, 2))


# ----------------------------------------------------- the det CNN

DETCNN_VERSION = "det-cnn-v1"

# conv1 (2,1,3,3): ch0 = 3x3 ink density, ch1 = horizontal 1x3 run
_C1_W = np.zeros((2, 1, 3, 3))
_C1_W[0, 0] = 1.0 / 9.0
_C1_W[1, 0, 1, :] = 1.0 / 3.0
_C1_B = np.zeros(2)

# conv2 (1,2,3,3): re-mix the dilated maps — ch0 weighted 3x3 mean,
# ch1 center tap — into a pre-activation score; bias tuned so density
# >= ~0.35 lands well past the sigmoid knee
_C2_W = np.zeros((1, 2, 3, 3))
_C2_W[0, 0] = 8.0 / 9.0
_C2_W[0, 1, 1, 1] = 4.0
_C2_B = np.array([-4.0])

SIG_GAIN = 6.0  # final sharpening: sigmoid(SIG_GAIN * preact)

DET_CNN = {"c1_w": _C1_W, "c1_b": _C1_B,
           "c2_w": _C2_W, "c2_b": _C2_B,
           "gain": np.array([SIG_GAIN]), "pool": np.array([1.0, 5.0])}


def det_forward(img: np.ndarray, weights: dict | None = None
                ) -> np.ndarray:
    """The detection forward pass: (H, W) ink image in [0,1] →
    (H, W) text-probability map in (0,1).

      conv1 3x3 (1→2) → relu → maxpool 1x5 stride 1 (horizontal
      dilation) → conv2 3x3 (2→1) → sigmoid(gain · x)

    ``weights``: dict of tensors (the ``.npz`` artifact contents);
    None → the built-in hand-constructed DET_CNN."""
    w = weights if weights is not None else DET_CNN
    x = np.asarray(img, dtype=np.float64)[None, :, :]
    x = relu(conv2d(x, np.asarray(w["c1_w"]), np.asarray(w["c1_b"])))
    ph, pw = (int(v) for v in np.asarray(w["pool"]).ravel())
    x = maxpool2d(x, ph, pw)
    x = conv2d(x, np.asarray(w["c2_w"]), np.asarray(w["c2_b"]))
    gain = float(np.asarray(w["gain"]).ravel()[0])
    return sigmoid(gain * x)[0]


# -------------------------------------------- page raster (fixture)


def render_lines(lines: list[dict], height: int, width: int
                 ) -> np.ndarray:
    """Rasterize planted text lines into a scan-like ink image: each
    line dict has integer pixel bounds x0/y0/x1/y1 (exclusive ends)
    and ``gaps`` — x-offsets of 1-px-wide blank columns inside the
    line (word separators the CNN's dilation must bridge). uint8,
    255 = paper, 0 = ink (scanner convention)."""
    img = np.full((height, width), 255, dtype=np.uint8)
    for ln in lines:
        img[ln["y0"]:ln["y1"], ln["x0"]:ln["x1"]] = 0
        for g in ln.get("gaps", ()):  # carve word gaps (3px wide)
            img[ln["y0"]:ln["y1"], g:g + 3] = 255
    return img


def ink_from_scan(scan: np.ndarray) -> np.ndarray:
    """Scanner image (uint8, 255=paper) → ink map in [0,1], 1=ink."""
    return 1.0 - scan.astype(np.float64) / 255.0
