"""Space-to-depth conv reformulation — the small-channel 256² conv fix.

The VAE spends most of its wall-clock in the full-resolution levels
(encoder level 0, decoder tail): 3x3 convs at 256² with 32 channels run at
~5% of MXU peak on v5e — the 128x128 systolic array is starved on the
contraction (9·C = 288 for c32) and output (32) dimensions, and seven such
convs floor the whole step (docs/ARCHITECTURE.md, round-4 floor analysis).

The classic TPU fix: fold 2x2 spatial blocks into channels (space-to-depth)
and run the SAME math at half resolution with 4x the channels. A stride-1
3x3 conv at [H, W, C] is EXACTLY a 3x3 conv at [H/2, W/2, 4C] -> [.., 4O]
with a structured-zero kernel built from the original weights; GroupNorm,
SiLU, and residual adds map 1:1. The transformed conv issues 4x the MACs
(the zero half of the kernel is still multiplied) but at c32->c128 the MXU
utilisation headroom is ~10-20x, so the exchange wins where it matters.

Everything here is a WEIGHT-side transform applied inside jit: parameters
keep their canonical [kh, kw, C, O] shapes, so checkpoints are identical
between the fused and unfused forms and the reformulation is a pure apply-
time config knob (``s2d_stem``, models/autoencoder_kl.py) — same playbook
as the measured ``norm_stats`` flip.

Phase layout (load-bearing): s2d channel index is ``c * 4 + (2a + b)`` for
source pixel (2i+a, 2j+b) — CHANNEL-major, phase-minor. GroupNorm groups of
contiguous channels [g0, g1) then map to contiguous s2d channels
[4·g0, 4·g1): group statistics cover exactly the original element sets, so
``norm_num_groups`` is unchanged and scale/bias just repeat 4x.

Derivation of the kernel transforms (1-D; H and W factorize):
``out[2i+a] = Σ_u W[u+1] · x[2i+a+u]`` with u ∈ {-1,0,1}. Substituting
``2i+a+u = 2(i+r) + p`` gives ``u = 2r + p - a``; the s2d kernel entry at
(tap r, input phase p, output phase a) is W[u+1] when u lands in the
original support and 0 otherwise. For the 3x3 SAME conv, r spans {-1,0,1}
(a 3-tap s2d kernel, half structurally zero); zero-padding in the s2d
domain reproduces the original padding=1 zeros exactly (the entries that
would read original row -2 or H+1 are the structural zeros). For the
asymmetric-pad stride-2 downsample (pad (0,1), VALID), only output phase
a=0 exists and ``u = 2r + p`` spans {0,1,2} with r ∈ {0,1}: a 2x2 s2d
kernel whose (r=1, p=1) tap is zero, applied with the same (0,1) pad.

Reference for the workload being fixed: the reference's MONAI AutoencoderKL
full-res levels (SURVEY.md §2.2); measured floor in
docs/conv_roofline_v5e_*.json.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "space_to_depth",
    "depth_to_space",
    "s2d_conv3x3_kernel",
    "s2d_conv1x1_kernel",
    "s2d_downsample_kernel",
    "s2d_repeat_channels",
    "s2d_auto_mode",
    "S2D_AUTO_TRAIN_ENCODER_MAX_BATCH",
    "S2D_AUTO_INFER_ENCODER_MAX_BATCH",
    "S2D_AUTO_INFER_DECODER_MAX_BATCH",
]

# ---------------------------------------------------------------------------
# Measured "auto" policy (1x v5e, 256², bf16, flagship config).
#
# The 4x-MAC exchange wins exactly where the small-channel convs are starved
# — SMALL batch — and the win profile differs per side and workload:
# the decoder side's backward pays the transform transposes, so training
# never wants the decoder in the s2d domain at any measured batch, while
# small-batch inference wants BOTH sides (+69% at b8). Full table:
# docs/s2d_ab_v5e.jsonl; crossover sweeps tools/run_s2d_ab{3,4}.py.
#
# Thresholds are calibrated PER CHIP. Batch is static at trace time, so the
# model's Encoder/Decoder gate on the traced batch — which under a jit'd
# data-parallel mesh is the GLOBAL batch; multi-chip callers should resolve
# the mode explicitly with their per-chip batch (train/loop.py does).
# ---------------------------------------------------------------------------
# train encoder-only: +18% b8, +22% b32, +8.6% b64, -4% b128 (run_s2d_ab3)
S2D_AUTO_TRAIN_ENCODER_MAX_BATCH = 64
# inference encoder: +27% b8, +9% b64, -8.7% b128 (run_s2d_ab{,3})
S2D_AUTO_INFER_ENCODER_MAX_BATCH = 64
# inference decoder: +24% b8 (full +69%), regresses by b128 (run_s2d_ab{,4})
S2D_AUTO_INFER_DECODER_MAX_BATCH = 32


def s2d_auto_mode(workload: str, batch: int | None) -> "bool | str":
    """Resolve ``s2d_stem="auto"`` to a concrete mode from the measured table.

    ``workload``: "train" (gradients flow through the model — the decoder
    transform's backward cost applies) or "inference" (pure applies).
    ``batch``: per-chip batch; ``None`` means unknown and resolves
    conservatively to the standard path (False) for train and to the
    encoder-only form for inference (the encoder side never measured a
    regression below its threshold and analysis/CLI inference batches are
    small in practice).
    """
    if workload not in ("train", "inference"):
        raise ValueError(f"workload must be 'train' or 'inference', got {workload!r}")
    if workload == "train":
        if batch is not None and batch <= S2D_AUTO_TRAIN_ENCODER_MAX_BATCH:
            return "encoder"
        return False
    if batch is None:
        return "encoder"
    enc = batch <= S2D_AUTO_INFER_ENCODER_MAX_BATCH
    dec = batch <= S2D_AUTO_INFER_DECODER_MAX_BATCH
    if enc and dec:
        return True
    if enc:
        return "encoder"
    if dec:
        return "decoder"
    return False


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], channel-major phase layout.

    ``out[b, i, j, c*4 + 2a + b'] = x[b, 2i+a, 2j+b', c]``.
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"space_to_depth needs even H, W; got {(h, w)}")
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)          # [B, i, a, j, b', c]
    x = x.transpose(0, 1, 3, 5, 2, 4)                  # [B, i, j, c, a, b']
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth` (same phase layout)."""
    b, h, w, c4 = x.shape
    if c4 % 4:
        raise ValueError(f"depth_to_space needs channels % 4 == 0; got {c4}")
    c = c4 // 4
    x = x.reshape(b, h, w, c, 2, 2)                    # [B, i, j, c, a, b']
    x = x.transpose(0, 1, 4, 2, 5, 3)                  # [B, i, a, j, b', c]
    return x.reshape(b, 2 * h, 2 * w, c)


def s2d_repeat_channels(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-2x upsample expressed in the s2d domain: every source pixel
    fills all four phases, i.e. repeat each channel 4x (layout c*4+p)."""
    return jnp.repeat(x, 4, axis=-1)


def s2d_conv3x3_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, O] stride-1 padding=1 kernel -> [3, 3, 4C, 4O] s2d kernel.

    Apply with padding=1 on the s2d tensor; output stays in the s2d domain
    (bias: ``jnp.repeat(bias, 4)``).
    """
    kh, kw, c, o = w.shape
    assert (kh, kw) == (3, 3), f"expected 3x3, got {(kh, kw)}"
    out = jnp.zeros((3, 3, c, 2, 2, o, 2, 2), dtype=w.dtype)
    for r in (-1, 0, 1):
        for s in (-1, 0, 1):
            for ph in (0, 1):
                for pw in (0, 1):
                    for a in (0, 1):
                        for b in (0, 1):
                            u = 2 * r + ph - a
                            v = 2 * s + pw - b
                            if -1 <= u <= 1 and -1 <= v <= 1:
                                out = out.at[r + 1, s + 1, :, ph, pw, :, a, b].set(
                                    w[u + 1, v + 1]
                                )
    return out.reshape(3, 3, 4 * c, 4 * o)


def s2d_conv1x1_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[1, 1, C, O] kernel -> [1, 1, 4C, 4O] phase-diagonal s2d kernel."""
    kh, kw, c, o = w.shape
    assert (kh, kw) == (1, 1), f"expected 1x1, got {(kh, kw)}"
    out = jnp.zeros((1, 1, c, 2, 2, o, 2, 2), dtype=w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            out = out.at[0, 0, :, a, b, :, a, b].set(w[0, 0])
    return out.reshape(1, 1, 4 * c, 4 * o)


def s2d_downsample_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, O] asymmetric-pad stride-2 kernel -> [2, 2, 4C, O].

    The original op is ``pad (0,1) then VALID 3x3 stride 2`` (MONAI
    ``AEKLDownsample``); the s2d form is ``pad (0,1) then VALID 2x2 stride
    1`` on the s2d tensor, and the output EXITS the s2d domain (it is the
    next level's half-resolution tensor directly).
    """
    kh, kw, c, o = w.shape
    assert (kh, kw) == (3, 3), f"expected 3x3, got {(kh, kw)}"
    out = jnp.zeros((2, 2, c, 2, 2, o), dtype=w.dtype)
    for r in (0, 1):
        for s in (0, 1):
            for ph in (0, 1):
                for pw in (0, 1):
                    u = 2 * r + ph
                    v = 2 * s + pw
                    if u <= 2 and v <= 2:
                        out = out.at[r, s, :, ph, pw, :].set(w[u, v])
    return out.reshape(2, 2, 4 * c, o)
