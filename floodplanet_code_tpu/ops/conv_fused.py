"""Pallas fused BN-apply + ReLU + 3x3 conv block (SURVEY.md §8.5).

The UNet's DoubleConv is conv3x3 -> BN -> ReLU -> conv3x3 -> BN -> ReLU
(reference st_water_seg/models/unet.py:6-20). On TPU, XLA already fuses
the BN *statistics* into the producing conv's custom-call outputs and the
scale/shift/relu into an elementwise fusion — but a conv custom-call
cannot consume a fused operand, so the normalized activation ``z`` is
always materialized to HBM between the two convs (one full write + one
full read per DoubleConv, ~2 GB/step at 512x512 b8; PERF.md round 3).

This kernel removes that boundary: ``relu_affine_conv3x3(y, a, b, w)``
computes ``conv3x3_SAME(relu(y * a + b), w)`` in one pass — the affine
(the BN apply, ``a = rsqrt(var+eps)*scale``, ``b = bias - mean*a``) and
the ReLU run on the VMEM tile right before the nine shifted MXU matmuls,
so ``z`` only ever exists on-chip.

Kernel shape: grid over (batch, row-strips). Each strip arrives via three
BlockSpecs — the TH-row center plus one clamped halo row above and below
(no manual DMA: Mosaic rejects HBM slices on a lane-padded C<128 dim, and
BlockSpec pipelining double-buffers for free; the halo re-read is 2/TH
extra traffic). SAME padding is imposed where it belongs — on ``z``, so
out-of-image taps contribute 0, not relu(b): the halo rows are zeroed at
the image border, and the column shift is applied to each tap's matmul
*output* with an iota edge mask (shifting the product avoids building
nine shifted copies of the input).

The custom VJP recomputes ``z`` with XLA on the backward (the cheap
elementwise chain re-fuses there); gradients are identical to the
unfused path because the recomputation is the same expression.

Used by models/unet.py DoubleConv when ``conv_impl='pallas_fused'``
(config knob ``tpu.conv_impl``). Head-to-head numbers vs XLA: PERF.md
round 3, "Pallas fused block".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def xla_reference(y, a, b, w):
    """The unfused XLA form: conv3x3_SAME(relu(y*a+b), w).

    Affine in the compute dtype, conv accumulating in f32 — exactly what
    FusedBatchNormReLU + nn.Conv produce, so the Pallas kernel can be
    tested for equality against it.
    """
    z = jax.nn.relu(y * a.astype(y.dtype) + b.astype(y.dtype))
    # No preferred_element_type: like nn.Conv, the conv runs in the compute
    # dtype (the MXU still accumulates bf16 products in f32), and the VJP
    # transpose then sees matching dtypes.
    return jax.lax.conv_general_dilated(
        z,
        w.astype(y.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _pick_th(h: int, w: int, c1: int, c2: int, itemsize: int = 2) -> int | None:
    """Largest strip height TH dividing H that keeps the VMEM working set
    within budget. None = shapes unsupported (caller falls back to XLA).

    ``itemsize``: bytes per element of the kernel's compute dtype (all
    operands are cast to y.dtype) — 2 for the bf16 default, 4 under
    tpu.compute_dtype=float32; the accumulator is always f32."""
    lanes = 128

    def pad(c):
        return max(c, lanes) if c % lanes else c

    for th in (64, 32, 16, 8, 4):
        if h % th:
            continue
        # center in (x2 double-buffer) + z + flat zs + acc f32 + out (x2)
        est = (
            th * w * pad(c1) * itemsize * 2
            + (th + 2) * w * pad(c1) * itemsize
            + th * w * pad(c1) * itemsize
            + th * w * pad(c2) * 4
            + th * w * pad(c2) * itemsize * 2
            + 9 * pad(c1) * pad(c2) * itemsize
        )
        if est <= 28 * 1024 * 1024:
            return th
    return None


def _kernel(up_ref, c_ref, down_ref, a_ref, b_ref, w_ref, out_ref, *, th, w):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    a = a_ref[0][None, None, :]
    b = b_ref[0][None, None, :]

    def relu_aff(x):
        return jnp.maximum(x * a + b, jnp.zeros([], x.dtype))

    zero = jnp.zeros([], c_ref.dtype)
    zc = relu_aff(c_ref[0])  # (TH, W, C1)
    zu = jnp.where(j > 0, relu_aff(up_ref[0]), zero)  # (1, W, C1)
    zd = jnp.where(j < n_j - 1, relu_aff(down_ref[0]), zero)
    z = jnp.concatenate([zu, zc, zd], axis=0)  # (TH+2, W, C1)

    c2 = w_ref.shape[3]
    col = jax.lax.broadcasted_iota(jnp.int32, (th * w, 1), 0) % w
    fzero = jnp.zeros([], jnp.float32)
    acc = jnp.zeros((th * w, c2), jnp.float32)
    for dy in range(3):
        # Output row r, tap (dy,dx) reads z row r+dy (z row 0 = image row
        # r0-1): a static leading-dim slice, reshaped to the MXU matmul.
        zs = z[dy : dy + th].reshape(th * w, -1)
        for dx in range(3):
            p = jnp.dot(zs, w_ref[dy, dx], preferred_element_type=jnp.float32)
            # p[(r, wc)] = z[r+dy, wc] @ w; the tap wants z[r+dy, wc+dx-1],
            # so shift the product by 1-dx and zero the wrapped edge column.
            if dx == 0:
                p = jnp.where(col == 0, fzero, pltpu.roll(p, 1, 0))
            elif dx == 2:
                # pltpu.roll wants shift >= 0: -1 == th*w - 1 (mod th*w).
                p = jnp.where(col == w - 1, fzero, pltpu.roll(p, th * w - 1, 0))
            acc += p
    out_ref[0] = acc.reshape(th, w, c2).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _pallas_impl(y, a, b, w, interpret=None):
    if interpret is None:
        # Auto: compiled Mosaic on TPU, interpreter everywhere else (the
        # CPU test mesh has no Mosaic backend).
        interpret = jax.default_backend() != "tpu"
    bsz, h, wid, c1 = y.shape
    c2 = w.shape[3]
    th = _pick_th(h, wid, c1, c2, itemsize=y.dtype.itemsize)
    assert th is not None, "supported() must be checked by the caller"
    n_j = h // th

    kern = partial(_kernel, th=th, w=wid)
    return pl.pallas_call(
        kern,
        grid=(bsz, n_j),
        in_specs=[
            pl.BlockSpec(
                (1, 1, wid, c1),
                lambda bi, j: (bi, jnp.maximum(j * th - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, wid, c1),
                lambda bi, j: (bi, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, wid, c1),
                lambda bi, j: (bi, jnp.minimum(j * th + th, h - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c1), lambda bi, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, c1), lambda bi, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, 3, c1, c2),
                lambda bi, j: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wid, c2), lambda bi, j: (bi, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wid, c2), y.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        y,
        y,
        y,
        a.astype(y.dtype).reshape(1, c1),
        b.astype(y.dtype).reshape(1, c1),
        w.astype(y.dtype),
    )


def supported(shape: tuple, c2: int, itemsize: int = 2) -> bool:
    """Whether the kernel handles this (B,H,W,C1) input -> C2 output."""
    _, h, w, c1 = shape
    return h >= 8 and _pick_th(h, w, c1, c2, itemsize) is not None


def recommended(shape: tuple, c2: int, itemsize: int = 2) -> bool:
    """Where the kernel measured FASTER than the XLA chain on v5e.

    Head-to-head per level (outputs/perf_r3/pallas.jsonl, fwd, b8):
    C1>=256 wins — 128^2x256: 2.84 vs 6.01 ms, 64^2x512: 2.63 vs 3.01,
    32^2x512: 2.01 vs 3.20, 64^2x512->256: 2.65 vs 3.60; C1<=128 loses
    (512^2x64: 9.50 vs 5.99 — the C=64 lane padding halves the MXU
    contraction; 256^2x128: 4.94 vs 2.96). DoubleConv uses the kernel
    only where it wins.
    """
    c1 = shape[3]
    return c1 >= 256 and supported(shape, c2, itemsize)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def relu_affine_conv3x3(y, a, b, w, interpret=None):
    """conv3x3_SAME(relu(y*a+b), w) with z never materialized (forward).

    y: [B,H,W,C1] compute dtype; a, b: [C1] f32 (the folded BN apply);
    w: [3,3,C1,C2] f32 params. Returns [B,H,W,C2] in y's dtype.
    """
    return _pallas_impl(y, a, b, w, interpret)


def _fwd(y, a, b, w, interpret):
    return _pallas_impl(y, a, b, w, interpret), (y, a, b, w)


def _bwd(interpret, res, g):
    # XLA backward: recompute z (the same expression the kernel evaluates,
    # so gradients match the unfused path) and let AD derive the
    # conv/affine/relu chain.
    y, a, b, w = res
    _, vjp = jax.vjp(xla_reference, y, a, b, w)
    return vjp(g.astype(y.dtype))


relu_affine_conv3x3.defvjp(_fwd, _bwd)
