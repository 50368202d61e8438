"""Fast batched image rotation for on-device augmentation.

Why: the natural JAX rotation (2-D bilinear ``map_coordinates``) lowers to
random-access gathers, which are catastrophically slow on TPU — measured
~56 ms per 512x512x4 tile, making the reference's default rotate
augmentation (conf/config.yaml:47-51) dominate the train step.

This module implements rotation by the classic 3-shear (Paeth)
decomposition:

    R(theta) = ShearX(a) . ShearY(b) . ShearX(a),  a = -tan(theta/2), b = sin(theta)

Each shear resamples along ONE axis with a per-row (or per-column) constant
fractional shift — no 2-D gather. Angles outside (-45, 45] degrees are first
reduced by a quarter-turn rotation (transpose + flips, which are layout ops,
nearly free on TPU).

Two interchangeable shear backends:
- ``impl="gather"``: ``jnp.take_along_axis`` along the minor axis (still a
  gather, but axis-aligned).
- ``impl="pallas"``: a Pallas kernel that walks rows with dynamic VMEM
  slices and blends two shifted row reads — no gather at all.

Semantics follow torchvision F.rotate (reference base_dataset.py:517-531):
counter-clockwise rotation about the image center, bilinear for images
(order=1), nearest for labels (order=0), constant fill. Paeth shears are an
approximation of direct bilinear resampling: sub-pixel differences vs
map_coordinates are expected and fine for augmentation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Interpret-mode switch for the Pallas kernel: lets CI run the exact kernel
# body on CPU (tests/test_rotate.py) so kernel edits can't silently break
# rotation between hardware runs.
_INTERPRET = False


# ---------------------------------------------------------------------------
# Shear primitives.
# ---------------------------------------------------------------------------


def _row_shifts(shear: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """Per-row signed fractional shift for ShearX: shift_y = shear*(y - cy)."""
    cy = (n_rows - 1) / 2.0
    rows = jnp.arange(n_rows, dtype=jnp.float32)
    return shear[..., None] * (rows - cy)  # [..., H]


def _shear_x_gather(
    img: jnp.ndarray,  # [H, W, C]
    shifts: jnp.ndarray,  # [H] fractional shifts (in pixels)
    order: int,
    cval: float,
    nearest_from: int | None = None,
) -> jnp.ndarray:
    """ShearX via take_along_axis: out[y, x] = in[y, x + shift_y].

    ``nearest_from``: channels >= this index resample nearest-neighbor
    regardless of ``order`` (mixed image|label single-pass rotation).
    """
    h, w, c = img.shape
    x = jnp.arange(w, dtype=jnp.float32)[None, :]  # [1, W]
    src = x + shifts[:, None]  # [H, W]
    if order == 0:
        idx = jnp.round(src).astype(jnp.int32)
        valid = (idx >= 0) & (idx < w)
        gathered = jnp.take_along_axis(
            img, jnp.clip(idx, 0, w - 1)[:, :, None], axis=1
        )
        return jnp.where(valid[:, :, None], gathered, cval)
    idx0 = jnp.floor(src).astype(jnp.int32)
    frac = (src - idx0.astype(jnp.float32))[:, :, None]
    if nearest_from is not None:
        chan = jnp.arange(c)[None, None, :]
        frac = jnp.where(chan >= nearest_from, jnp.round(frac), frac)
    valid0 = (idx0 >= 0) & (idx0 < w)
    valid1 = (idx0 + 1 >= 0) & (idx0 + 1 < w)
    g0 = jnp.take_along_axis(img, jnp.clip(idx0, 0, w - 1)[:, :, None], axis=1)
    g1 = jnp.take_along_axis(
        img, jnp.clip(idx0 + 1, 0, w - 1)[:, :, None], axis=1
    )
    g0 = jnp.where(valid0[:, :, None], g0, cval)
    g1 = jnp.where(valid1[:, :, None], g1, cval)
    frac = frac.astype(img.dtype)
    return g0 * (1 - frac) + g1 * frac


def _shear_rolls(
    img: jnp.ndarray,  # [B, H, W, C]
    shifts: jnp.ndarray,  # [B, N_other] fractional pixel shifts per line
    order: int,
    cval: float,
    max_shift: int,
    axis: int = 2,
    nearest_from: int | None = None,
) -> jnp.ndarray:
    """Shear along ``axis`` as bit-decomposed CYCLIC rolls — no gathers,
    no kernels, no padding.

    Per-line shift s is applied by processing its binary digits: one
    static ``jnp.roll`` + line-mask select per bit (~log2(max_shift)
    full-bandwidth VPU passes at 512 px). Rolls wrap modulo the axis
    length; wrapped-in positions are exactly the out-of-range sources, so
    a fused iota-compare mask replaces them with ``cval``. This keeps
    every pass at 1.0x the tile bytes — the earlier padded variant paid
    1.71x per pass for the roll headroom. ``axis=1`` shears columns
    directly (shear-Y) with no transpose round-trip.

    Semantics identical to ``_shear_x_gather`` (modulo the axis swap).
    """
    b, h, w, c = img.shape
    n = img.shape[axis]
    s_max = max(int(max_shift), 1)
    shifts = jnp.clip(shifts, -s_max, s_max)
    if order == 0:
        k = jnp.round(shifts).astype(jnp.int32)
        frac = jnp.zeros_like(shifts)
    else:
        k = jnp.floor(shifts).astype(jnp.int32)
        frac = shifts - k.astype(jnp.float32)

    if axis == 2:
        expand = lambda t: t[:, :, None, None]  # [B, H] lines along W
    elif axis == 1:
        expand = lambda t: t[:, None, :, None]  # [B, W] lines along H
    else:
        raise ValueError(f"shear axis must be 1 or 2, got {axis}")

    s = k + s_max  # [B, N_other] in [0, 2*s_max]
    n_bits = max(1, int(np.ceil(np.log2(2 * s_max + 1))))
    cur = img
    for bit in range(n_bits):
        rolled = jnp.roll(cur, -(1 << bit), axis=axis)
        take = expand(((s >> bit) & 1).astype(bool))
        cur = jnp.where(take, rolled, cur)
    # cur[p] = img[(p + k + s_max) mod n]; undo the s_max bias statically.
    out0 = jnp.roll(cur, s_max, axis=axis)  # img[(p + k) mod n]
    out1 = jnp.roll(cur, s_max - 1, axis=axis)  # img[(p + k + 1) mod n]

    pos = jnp.arange(n, dtype=jnp.int32)
    if axis == 2:
        src = pos[None, None, :] + k[:, :, None]  # [B, H, W]
    else:
        src = pos[None, :, None] + k[:, None, :]  # [B, H, W]
    valid0 = (src >= 0) & (src < n)
    valid1 = (src >= -1) & (src < n - 1)

    f = expand(frac)
    if nearest_from is not None:
        chan = jnp.arange(c)[None, None, None, :]
        f = jnp.where(chan >= nearest_from, jnp.round(f), f)
    # Blend in the image dtype (a f32 fraction would silently promote a
    # bf16 augmentation pipeline back to f32, doubling its HBM traffic).
    f = f.astype(img.dtype)
    cv = jnp.asarray(cval, img.dtype)
    g0 = jnp.where(valid0[..., None], out0, cv)
    g1 = jnp.where(valid1[..., None], out1, cv)
    return g0 * (1 - f) + g1 * f


# -- Pallas row-shear kernel -------------------------------------------------

@partial(jax.jit, static_argnames=("order", "cval", "pad", "nearest_from"))
def _shear_x_pallas_batch(
    img: jnp.ndarray,  # [B, H, W, C] float32
    shifts: jnp.ndarray,  # [B, H] fractional pixel shifts
    order: int,
    cval: float,
    pad: int,
    nearest_from: int | None = None,
) -> jnp.ndarray:
    # One whole-batch pallas_call. The per-call VMEM block budget in
    # _shear_x_pallas_single is deliberately small (96KB): larger blocks
    # made XLA's scoped-vmem accounting overflow the 16MB budget at many
    # tile sizes (opaque Mosaic compile failures through the remote
    # compiler). With small blocks the whole-batch kernel compiles at every
    # size tested (96..512 px, 3..6 channels) and outperforms per-sample
    # calls by ~20% (batch rides the grid pipeline).
    return _shear_x_pallas_single(img, shifts, order, cval, pad, nearest_from)


def _shear_x_pallas_single(
    img: jnp.ndarray,
    shifts: jnp.ndarray,
    order: int,
    cval: float,
    pad: int,
    nearest_from: int | None = None,
) -> jnp.ndarray:
    """Pallas ShearX: per-row dynamic VMEM slices on the sublane dimension.

    Layout stays [B, H, Wpad, C]: the sheared axis (W) is the sublane
    (second-to-minor) dimension — Mosaic supports dynamic-offset slices
    there (it rejects them on the lane dimension). Each row resample is two
    shifted slices and a blend — no gather.
    """
    b, h, w, c = img.shape
    padded = jnp.pad(
        img, ((0, 0), (0, 0), (pad, pad), (0, 0)), constant_values=cval
    )
    wpad = padded.shape[2]
    src = shifts + pad  # slice start into the padded row, >= 0

    # Row- and column-chunked 3-D grid: every dynamic slice is at most
    # W_BLK sublanes and every VMEM block stays small — large tiles
    # otherwise push the Mosaic compile helper over its resource limits.
    # The input row-block spans the full padded width and is indexed by
    # (batch, row-block) only, so consecutive column steps reuse it.
    w_blk = min(w, 128)
    n_wblk = -(-w // w_blk)
    w_round = n_wblk * w_blk
    if w_round != w:
        padded = jnp.pad(
            padded, ((0, 0), (0, 0), (0, w_round - w), (0, 0)),
            constant_values=cval,
        )
        wpad = padded.shape[2]
    # Keep per-call VMEM small: XLA may schedule the per-sample kernel
    # calls concurrently, and their double-buffered block scratch SUMS in
    # scoped vmem (observed 18MB > 16MB failures with larger blocks).
    h_blk = h
    while h_blk * wpad * c * img.dtype.itemsize > 96 * 1024:
        h_blk //= 2
    h_blk = max(h_blk, 1)
    # Row-pad to a whole number of blocks: without this, any h not divisible
    # by h_blk (e.g. the reference's 300 px crops) leaves the last h % h_blk
    # rows of every tile UNWRITTEN — uninitialized HBM garbage/NaNs.
    n_hblk = -(-h // h_blk)
    h_pad = n_hblk * h_blk
    if h_pad != h:
        padded = jnp.pad(
            padded, ((0, 0), (0, h_pad - h), (0, 0), (0, 0)),
            constant_values=cval,
        )
        src = jnp.pad(src, ((0, 0), (0, h_pad - h)))

    if order == 0:
        k = jnp.round(src).astype(jnp.int32)
        frac = jnp.zeros_like(src)
    else:
        k = jnp.floor(src).astype(jnp.int32)
        frac = src - k.astype(jnp.float32)
    k = jnp.clip(k, 0, wpad - w - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_hblk, n_wblk),
        in_specs=[
            pl.BlockSpec(
                (1, h_blk, wpad, c),
                lambda i, j, l, *_: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, h_blk, w_blk, c),
            lambda i, j, l, *_: (i, j, l, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    # Scalar-prefetch args ride in SMEM as int32; the fractional weight is
    # fixed-point (x / 2^16).
    frac_q = jnp.round(frac * 65536.0).astype(jnp.int32)

    def kernel(shift_ref, frac_ref, in_ref, out_ref):
        bidx = pl.program_id(0)
        jblk = pl.program_id(1)
        lblk = pl.program_id(2)

        def body(yy, _):
            y = jblk * h_blk + yy
            kk = lblk * w_blk + shift_ref[bidx, y]
            ff = frac_ref[bidx, y].astype(jnp.float32) * (1.0 / 65536.0)
            if nearest_from is None:
                ffv = ff
            else:
                # Mixed interpolation: channels >= nearest_from use the
                # rounded fraction (nearest-neighbor), the rest bilinear.
                chan = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
                ffv = jnp.where(chan >= nearest_from, jnp.round(ff), ff)
            row0 = in_ref[0, yy, pl.ds(kk, w_blk), :]
            row1 = in_ref[0, yy, pl.ds(kk + 1, w_blk), :]
            out_ref[0, yy, :, :] = row0 * (1.0 - ffv) + row1 * ffv
            return 0

        jax.lax.fori_loop(0, h_blk, body, 0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h_pad, w_round, c), img.dtype),
        grid_spec=grid_spec,
        interpret=_INTERPRET,
    )(k, frac_q, padded)
    return out[:, :h, :w, :]


def _shear_x_batch(
    img: jnp.ndarray,  # [B, H, W, C]
    shear: jnp.ndarray,  # [B]
    order: int,
    cval: float,
    impl: str,
    nearest_from: int | None = None,
    max_slope: float = 0.7072,
) -> jnp.ndarray:
    h = img.shape[1]
    shifts = _row_shifts(shear, h)  # [B, H]
    if impl == "roll":
        s_max = int(np.ceil(max_slope * (h - 1) / 2.0)) + 1
        return _shear_rolls(
            img, shifts, order, float(cval), s_max, axis=2,
            nearest_from=nearest_from,
        )
    if impl == "pallas":
        # Pad must cover the worst-case |shift|: shear_y uses b = sin(45deg)
        # => |shift| <= 0.7071 * H/2 at the tile edge. Rounded so the padded
        # width is a sublane multiple.
        pad = int(np.ceil(h * 0.5 * 0.7072)) + 2
        pad = ((pad + 3) // 4) * 4  # wpad = w + 2*pad stays 8-aligned
        # Shifts beyond the pad would slice out of bounds; clamp (content
        # that far out is fill).
        shifts = jnp.clip(shifts, -pad + 1, pad - 1)
        return _shear_x_pallas_batch(
            img, shifts, order, float(cval), pad, nearest_from
        )
    return jax.vmap(
        lambda im, s: _shear_x_gather(im, s, order, cval, nearest_from)
    )(img, shifts)


def _shear_y_batch(
    img, shear, order, cval, impl, nearest_from=None, max_slope=0.7072
):
    if impl == "roll":
        # Shear columns in place (axis=1): per-column shifts, no transpose
        # round-trip (the swapaxes pair costs two full relayout passes).
        w = img.shape[2]
        shifts = _row_shifts(shear, w)  # [B, W]
        s_max = int(np.ceil(max_slope * (w - 1) / 2.0)) + 1
        return _shear_rolls(
            img, shifts, order, float(cval), s_max, axis=1,
            nearest_from=nearest_from,
        )
    out = _shear_x_batch(
        jnp.swapaxes(img, 1, 2), shear, order, cval, impl, nearest_from,
        max_slope,
    )
    return jnp.swapaxes(out, 1, 2)


# ---------------------------------------------------------------------------
# Quarter-turn reduction + full rotation.
# ---------------------------------------------------------------------------


def _quarter_turns(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Per-sample rotate by k*90 degrees CCW (k in {0,1,2,3}).

    Uses lax.select_n (elementwise multiway select) rather than indexing a
    stacked array — gathers are slow on TPU, selects are pure VPU.
    """
    r0 = img
    r1 = jnp.flip(jnp.swapaxes(img, 1, 2), axis=1)  # 90 CCW
    r2 = jnp.flip(jnp.flip(img, axis=1), axis=2)  # 180
    r3 = jnp.flip(jnp.swapaxes(img, 1, 2), axis=2)  # 270 CCW
    k_b = k[:, None, None, None]
    return jax.lax.select_n(jnp.broadcast_to(k_b, img.shape), r0, r1, r2, r3)


def dihedral_batch(
    img: jnp.ndarray,  # [B, H, W, C], H == W
    transpose: jnp.ndarray,  # [B] bool
    flip_h: jnp.ndarray,  # [B] bool — flip axis 1 (rows)
    flip_w: jnp.ndarray,  # [B] bool — flip axis 2 (cols)
) -> jnp.ndarray:
    """Per-sample dihedral-group element: transpose, then row/col flips.

    Three full-bandwidth select passes — the whole D4 group (all flip x
    quarter-turn combinations) in one shot, replacing the old
    4-copy select_n quarter turn plus two standalone flip selects.
    """
    t = transpose[:, None, None, None]
    out = jnp.where(t, jnp.swapaxes(img, 1, 2), img)
    out = jnp.where(flip_h[:, None, None, None], jnp.flip(out, axis=1), out)
    out = jnp.where(flip_w[:, None, None, None], jnp.flip(out, axis=2), out)
    return out


def rotate_flip_batch(
    img: jnp.ndarray,  # [B, H, W, C] (H == W required)
    angles_deg: jnp.ndarray,  # [B] CCW degrees
    flip_h: jnp.ndarray,  # [B] bool: horizontal flip (axis 2), applied FIRST
    flip_v: jnp.ndarray,  # [B] bool: vertical flip (axis 1), applied second
    order: int = 1,
    cval: float = 0.0,
    impl: str = "roll",
    nearest_from: int | None = None,
) -> jnp.ndarray:
    """hflip -> vflip -> rotate(angle), algebraically fused.

    Semantically identical to flipping then calling ``rotate_batch``, but
    the flips cost nothing extra: writing aug = R(theta) . F with
    R(theta) = Q_k . R(r) (quarter turn + residual), and moving F left
    through the residual rotation (R(r) . F = F . R(sigma r), sigma = -1
    for an odd number of flips), gives

        aug = (Q_k . F) . R(sigma r)

    — residual 3-shear rotation on the raw image, then ONE composed
    dihedral element (D4 group table below) for the quarter turn and both
    flips together. The old path paid two flip selects plus a 4-copy
    select_n; this pays three selects total.
    """
    if img.shape[1] != img.shape[2]:
        raise ValueError(
            "rotate_flip_batch requires square tiles; "
            f"got {img.shape}"
        )
    angles = jnp.asarray(angles_deg, jnp.float32) % 360.0
    k = jnp.floor((angles + 45.0) / 90.0).astype(jnp.int32) % 4
    residual = angles - 90.0 * jnp.floor((angles + 45.0) / 90.0)
    h = jnp.asarray(flip_h, bool)
    v = jnp.asarray(flip_v, bool)
    sigma = jnp.where(h ^ v, -1.0, 1.0)
    theta = sigma * residual * (jnp.pi / 180.0)

    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    out = _shear_x_batch(img, a, order, cval, impl, nearest_from, 0.4143)
    out = _shear_y_batch(out, b, order, cval, impl, nearest_from, 0.7072)
    out = _shear_x_batch(out, a, order, cval, impl, nearest_from, 0.4143)

    # Composed element D = Q_k . F, canonical order transpose->flipH->flipW
    # (flipH = axis 1, flipW = axis 2). Group table (see tests):
    #   k=0: (0,    v,    h)      k=1: (1, ~h,    v)
    #   k=2: (0,   ~v,   ~h)      k=3: (1,  h,   ~v)
    t = (k % 2) == 1
    fh = jax.lax.select_n(k, v, ~h, ~v, h)
    fw = jax.lax.select_n(k, h, v, ~h, ~v)
    return dihedral_batch(out, t, fh, fw)


def rotate_batch(
    img: jnp.ndarray,  # [B, H, W, C] (H == W required for quarter turns)
    angles_deg: jnp.ndarray,  # [B] CCW degrees
    order: int = 1,
    cval: float = 0.0,
    impl: str = "gather",
    nearest_from: int | None = None,
) -> jnp.ndarray:
    """Rotate each sample about its center by its own angle (3-shear).

    ``nearest_from``: channels >= this index use nearest-neighbor
    resampling (single-pass mixed image|label rotation).
    """
    if img.shape[1] != img.shape[2]:
        raise ValueError(
            "rotate_batch requires square tiles (quarter-turn reduction); "
            f"got {img.shape}"
        )
    angles = jnp.asarray(angles_deg, jnp.float32) % 360.0
    # Reduce to residual in (-45, 45]: angle = 90*k + r.
    k = jnp.floor((angles + 45.0) / 90.0).astype(jnp.int32) % 4
    residual = angles - 90.0 * jnp.floor((angles + 45.0) / 90.0)
    theta = residual * (jnp.pi / 180.0)

    out = _quarter_turns(img, k)
    # 3-shear decomposition of the residual rotation (CCW about center).
    # Residual is in (-45, 45], so |a| <= tan(22.5) and |b| <= sin(45) —
    # the per-shear max_slope bounds the roll backend's pad/bit count.
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    out = _shear_x_batch(out, a, order, cval, impl, nearest_from, 0.4143)
    out = _shear_y_batch(out, b, order, cval, impl, nearest_from, 0.7072)
    out = _shear_x_batch(out, a, order, cval, impl, nearest_from, 0.4143)
    return out
