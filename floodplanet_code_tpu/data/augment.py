"""On-device batched augmentation (flips + rotation), jit-compiled.

The reference augments per-sample on host CPU with torchvision transforms
(base_dataset.py:494-555): coin-flip hflip/vflip and a uniform random
rotation, applied identically to image and mask. Here the whole *batch* is
augmented on device inside the train step — zero host work, fused by XLA,
and the random state is an explicit jax PRNG key.

Semantics match the reference:
- Each transform fires per-sample with its configured likelihood.
- Rotation angle ~ U[min_rot_angle, max_rot_angle] degrees; image sampled
  bilinearly, label nearest-neighbor (torchvision F.rotate defaults).
- Out-of-bounds rotation fill is 0 for both image and label — the
  reference's behavior (labels get dry-class 0, quirk SURVEY.md §7.11).
  ``fill_ignore=True`` fills the label with ignore_index instead (the
  documented fix, off by default for parity).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class TransformParams:
    """Static augmentation config (mirrors conf/config.yaml:41-52)."""

    hflip_active: bool = True
    hflip_likelihood: float = 0.5
    vflip_active: bool = True
    vflip_likelihood: float = 0.5
    rotate_active: bool = True
    rotate_likelihood: float = 0.5
    min_rot_angle: float = 0.0
    max_rot_angle: float = 360.0
    fill_ignore: bool = False
    # Compute dtype for the fused rotate+flip path. The train step consumes
    # the image in bf16 anyway, so fit_model sets this to tpu.compute_dtype
    # — halving the augmentation program's HBM traffic. float32 default
    # keeps bit-exact flip/rotate semantics for parity tests and callers
    # that keep f32 pipelines.
    dtype: str = "float32"
    # Rotation backend: "auto" (= "shear_roll", the fastest on every
    # backend), "shear_roll" (bit-decomposed static rolls), "shear"
    # (gather 3-shear), "shear_pallas" (Pallas row-shear kernel), or
    # "map_coordinates" (direct bilinear gather — slow on TPU, kept as
    # the correctness oracle).
    rotate_impl: str = "auto"

    @classmethod
    def from_config(cls, transforms_cfg) -> "TransformParams":
        if transforms_cfg is None:
            return cls(False, 0, False, 0, False, 0)
        t = transforms_cfg
        return cls(
            hflip_active=bool(t.hflip.active),
            hflip_likelihood=float(t.hflip.likelihood),
            vflip_active=bool(t.vflip.active),
            vflip_likelihood=float(t.vflip.likelihood),
            rotate_active=bool(t.rotate.active),
            rotate_likelihood=float(t.rotate.likelihood),
            min_rot_angle=float(t.rotate.min_rot_angle),
            max_rot_angle=float(t.rotate.max_rot_angle),
            fill_ignore=bool(t.select("rotate.fill_ignore", False))
            if hasattr(t, "select")
            else bool(getattr(t.rotate, "fill_ignore", False)),
        )

    @property
    def any_active(self) -> bool:
        return self.hflip_active or self.vflip_active or self.rotate_active


def _rotate_one(img: jnp.ndarray, angle_rad: jnp.ndarray, order: int, cval: float):
    """Rotate one HWC array around its center (torchvision F.rotate analog)."""
    h, w, c = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    # Inverse-rotate output coords to find source coords.
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    src_y = cos * (yy - cy) + sin * (xx - cx) + cy
    src_x = -sin * (yy - cy) + cos * (xx - cx) + cx
    coords = jnp.stack(
        [jnp.broadcast_to(src_y, (h, w)), jnp.broadcast_to(src_x, (h, w))]
    )

    def sample_channel(channel):
        return jax.scipy.ndimage.map_coordinates(
            channel, list(coords), order=order, mode="constant", cval=cval
        )

    return jnp.stack(
        [sample_channel(img[:, :, i]) for i in range(c)], axis=-1
    )


@partial(jax.jit, static_argnames=("params", "ignore_index"))
def augment_batch(
    rng: jax.Array,
    image: jnp.ndarray,
    target: jnp.ndarray,
    params: TransformParams,
    ignore_index: int = 0,
):
    """Augment a batch: image [B,H,W,C] float, target [B,H,W] int.

    Returns (image, target) with per-sample random flips/rotations applied
    identically to both.
    """
    if not params.any_active:
        return image, target
    b = image.shape[0]
    k_h, k_v, k_r, k_a = jax.random.split(rng, 4)
    do_h = (
        jax.random.uniform(k_h, (b,)) < params.hflip_likelihood
        if params.hflip_active
        else jnp.zeros((b,), bool)
    )
    do_v = (
        jax.random.uniform(k_v, (b,)) < params.vflip_likelihood
        if params.vflip_active
        else jnp.zeros((b,), bool)
    )
    do_r = (
        jax.random.uniform(k_r, (b,)) < params.rotate_likelihood
        if params.rotate_active
        else jnp.zeros((b,), bool)
    )
    angles = jax.random.uniform(
        k_a,
        (b,),
        minval=params.min_rot_angle,
        maxval=params.max_rot_angle,
    ) * (jnp.pi / 180.0)
    angles = jnp.where(do_r, angles, 0.0)

    label_fill = float(ignore_index) if params.fill_ignore else 0.0

    rotate_impl = params.rotate_impl
    if rotate_impl == "auto":
        # Bit-decomposed static-roll shear: fastest measured backend on
        # TPU (14.4 ms vs 59.4 Pallas vs 110 gather, 8x512^2x6) and pure
        # XLA, so it is the default everywhere.
        rotate_impl = "shear_roll"
    if params.rotate_active and image.shape[1] != image.shape[2]:
        # Quarter-turn reduction needs square tiles; non-square crops
        # fall back to the direct-bilinear path — a large perf cliff
        # (gather-based resampling), so say so once per shape.
        import warnings

        warnings.warn(
            f"rotation of non-square crops {image.shape[1]}x"
            f"{image.shape[2]} uses the slow map_coordinates path "
            "(~50 ms/tile on TPU); use square crops for the fast "
            "shear-roll backend",
            stacklevel=2,
        )
        rotate_impl = "map_coordinates"

    if params.rotate_active and rotate_impl in (
        "shear",
        "shear_pallas",
        "shear_roll",
    ):
        # Fused flips + rotation: the flips ride the shear-rotation's
        # dihedral pass for free (ops/rotate.rotate_flip_batch), and the
        # whole program runs in ``params.dtype`` — bf16 halves its HBM
        # traffic while the train step consumes bf16 anyway.
        from floodplanet_code_tpu.ops.rotate import rotate_flip_batch

        impl = {
            "shear": "gather",
            "shear_pallas": "pallas",
            "shear_roll": "roll",
        }[rotate_impl]
        dt = jnp.bfloat16 if params.dtype == "bfloat16" else jnp.float32
        angles_deg = angles * (180.0 / jnp.pi)
        # Single pass over [image | label | validity]: the label channel
        # resamples nearest-neighbor, the validity channel marks
        # rotated-out regions for the label fill. Label values and the 0/1
        # validity are small ints — exact in bf16.
        n_img = image.shape[-1]
        combined = jnp.concatenate(
            [
                image.astype(dt),
                target[..., None].astype(dt),
                jnp.ones(target.shape + (1,), dt),
            ],
            axis=-1,
        )
        rotated = rotate_flip_batch(
            combined,
            angles_deg,
            do_h,
            do_v,
            order=1,
            cval=0.0,
            impl=impl,
            nearest_from=n_img,
        )
        image = rotated[..., :n_img]
        inside = rotated[..., n_img + 1] > 0.5
        tgt_f = jnp.where(inside, rotated[..., n_img], dt(label_fill))
        target = jnp.rint(tgt_f.astype(jnp.float32)).astype(target.dtype)
        return image, target

    def flips(img, tgt, fh, fv):
        img = jnp.where(fh, img[:, ::-1, :], img)
        tgt = jnp.where(fh, tgt[:, ::-1], tgt)
        img = jnp.where(fv, img[::-1, :, :], img)
        tgt = jnp.where(fv, tgt[::-1, :], tgt)
        return img, tgt

    image, target = jax.vmap(flips)(image, target, do_h, do_v)

    if params.rotate_active:  # map_coordinates oracle path

        def rot(img, tgt, angle):
            img = _rotate_one(img, angle, order=1, cval=0.0)
            tgt_f = _rotate_one(
                tgt[:, :, None].astype(jnp.float32),
                angle,
                order=0,
                cval=label_fill,
            )[:, :, 0]
            return img, tgt_f.astype(tgt.dtype)

        image, target = jax.vmap(rot)(image, target, angles)

    return image, target
