"""3-shear rotation tests (ops/rotate.py) against the direct-bilinear
map_coordinates oracle (data/augment.py:_rotate_one)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from floodplanet_code_tpu.data.augment import TransformParams, _rotate_one, augment_batch
from floodplanet_code_tpu.ops.rotate import rotate_batch


def oracle(img, angle_deg, order, cval=0.0):
    return np.asarray(
        _rotate_one(jnp.asarray(img), jnp.deg2rad(angle_deg), order, cval)
    )


class TestRotateBatch:
    def test_identity(self, rng):
        img = rng.random((2, 32, 32, 3)).astype(np.float32)
        out = np.asarray(rotate_batch(jnp.asarray(img), jnp.zeros(2)))
        np.testing.assert_allclose(out, img, atol=1e-5)

    @pytest.mark.parametrize("angle", [90.0, 180.0, 270.0])
    def test_quarter_turns_exact(self, rng, angle):
        img = rng.random((1, 32, 32, 2)).astype(np.float32)
        got = np.asarray(rotate_batch(jnp.asarray(img), jnp.asarray([angle])))
        want = oracle(img[0], angle, 1)
        np.testing.assert_allclose(got[0], want, atol=1e-4)

    @pytest.mark.parametrize("angle", [17.0, 44.0, 133.0, 251.0, 340.0])
    def test_smooth_image_close_to_bilinear(self, angle):
        h = 48
        yy, xx = np.mgrid[0:h, 0:h] / h
        img = (np.sin(6 * yy) + np.cos(5 * xx) + yy * xx).astype(np.float32)
        img = img[None, :, :, None]
        got = np.asarray(rotate_batch(jnp.asarray(img), jnp.asarray([angle])))
        want = oracle(img[0], angle, 1)
        diff = np.abs(got[0] - want)[8:-8, 8:-8]
        assert diff.mean() < 2e-3
        assert diff.max() < 2e-2

    def test_coherent_label_nearest_agreement(self):
        h = 64
        yy, xx = np.mgrid[0:h, 0:h]
        lbl = (((yy - 40) ** 2 + (xx - 25) ** 2) < 150).astype(np.float32)
        lbl = lbl[None, :, :, None]
        for angle in (33.0, 129.0, 250.0):
            got = np.asarray(
                rotate_batch(jnp.asarray(lbl), jnp.asarray([angle]), order=0)
            )
            want = oracle(lbl[0], angle, 0)
            assert (got[0] == want).mean() > 0.98

    def test_per_sample_angles(self, rng):
        img = rng.random((3, 32, 32, 1)).astype(np.float32)
        angles = jnp.asarray([0.0, 90.0, 180.0])
        got = np.asarray(rotate_batch(jnp.asarray(img), angles))
        np.testing.assert_allclose(got[0], img[0], atol=1e-5)
        np.testing.assert_allclose(got[1], oracle(img[1], 90.0, 1), atol=1e-4)

    def test_fill_value(self):
        img = jnp.ones((1, 32, 32, 1))
        got = np.asarray(
            rotate_batch(img, jnp.asarray([45.0]), order=0, cval=7.0)
        )
        assert (got == 7.0).any()  # corners filled

    def test_non_square_raises(self):
        with pytest.raises(ValueError):
            rotate_batch(jnp.ones((1, 32, 64, 1)), jnp.zeros(1))


class TestPallasShearInterpret:
    """Run the exact Pallas kernel body on CPU via interpret mode so kernel
    edits can't silently break rotation between hardware runs."""

    @pytest.fixture(autouse=True)
    def interpret_mode(self):
        from floodplanet_code_tpu.ops import rotate as rot

        old = rot._INTERPRET
        rot._INTERPRET = True
        # The jitted wrapper captures _INTERPRET at trace time; drop caches
        # so this test (and anything after it) traces fresh.
        rot._shear_x_pallas_batch.clear_cache()
        yield
        rot._INTERPRET = old
        rot._shear_x_pallas_batch.clear_cache()

    @pytest.mark.parametrize("angle", [13.0, 44.0, 200.0, 321.0])
    def test_pallas_matches_gather_shear(self, rng, angle):
        img = rng.random((2, 32, 32, 3)).astype(np.float32)
        angles = jnp.asarray([angle, angle / 2 + 1.0])
        got = np.asarray(
            rotate_batch(jnp.asarray(img), angles, order=1, impl="pallas")
        )
        want = np.asarray(
            rotate_batch(jnp.asarray(img), angles, order=1, impl="gather")
        )
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_pallas_300px_rows_all_written(self, rng):
        """300 px tiles (the reference's crop size) are not divisible by the
        halved row-block; the kernel must row-pad, not leave the last rows
        of every tile unwritten (caused NaN losses in real CV runs)."""
        img = rng.random((1, 300, 300, 1)).astype(np.float32)
        angles = jnp.asarray([25.0])
        got = np.asarray(
            rotate_batch(jnp.asarray(img), angles, order=1, impl="pallas")
        )
        want = np.asarray(
            rotate_batch(jnp.asarray(img), angles, order=1, impl="gather")
        )
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_pallas_mixed_order_matches_gather(self, rng):
        # image channels bilinear + label/validity channels nearest, the
        # exact augment_batch configuration.
        img = rng.random((1, 32, 32, 2)).astype(np.float32)
        lbl = (rng.random((1, 32, 32, 1)) > 0.5).astype(np.float32)
        ones = np.ones((1, 32, 32, 1), np.float32)
        combined = jnp.asarray(np.concatenate([img, lbl, ones], axis=-1))
        angles = jnp.asarray([37.0])
        got = np.asarray(
            rotate_batch(combined, angles, order=1, impl="pallas", nearest_from=2)
        )
        want = np.asarray(
            rotate_batch(combined, angles, order=1, impl="gather", nearest_from=2)
        )
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestRollShear:
    """Bit-decomposed static-roll shear backend vs the gather reference."""

    @pytest.mark.parametrize("angle", [13.0, 44.0, 200.0, 321.0])
    @pytest.mark.parametrize("order", [0, 1])
    def test_roll_matches_gather(self, rng, angle, order):
        img = rng.random((2, 48, 48, 3)).astype(np.float32)
        angles = jnp.asarray([angle, angle / 2 + 1.0])
        got = np.asarray(
            rotate_batch(jnp.asarray(img), angles, order=order, impl="roll")
        )
        want = np.asarray(
            rotate_batch(jnp.asarray(img), angles, order=order, impl="gather")
        )
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_roll_mixed_order_and_fill(self, rng):
        img = rng.random((1, 300, 300, 2)).astype(np.float32)
        lbl = (rng.random((1, 300, 300, 1)) > 0.5).astype(np.float32)
        ones = np.ones((1, 300, 300, 1), np.float32)
        combined = jnp.asarray(np.concatenate([img, lbl, ones], axis=-1))
        angles = jnp.asarray([37.0])
        got = np.asarray(
            rotate_batch(
                combined, angles, order=1, cval=0.0, impl="roll",
                nearest_from=2,
            )
        )
        want = np.asarray(
            rotate_batch(
                combined, angles, order=1, cval=0.0, impl="gather",
                nearest_from=2,
            )
        )
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestAugmentWithShear:
    def test_augment_uses_shear_and_preserves_labels(self, rng):
        params = TransformParams(
            False, 0, False, 0, True, 1.0, 10.0, 80.0, rotate_impl="shear"
        )
        image = jnp.asarray(rng.standard_normal((2, 32, 32, 2)).astype(np.float32))
        target = jnp.asarray(rng.choice([0, 1, 2], (2, 32, 32)).astype(np.int32))
        img, tgt = augment_batch(jax.random.key(0), image, target, params, 0)
        assert set(np.unique(np.asarray(tgt))) <= {0, 1, 2}
        assert img.shape == image.shape

    def test_shear_matches_oracle_impl_statistically(self, rng):
        # Same key => same sampled angles; outputs should be close.
        image = jnp.asarray(rng.random((2, 48, 48, 1)).astype(np.float32))
        # smooth it to avoid noise-resampling artifacts
        image = jax.scipy.signal.convolve2d(
            image[0, :, :, 0], jnp.ones((5, 5)) / 25, mode="same"
        )[None, :, :, None]
        image = jnp.concatenate([image, image])
        target = jnp.zeros((2, 48, 48), jnp.int32)
        p_shear = TransformParams(
            False, 0, False, 0, True, 1.0, 20.0, 70.0, rotate_impl="shear"
        )
        p_oracle = TransformParams(
            False, 0, False, 0, True, 1.0, 20.0, 70.0,
            rotate_impl="map_coordinates",
        )
        a, _ = augment_batch(jax.random.key(3), image, target, p_shear, 0)
        b, _ = augment_batch(jax.random.key(3), image, target, p_oracle, 0)
        diff = np.abs(np.asarray(a) - np.asarray(b))[:, 8:-8, 8:-8]
        assert diff.mean() < 5e-3


class TestRotateFlipFusion:
    """rotate_flip_batch must equal flip-then-rotate_batch (the dihedral
    group algebra in ops/rotate.py: aug = (Q_k . F) . R(sigma r))."""

    @pytest.mark.parametrize("impl", ["roll", "gather"])
    def test_exact_at_quarter_angles(self, rng, impl):
        # Residual-zero angles: the shears are identity, so the fused
        # dihedral must equal flip-then-rotate BIT-exactly.
        from floodplanet_code_tpu.ops.rotate import rotate_flip_batch

        img = jnp.asarray(rng.random((4, 32, 32, 3)).astype(np.float32))
        fh = jnp.asarray([False, True, False, True])
        fv = jnp.asarray([False, False, True, True])
        flipped = jnp.where(fh[:, None, None, None], img[:, :, ::-1, :], img)
        flipped = jnp.where(
            fv[:, None, None, None], flipped[:, ::-1, :, :], flipped
        )
        for angle in [0.0, 90.0, 180.0, 270.0]:
            angles = jnp.full((4,), angle)
            want = np.asarray(rotate_batch(flipped, angles, impl=impl))
            got = np.asarray(rotate_flip_batch(img, angles, fh, fv, impl=impl))
            np.testing.assert_array_equal(got, want, err_msg=f"angle={angle}")

    @pytest.mark.parametrize("impl", ["roll", "gather"])
    def test_matches_flip_then_rotate_smooth(self, rng, impl):
        # Residual angles: the fused form applies the 3-shear before the
        # dihedral (aug = (Q_k.F).R(sigma r)) — for odd quarter turns that
        # is the transposed-order shear decomposition, an equally valid
        # approximation of the same ideal rotation but not bit-identical.
        # Compare on a smooth image with an interior-mean tolerance, like
        # the oracle tests above.
        from floodplanet_code_tpu.ops.rotate import rotate_flip_batch

        base = jnp.asarray(rng.random((48, 48)).astype(np.float32))
        base = jax.scipy.signal.convolve2d(
            base, jnp.ones((5, 5)) / 25, mode="same"
        )
        img = jnp.broadcast_to(base[None, :, :, None], (4, 48, 48, 1))
        fh = jnp.asarray([False, True, False, True])
        fv = jnp.asarray([False, False, True, True])
        flipped = jnp.where(fh[:, None, None, None], img[:, :, ::-1, :], img)
        flipped = jnp.where(
            fv[:, None, None, None], flipped[:, ::-1, :, :], flipped
        )
        for angle in [33.0, 137.0, 251.0, 344.0]:
            angles = jnp.full((4,), angle)
            want = np.asarray(rotate_batch(flipped, angles, impl=impl))
            got = np.asarray(rotate_flip_batch(img, angles, fh, fv, impl=impl))
            diff = np.abs(got - want)[:, 10:-10, 10:-10]
            assert diff.mean() < 5e-3, (angle, diff.mean())

    def test_bf16_labels_exact(self, rng):
        # bf16 fused path: label values and fill must stay exact ints.
        params = TransformParams(
            True, 0.7, True, 0.7, True, 1.0, 10.0, 350.0, dtype="bfloat16"
        )
        image = jnp.asarray(rng.standard_normal((4, 64, 64, 4)).astype(np.float32))
        target = jnp.asarray(rng.choice([0, 1, 2], (4, 64, 64)).astype(np.int32))
        img, tgt = augment_batch(jax.random.key(5), image, target, params, 0)
        assert img.dtype == jnp.bfloat16
        assert tgt.dtype == np.int32
        assert set(np.unique(np.asarray(tgt))) <= {0, 1, 2}

    def test_bf16_close_to_f32(self, rng):
        p16 = TransformParams(True, 0.7, True, 0.7, True, 1.0, 10.0, 350.0,
                              dtype="bfloat16")
        p32 = TransformParams(True, 0.7, True, 0.7, True, 1.0, 10.0, 350.0)
        image = jnp.asarray(rng.random((2, 48, 48, 2)).astype(np.float32))
        target = jnp.zeros((2, 48, 48), jnp.int32)
        a, ta = augment_batch(jax.random.key(9), image, target, p16, 0)
        b, tb = augment_batch(jax.random.key(9), image, target, p32, 0)
        assert np.abs(np.asarray(a, np.float32) - np.asarray(b)).max() < 0.03
        # Same PRNG draws => identical geometry; labels must agree exactly.
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
