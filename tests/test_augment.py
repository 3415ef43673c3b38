"""Device-side train-time augmentation (data.pipeline.augment_tiles).

New framework capability — the reference ships no augmentation at all
(its dataset module is missing, quirk Q1 /root/reference/main_toy.py:11).
D4 must be an exact per-sample pixel permutation; jitter a bounded
per-sample affine; "none" the identity; and the train step must consume
it per-microbatch without changing eval semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu.data import pipeline


def _batch(B=8, H=12, W=12, C=3, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, H, W, C),
                             jnp.float32)


class TestD4:
    def test_none_is_identity(self):
        x = _batch()
        out = pipeline.augment_tiles(jax.random.PRNGKey(1), x, mode="none")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_d4_is_pixel_permutation(self):
        """Every sample's pixel multiset (per channel) is preserved —
        D4 elements never resample or interpolate."""
        x = _batch()
        out = pipeline.augment_tiles(jax.random.PRNGKey(2), x, mode="d4")
        xs = np.sort(np.asarray(x).reshape(x.shape[0], -1, 3), axis=1)
        os_ = np.sort(np.asarray(out).reshape(x.shape[0], -1, 3), axis=1)
        np.testing.assert_array_equal(os_, xs)

    def test_d4_covers_all_eight_elements(self):
        """Across enough samples, all 8 dihedral transforms occur (checked
        against explicitly constructed references)."""
        B = 256
        x = _batch(B=B, H=6, W=6)
        out = np.asarray(pipeline.augment_tiles(jax.random.PRNGKey(3), x,
                                                mode="d4"))
        xn = np.asarray(x)
        refs = []
        for t in (False, True):
            base = np.swapaxes(xn, 1, 2) if t else xn
            for fh in (False, True):
                for fw in (False, True):
                    r = base[:, ::-1] if fh else base
                    r = r[:, :, ::-1] if fw else r
                    refs.append(r)
        hits = set()
        for i in range(B):
            matches = [j for j, r in enumerate(refs)
                       if np.array_equal(out[i], r[i])]
            assert matches, f"sample {i} is not any D4 transform"
            hits.add(matches[0])
        assert len(hits) == 8, f"only saw D4 elements {sorted(hits)}"

    def test_d4_deterministic_in_rng(self):
        x = _batch()
        a = pipeline.augment_tiles(jax.random.PRNGKey(4), x, mode="d4")
        b = pipeline.augment_tiles(jax.random.PRNGKey(4), x, mode="d4")
        c = pipeline.augment_tiles(jax.random.PRNGKey(5), x, mode="d4")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0

    def test_d4_rejects_rectangular(self):
        with pytest.raises(ValueError, match="square"):
            pipeline.augment_tiles(jax.random.PRNGKey(0),
                                   _batch(H=8, W=12), mode="d4")

    def test_unknown_mode_rejected(self):
        with pytest.raises(ValueError, match="expected"):
            pipeline.augment_tiles(jax.random.PRNGKey(0), _batch(),
                                   mode="rot180")


class TestJitter:
    def test_jitter_bounded_affine(self):
        """out = c*x + b with per-sample c in [1-j, 1+j], b in [-j, j] —
        recover c/b from two pixels and check the bounds."""
        j = 0.2
        x = _batch(B=16)
        out = np.asarray(pipeline.augment_tiles(
            jax.random.PRNGKey(6), x, mode="none", jitter=j))
        xn = np.asarray(x)
        for i in range(16):
            p, q = xn[i].ravel()[:2], out[i].ravel()[:2]
            c = (q[1] - q[0]) / (p[1] - p[0])
            b = q[0] - c * p[0]
            assert 1 - j - 1e-4 <= c <= 1 + j + 1e-4
            assert -j - 1e-4 <= b <= j + 1e-4
            np.testing.assert_allclose(out[i], xn[i] * c + b, atol=1e-4)

    def test_zero_jitter_identity(self):
        x = _batch()
        out = pipeline.augment_tiles(jax.random.PRNGKey(7), x,
                                     mode="none", jitter=0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


class TestTrainStepIntegration:
    def _setup(self, augment, jitter=0.0, accum=1):
        import duoformer_tcga_tpu as dft
        from duoformer_tcga_tpu import train as train_lib

        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        model = dft.build_model_no_extra_params(
            num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
            num_heads=12, depth=1)
        sched = train_lib.onecycle_schedule(1e-3, total_steps=10)
        opt = train_lib.make_optimizer(
            sched, weight_decay=1e-4,
            frozen_label_fn=train_lib.backbone_frozen_labels)
        state = train_lib.init_train_state(model, jax.random.PRNGKey(0),
                                           opt)
        step = train_lib.make_train_step(
            model, opt, donate=False, accum_steps=accum,
            frozen_label_fn=train_lib.backbone_frozen_labels,
            augment=augment, jitter=jitter)
        batch = {"image": jax.random.normal(jax.random.PRNGKey(1),
                                            (2, 224, 224, 3)),
                 "label": jnp.array([0, 1], jnp.int32)}
        return state, step, batch

    def test_step_runs_and_differs_from_unaugmented(self):
        state, step, batch = self._setup("d4", jitter=0.1)
        s1, m1 = step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(m1["loss"]))
        state0, step0, _ = self._setup("none")
        _, m0 = step0(state0, batch, jax.random.PRNGKey(2))
        assert float(m0["loss"]) != float(m1["loss"])

    def test_accum_microbatches_augment_independently(self):
        state, step, batch = self._setup("d4", accum=2)
        _, m = step(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(m["loss"]))
