"""PreciseBN: recompute BatchNorm running stats as the true average over
batches (reference: fvcore PreciseBN hook, det yolox_trainer.py:242-250)."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gdrnpp_bop2022_tpu.engine.yolox_trainer import precise_bn_stats


class TinyBN(nn.Module):
    @nn.compact
    def __call__(self, x):
        use_ra = not self.is_mutable_collection("batch_stats")
        return nn.BatchNorm(use_running_average=use_ra, momentum=0.97,
                            epsilon=1e-3)(x)


def test_precise_bn_recovers_true_average():
    rng = np.random.RandomState(0)
    batches = [rng.randn(8, 4, 4, 3).astype(np.float32) * (i + 1) + i
               for i in range(4)]
    m = TinyBN()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(batches[0]))
    stats = precise_bn_stats(m, v["params"], v["batch_stats"],
                             (jnp.asarray(b) for b in batches))
    means = np.mean([b.mean(axis=(0, 1, 2)) for b in batches], axis=0)
    bn = stats["BatchNorm_0"]
    np.testing.assert_allclose(np.asarray(bn["mean"]), means,
                               rtol=1e-4, atol=1e-4)
    vars_ = np.mean([b.reshape(-1, 3).var(axis=0) for b in batches], axis=0)
    np.testing.assert_allclose(np.asarray(bn["var"]), vars_,
                               rtol=1e-3, atol=1e-3)


def test_precise_bn_on_yolox_bn_model():
    from gdrnpp_bop2022_tpu.models.yolox import build_yolox
    model = build_yolox(2, "yolox_s", norm="BN")
    imgs = jnp.asarray(np.random.RandomState(1).randn(2, 64, 64, 3),
                       jnp.float32)
    v = model.init(jax.random.PRNGKey(0), imgs)
    assert "batch_stats" in v
    stats = precise_bn_stats(model, v["params"], v["batch_stats"],
                             [imgs, imgs + 1.0])
    # same tree structure, finite, and actually different from init
    flat_new = jax.tree.leaves(stats)
    flat_old = jax.tree.leaves(v["batch_stats"])
    assert len(flat_new) == len(flat_old)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat_new)
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(flat_new, flat_old)]
    assert max(diffs) > 1e-3


def test_empty_batches_noop():
    m = TinyBN()
    v = m.init(jax.random.PRNGKey(0), jnp.ones((2, 4, 4, 3)))
    out = precise_bn_stats(m, v["params"], v["batch_stats"], [])
    assert out is v["batch_stats"]


def test_checkpoint_persists_batch_stats(tmp_path):
    # regression: BN running stats were dropped by save/restore
    import optax
    from gdrnpp_bop2022_tpu.engine import create_train_state
    from gdrnpp_bop2022_tpu.engine.checkpoint import CheckpointManager

    m = TinyBN()
    x = jnp.asarray(np.random.RandomState(0).randn(4, 4, 4, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    state = create_train_state(m.apply, v["params"], optax.sgd(1e-3),
                               batch_stats=v["batch_stats"])
    # make stats non-trivial
    _, upd = m.apply({"params": state.params,
                      "batch_stats": state.batch_stats}, x,
                     mutable=["batch_stats"])
    state = state.replace(batch_stats=upd["batch_stats"])
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(state, 1)
    fresh = create_train_state(m.apply, v["params"], optax.sgd(1e-3),
                               batch_stats=v["batch_stats"])
    restored = CheckpointManager(str(tmp_path / "ck")).restore_latest(fresh)
    got = np.asarray(restored.batch_stats["BatchNorm_0"]["mean"])
    want = np.asarray(state.batch_stats["BatchNorm_0"]["mean"])
    np.testing.assert_allclose(got, want, atol=1e-7)
    assert not np.allclose(got, 0.0)
