"""Training subsystem tests: loss invariances, convergence, sharding, resume.

The reference has no training path (SURVEY.md §0: inference-only); these
tests gate the beyond-reference fine-tune/distill capability the same way
the parity suites gate serving.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from monocular_depth_estimation_trt_tpu.training import (
    TrainState,
    align_scale_shift,
    create_train_state,
    distill,
    distillation_loss,
    gradient_matching_loss,
    load_train_state,
    make_train_step,
    save_train_state,
    shard_batch_tree,
    shard_train_state,
    silog_loss,
    ssi_loss,
)
from monocular_depth_estimation_trt_tpu.parallel.mesh import get_mesh
from monocular_depth_estimation_trt_tpu.parallel.sharding import vit_tp_rules


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def test_align_scale_shift_recovers_affine(rng):
    pred = _rand(rng, 2, 16, 16)
    target = 3.5 * pred - 1.25
    s, t = align_scale_shift(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(np.asarray(s), [3.5, 3.5], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t), [-1.25, -1.25], rtol=1e-4)


def test_ssi_loss_affine_invariant(rng):
    """SSI loss is invariant to affine maps of both pred and target."""
    pred = jnp.asarray(_rand(rng, 2, 16, 16))
    target = jnp.asarray(np.abs(_rand(rng, 2, 16, 16)))
    base = ssi_loss(pred, target)
    assert float(ssi_loss(2.0 * pred + 3.0, target)) == pytest.approx(
        float(base), rel=1e-4
    )
    assert float(ssi_loss(pred, 5.0 * target + 1.0)) == pytest.approx(
        float(base), rel=1e-4
    )


def test_ssi_loss_zero_at_perfect_alignment(rng):
    target = jnp.asarray(np.abs(_rand(rng, 1, 12, 12)))
    assert float(ssi_loss(0.5 * target + 2.0, target)) < 1e-5


def test_ssi_loss_respects_mask(rng):
    pred = jnp.asarray(_rand(rng, 1, 8, 8))
    target = pred * 2.0
    # Corrupt half the pixels, mask them out — loss stays ~0.
    bad = target.at[:, :4].set(99.0)
    mask = jnp.ones((1, 8, 8)).at[:, :4].set(0.0)
    assert float(ssi_loss(pred, bad, mask)) < 1e-5
    assert float(ssi_loss(pred, bad)) > 0.1


def test_gradient_matching_zero_for_aligned(rng):
    target = jnp.asarray(_rand(rng, 1, 32, 32))
    assert float(gradient_matching_loss(2.0 * target + 1.0, target)) < 1e-5
    noisy = target + jnp.asarray(_rand(rng, 1, 32, 32)) * 0.5
    assert float(gradient_matching_loss(noisy, target)) > 0.01


def test_silog_scale_invariant(rng):
    pred = jnp.asarray(np.abs(_rand(rng, 2, 8, 8)) + 0.5)
    target = jnp.asarray(np.abs(_rand(rng, 2, 8, 8)) + 0.5)
    base = silog_loss(pred, target, lam=1.0)
    # lam=1.0 makes it fully scale-invariant; pure scaling leaves it fixed.
    assert float(silog_loss(4.0 * pred, target, lam=1.0)) == pytest.approx(
        float(base), rel=1e-4
    )
    assert float(silog_loss(target, target)) < 1e-5


def test_losses_are_grad_safe(rng):
    """All losses differentiate cleanly (no NaNs from the masked/branchless
    closed forms) — including at the degenerate constant-prediction point."""
    target = jnp.asarray(np.abs(_rand(rng, 1, 8, 8)))
    for fn in (ssi_loss, gradient_matching_loss, distillation_loss):
        g = jax.grad(lambda p: fn(p, target))(jnp.ones((1, 8, 8)) * 0.3)
        assert np.isfinite(np.asarray(g)).all(), fn.__name__


def test_silog_grad_safe_at_zero_variance(rng):
    """sqrt'(0) is infinite: an exact fit or a fully-masked sample must not
    produce NaN gradients (they would poison every param in one step)."""
    target = jnp.asarray(np.abs(_rand(rng, 1, 8, 8)) + 0.5)
    # exact fit: variance term is exactly 0
    g = jax.grad(lambda p: silog_loss(p, target))(target)
    assert np.isfinite(np.asarray(g)).all()
    # fully-masked sample alongside a live one
    mask = jnp.stack([jnp.zeros((8, 8)), jnp.ones((8, 8))])
    t2 = jnp.concatenate([target, target])
    g = jax.grad(lambda p: silog_loss(p, t2, mask))(t2 * 1.3)
    assert np.isfinite(np.asarray(g)).all()


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------


class _TinyNet:
    """One-conv 'depth net' closure: params pytree + apply."""

    @staticmethod
    def init(rng_key):
        k = jax.random.normal(rng_key, (3, 3, 3, 1)) * 0.1
        return {"conv": {"kernel": k, "bias": jnp.zeros((1,))}}

    @staticmethod
    def apply(params, images):
        y = jax.lax.conv_general_dilated(
            images, params["conv"]["kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y[..., 0] + params["conv"]["bias"][0])


def _fit_problem(rng):
    """Synthetic: target disparity is a fixed linear map of the image."""
    images = jnp.asarray(np.abs(_rand(rng, 8, 16, 16, 3)))
    target = images[..., 0] * 2.0 + images[..., 1] * 0.5
    return images, target


def test_train_step_reduces_loss(rng):
    images, target = _fit_problem(rng)
    tx = optax.adam(3e-2)

    def loss_fn(params, batch):
        imgs, tgt = batch
        return ssi_loss(_TinyNet.apply(params, imgs), tgt)

    step = make_train_step(loss_fn, tx)
    state = create_train_state(_TinyNet.init(jax.random.PRNGKey(0)), tx)
    losses = []
    for _ in range(40):
        state, m = step(state, (images, target))
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.5 * losses[0]
    assert int(state.step) == 40


def test_grad_accumulation_matches_full_batch(rng):
    images, target = _fit_problem(rng)
    tx = optax.sgd(1e-2)

    def loss_fn(params, batch):
        imgs, tgt = batch
        return jnp.mean((_TinyNet.apply(params, imgs) - tgt) ** 2)

    params0 = _TinyNet.init(jax.random.PRNGKey(1))
    full = make_train_step(loss_fn, tx, donate=False)
    accum = make_train_step(loss_fn, tx, accum_steps=4, donate=False)
    s_full, m_full = full(create_train_state(params0, tx), (images, target))
    s_acc, m_acc = accum(create_train_state(params0, tx), (images, target))
    # MSE over microbatches of equal size averages to the full-batch MSE.
    assert float(m_acc["loss"]) == pytest.approx(float(m_full["loss"]), rel=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        s_full.params, s_acc.params,
    )


def test_remat_matches_plain(rng):
    images, target = _fit_problem(rng)
    tx = optax.sgd(1e-2)

    def loss_fn(params, batch):
        imgs, tgt = batch
        return ssi_loss(_TinyNet.apply(params, imgs), tgt)

    params0 = _TinyNet.init(jax.random.PRNGKey(2))
    plain = make_train_step(loss_fn, tx, donate=False)
    remat = make_train_step(loss_fn, tx, remat=True, donate=False)
    s_p, _ = plain(create_train_state(params0, tx), (images, target))
    s_r, _ = remat(create_train_state(params0, tx), (images, target))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        s_p.params, s_r.params,
    )


# ---------------------------------------------------------------------------
# Sharded training on the virtual mesh
# ---------------------------------------------------------------------------


def _tiny_da_model():
    from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
        DepthAnythingV2,
    )
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    cfg = ViTConfig(dim=64, depth=2, num_heads=4, pretrain_img_size=70)
    return DepthAnythingV2(
        encoder="tiny", dtype=jnp.float32, attn_impl="xla", vit_config=cfg,
        head_features=32, head_out_channels=(16, 32, 64, 64),
        out_indices=(0, 1, 0, 1),
    )


def test_sharded_train_step_matches_single_device(rng):
    """DP+TP sharded training produces the same update as unsharded."""
    model = _tiny_da_model()
    images = jnp.asarray(np.abs(_rand(rng, 4, 70, 70, 3)))
    target = images[..., 0] + 0.3 * images[..., 2]
    params0 = model.init(jax.random.PRNGKey(0), images[:1])["params"]
    tx = optax.adamw(1e-3)

    def loss_fn(params, batch):
        imgs, tgt = batch
        pred = model.apply({"params": params}, imgs)
        return ssi_loss(pred, tgt)

    step = make_train_step(loss_fn, tx, donate=False)

    # Unsharded baseline.
    s0 = create_train_state(params0, tx)
    s1, m1 = step(s0, (images, target))

    # Sharded: 4-way data x 2-way tensor parallel over 8 virtual devices.
    mesh = get_mesh((4, 2), ("data", "model"))
    rules = vit_tp_rules()
    ss = shard_train_state(mesh, rules, create_train_state(params0, tx))
    batch_sh = shard_batch_tree(mesh, (images, target))
    s1_sh, m1_sh = step(ss, batch_sh)

    assert float(m1_sh["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-4)
    a = jax.device_get(s1.params["depth_head"])
    b = jax.device_get(s1_sh.params["depth_head"])
    # Adam's rsqrt(nu) amplifies fp32 reduction-order drift for near-zero
    # second moments; drift stays well under the 1e-3 update magnitude.
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(x, y, rtol=5e-2, atol=5e-4), a, b
    )
    # The TP-sharded leaves really are distributed over the 'model' axis.
    qkv = s1_sh.params["pretrained"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert len(qkv.sharding.device_set) >= 2


# ---------------------------------------------------------------------------
# Checkpoint / resume
# ---------------------------------------------------------------------------


def test_train_state_resume_roundtrip(tmp_path, rng):
    images, target = _fit_problem(rng)
    tx = optax.adam(1e-2)

    def loss_fn(params, batch):
        imgs, tgt = batch
        return ssi_loss(_TinyNet.apply(params, imgs), tgt)

    step = make_train_step(loss_fn, tx, donate=False)
    state = create_train_state(_TinyNet.init(jax.random.PRNGKey(3)), tx)
    for _ in range(3):
        state, _ = step(state, (images, target))

    path = str(tmp_path / "ckpt")
    save_train_state(path, state)
    fresh = create_train_state(_TinyNet.init(jax.random.PRNGKey(3)), tx)
    resumed = load_train_state(path, fresh)
    assert int(resumed.step) == 3

    # One more step from both must agree exactly (optimizer moments resumed).
    s_a, m_a = step(state, (images, target))
    s_b, m_b = step(resumed, (images, target))
    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), abs=1e-7)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-7),
        s_a.params, s_b.params,
    )


# ---------------------------------------------------------------------------
# Distillation end-to-end
# ---------------------------------------------------------------------------


def test_distill_student_learns_teacher(rng):
    """Student converges toward a synthetic teacher's relative structure."""
    imgs = np.abs(_rand(rng, 4, 16, 16, 3))

    def teacher_fn(images):
        return np.asarray(images[..., 0] * 2.0 + images[..., 1] * 0.5)

    state, history = distill(
        teacher_fn,
        _TinyNet.apply,
        _TinyNet.init(jax.random.PRNGKey(4)),
        [imgs],
        steps=30,
        learning_rate=3e-2,
        warmup=2,
        log_every=0,
    )
    assert history[-1] < 0.6 * history[0]
    assert int(state.step) == 30
