"""End-to-end step tests: infer recurrence, train step, loss semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.data import synthetic_batch
from neuralrgbd_tpu.infer import make_infer_step
from neuralrgbd_tpu.train import create_train_state, make_train_step, nll_dpv_loss

CFG = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                  d_min=0.5, d_max=4.0)
TCFG = TrainConfig(lr=1e-4)
IMG_HW = (32, 48)
N = 2


@pytest.fixture(scope="module")
def setup():
    batch, _ = synthetic_batch(CFG, n_lanes=N, img_hw=IMG_HW, seed=0)
    batch = jax.tree.map(jnp.asarray, batch)
    state = create_train_state(CFG, TCFG, batch)
    return batch, state


def _uniform_bvp(n):
    D = CFG.ndepth
    h, w = IMG_HW[0] // 4, IMG_HW[1] // 4
    return jnp.full((n, D, h, w), -np.log(D), jnp.float32)


def test_nll_loss_ignore_index():
    D, H, W = 4, 2, 2
    logp = jnp.log(jnp.full((D, H, W), 0.25))
    labels = jnp.asarray([[0, 1], [2, 0]], jnp.int32)
    # only 2 non-ignored pixels, each -log(.25)
    out = float(nll_dpv_loss(logp, labels))
    np.testing.assert_allclose(out, -np.log(0.25), rtol=1e-6)
    # all-ignored => 0, not NaN
    out0 = float(nll_dpv_loss(logp, jnp.zeros((H, W), jnp.int32)))
    assert out0 == 0.0


def test_nll_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    D, H, W = 6, 5, 7
    logits = rng.randn(D, H, W).astype(np.float32)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), 0))
    labels = rng.randint(0, D, (H, W)).astype(np.int64)
    ref = torch.nn.functional.nll_loss(
        torch.from_numpy(logp)[None], torch.from_numpy(labels)[None],
        ignore_index=0,
    ).item()
    got = float(nll_dpv_loss(jnp.asarray(logp), jnp.asarray(labels)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_infer_recurrence_two_frames(setup):
    batch, state = setup
    infer_step = make_infer_step(CFG)
    bvp = _uniform_bvp(N)
    valid = jnp.zeros((N,), bool)  # first frame
    out1 = infer_step(state.params, batch, bvp, valid)
    assert out1.depth.shape == (N, *IMG_HW)
    assert np.isfinite(np.asarray(out1.depth)).all()
    d_np = np.asarray(out1.depth)
    assert d_np.min() >= CFG.d_min - 1e-3 and d_np.max() <= CFG.d_max + 1e-3

    # second frame: carry the prediction
    out2 = infer_step(state.params, batch, out1.bv_predict,
                      jnp.ones((N,), bool))
    assert np.isfinite(np.asarray(out2.dpv)).all()
    # fusion must actually change the posterior vs the first frame
    assert not np.allclose(np.asarray(out2.dpv), np.asarray(out1.dpv))
    # bv_predict stays a valid clamped log-DPV
    bp = np.asarray(out2.bv_predict)
    assert (bp <= 0).all() and (bp >= -1000).all()


def test_train_step_reduces_loss_and_updates(setup):
    batch, state = setup
    train_step = make_train_step(CFG, TCFG)
    bvp = _uniform_bvp(N)
    rng = jax.random.PRNGKey(0)
    out = train_step(state, batch, bvp, jnp.zeros((N,), bool), rng)
    loss1 = float(out.loss)
    assert np.isfinite(loss1) and loss1 > 0
    assert int(out.state.step) == 1
    # params changed
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(out.state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))

    # same batch repeatedly (fresh uniform carry): loss should go down
    st = out.state
    loss_prev = loss1
    for i in range(4):
        o = train_step(st, batch, _uniform_bvp(N), jnp.zeros((N,), bool), rng)
        st = o.state
    assert float(o.loss) < loss1


def test_train_step_second_frame_uses_carry(setup):
    batch, state = setup
    train_step = make_train_step(CFG, TCFG)
    out1 = train_step(state, batch, _uniform_bvp(N), jnp.zeros((N,), bool),
                      jax.random.PRNGKey(0))
    out2 = train_step(out1.state, batch, out1.bv_predict,
                      jnp.ones((N,), bool), jax.random.PRNGKey(1))
    assert np.isfinite(float(out2.loss))
    bp = np.asarray(out2.bv_predict)
    assert np.isfinite(bp).all() and (bp <= 0).all()


def test_invalid_lane_masked(setup):
    """An invalid lane must not contribute to the loss."""
    batch, state = setup
    train_step = make_train_step(CFG, TCFG)
    b2 = dict(batch)
    b2["lane_valid"] = jnp.asarray([True, False])
    # poison lane 1's labels; loss must be unchanged vs lane-0-only
    b3 = dict(b2)
    b3["dmap_digit"] = b2["dmap_digit"].at[1].set(CFG.ndepth - 1)
    o2 = train_step(state, b2, _uniform_bvp(N), jnp.zeros((N,), bool),
                    jax.random.PRNGKey(0))
    o3 = train_step(state, b3, _uniform_bvp(N), jnp.zeros((N,), bool),
                    jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(o2.loss), float(o3.loss), rtol=1e-6)
