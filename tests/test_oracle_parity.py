"""Full-model numerical parity against the reference torch KVNET.

Runs the actual reference implementation (/root/reference/code, imported at
runtime on CPU torch by tools/ref_oracle.py) as an oracle: its random-init
state_dict is pulled through ``utils/torch_import.import_torch_state_dict``
and the composed forward — importer name map x layout transforms x sweep
geometry x BN batch statistics x R-Net plumbing — is asserted end to end on
identical inputs, for both the first-frame path and the K-Net fusion path
(``KVNET.py:93-185``), plus the Bayesian prediction resample
(``test_utils/test_KVNet.py:47-62``).

This is the test that makes released-weight parity checkable: any transposed
kernel flip, BN scale/bias swap, or half-pixel convention drift anywhere in
the stack fails here.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from neuralrgbd_tpu.config import ModelConfig  # noqa: E402
from neuralrgbd_tpu.models.kvnet import KVNet  # noqa: E402
from neuralrgbd_tpu.ops.camera import camera_from_K  # noqa: E402
from neuralrgbd_tpu.ops.dpv import resample_dpv  # noqa: E402
from neuralrgbd_tpu.utils.torch_import import import_torch_state_dict  # noqa: E402

# The reference architecture only closes at feature_dim=64: the R-Net's C1 is
# hardwired to feature_dim/2 (KVNET.py:83-85) while the layer1 skip is always
# 32 channels (psm_submodule.py:94), so 64 is the one self-consistent value —
# and the one the released weights use. D and the window are free.
FEATURE_DIM = 64
NDEPTH = 16
T_WIN_R = 2
IMG_HW = (256, 384)


@pytest.fixture(scope="module")
def oracle_bundle():
    from tools.ref_oracle import ReferenceOracle

    oracle = ReferenceOracle(feature_dim=FEATURE_DIM, ndepth=NDEPTH,
                             t_win_r=T_WIN_R, img_hw=IMG_HW, seed=0)
    rng = np.random.RandomState(7)
    H, W = IMG_HW
    V = 2 * T_WIN_R
    ref = rng.randn(H, W, 3).astype(np.float32)
    srcs = rng.randn(V, H, W, 3).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    for v in range(V):
        angle = 0.03 * (v - V / 2)
        c, s = np.cos(angle), np.sin(angle)
        poses[v, :3, :3] = np.array(
            [[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
        poses[v, :3, 3] = rng.randn(3).astype(np.float32) * 0.08

    out_first = oracle.forward(ref, srcs, poses)

    # a non-trivial valid prediction for the fusion path
    logits = rng.randn(NDEPTH, H // 4, W // 4).astype(np.float32)
    bv_predict = logits - np.log(np.sum(np.exp(logits), axis=0,
                                        keepdims=True))
    out_fused = oracle.forward(ref, srcs, poses, bv_predict)
    pred_next = oracle.predict_next(out_fused["dpv"],
                                    np.linalg.inv(poses[T_WIN_R]))

    return {
        "oracle": oracle,
        "state_dict": oracle.state_dict(),
        "inputs": (ref, srcs, poses, bv_predict),
        "out_first": out_first,
        "out_fused": out_fused,
        "pred_next": pred_next,
    }


@pytest.fixture(scope="module")
def our_model(oracle_bundle):
    import jax

    cfg = ModelConfig(feature_dim=FEATURE_DIM, kv_feature_dim=FEATURE_DIM,
                      ndepth=NDEPTH, t_win_r=T_WIN_R)
    model = KVNet(cfg=cfg, single_refine=False)
    ref, srcs, poses, bv_predict = oracle_bundle["inputs"]
    cam = camera_from_K(oracle_bundle["oracle"].K_dpv)
    d_candi = jnp.asarray(oracle_bundle["oracle"].d_candi)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ref), jnp.asarray(srcs),
        jnp.asarray(poses), cam, d_candi, jnp.asarray(bv_predict),
        jnp.asarray(True),
    )
    params, report = import_torch_state_dict(
        oracle_bundle["state_dict"], params)
    # every one of our leaves must be overwritten by a torch tensor
    assert report["n_imported"] == report["n_params_total"], report
    assert not report["missing_flax_keys"], report
    assert not report["shape_mismatches"], report

    apply = jax.jit(model.apply, static_argnames=())

    def run(bv_predict_np, valid):
        out = apply(params, jnp.asarray(ref), jnp.asarray(srcs),
                    jnp.asarray(poses), cam, d_candi,
                    jnp.asarray(bv_predict_np), jnp.asarray(valid))
        return jax.tree_util.tree_map(np.asarray, out)

    return cfg, cam, d_candi, run


def _close(ours, ref, name, atol):
    np.testing.assert_allclose(
        ours, ref, rtol=2e-4, atol=atol,
        err_msg=f"{name}: full-model divergence vs reference torch KVNET")


def test_first_frame_path(oracle_bundle, our_model):
    _, _, _, run = our_model
    _, _, _, bv_predict = oracle_bundle["inputs"]
    out = run(bv_predict, False)
    ref = oracle_bundle["out_first"]
    _close(out.bv_cur, ref["bv_cur"], "bv_cur", atol=2e-3)
    _close(out.dpv, ref["dpv"], "dpv", atol=2e-3)
    _close(out.dpv_cur_refined, ref["dpv_cur_refined"], "dpv_cur_refined",
           atol=5e-3)
    _close(out.dpv_refined, ref["dpv_refined"], "dpv_refined", atol=5e-3)


def test_knet_fusion_path(oracle_bundle, our_model):
    _, _, _, run = our_model
    _, _, _, bv_predict = oracle_bundle["inputs"]
    out = run(bv_predict, True)
    ref = oracle_bundle["out_fused"]
    _close(out.bv_cur, ref["bv_cur"], "bv_cur", atol=2e-3)
    _close(out.dpv, ref["dpv"], "dpv(fused)", atol=2e-3)
    _close(out.dpv_refined, ref["dpv_refined"], "dpv_refined(fused)",
           atol=5e-3)


def test_prediction_resample(oracle_bundle, our_model):
    import math

    _, cam, d_candi, run = our_model
    _, _, poses, bv_predict = oracle_bundle["inputs"]
    out = run(bv_predict, True)
    D = NDEPTH
    rel = jnp.asarray(np.linalg.inv(poses[T_WIN_R]))
    pred = resample_dpv(jnp.asarray(out.dpv), rel, cam, d_candi,
                        padding_value=math.log(1.0 / D),
                        clamp_to=(-1000.0, 0.0))
    np.testing.assert_allclose(np.asarray(pred), oracle_bundle["pred_next"],
                               rtol=2e-4, atol=5e-3)


# ---------------------------------------------------------------------------
# DGF refinement head (refineNet_name='DGF', KVNET.py:80-81,131-132)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dgf_bundle():
    from tools.ref_oracle import ReferenceOracle

    # DGF has no R-Net feature-width constraint (the guided filter consumes
    # only the RGB frame + the regressed depth), so a smaller extractor keeps
    # the torch oracle fast.
    oracle = ReferenceOracle(feature_dim=32, ndepth=8, t_win_r=T_WIN_R,
                             img_hw=IMG_HW, seed=1, refine_name="DGF")
    rng = np.random.RandomState(3)
    H, W = IMG_HW
    V = 2 * T_WIN_R
    ref = rng.randn(H, W, 3).astype(np.float32)
    srcs = rng.randn(V, H, W, 3).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    for v in range(V):
        poses[v, :3, 3] = rng.randn(3).astype(np.float32) * 0.06
    logits = rng.randn(8, H // 4, W // 4).astype(np.float32)
    bv_predict = logits - np.log(np.sum(np.exp(logits), axis=0,
                                        keepdims=True))
    return {
        "oracle": oracle,
        "inputs": (ref, srcs, poses, bv_predict),
        "out_first": oracle.forward(ref, srcs, poses),
        "out_fused": oracle.forward(ref, srcs, poses, bv_predict),
    }


def test_dgf_head_full_model_parity(dgf_bundle):
    import jax

    cfg = ModelConfig(feature_dim=32, kv_feature_dim=32, ndepth=8,
                      t_win_r=T_WIN_R, refine_net="DGF")
    model = KVNet(cfg=cfg, single_refine=False)
    ref, srcs, poses, bv_predict = dgf_bundle["inputs"]
    cam = camera_from_K(dgf_bundle["oracle"].K_dpv)
    d_candi = jnp.asarray(dgf_bundle["oracle"].d_candi)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ref), jnp.asarray(srcs),
        jnp.asarray(poses), cam, d_candi, jnp.asarray(bv_predict),
        jnp.asarray(True),
    )
    params, report = import_torch_state_dict(
        dgf_bundle["oracle"].state_dict(), params, refine_net="DGF")
    assert report["n_imported"] == report["n_params_total"], report
    assert not report["missing_flax_keys"], report
    assert not report["shape_mismatches"], report

    apply = jax.jit(model.apply)
    for valid, key in ((False, "out_first"), (True, "out_fused")):
        out = apply(params, jnp.asarray(ref), jnp.asarray(srcs),
                    jnp.asarray(poses), cam, d_candi,
                    jnp.asarray(bv_predict), jnp.asarray(valid))
        want = dgf_bundle[key]
        np.testing.assert_allclose(
            np.asarray(out.dpv), want["dpv"], rtol=2e-4, atol=2e-3,
            err_msg="DGF model: fused dpv diverged")
        # reference returns the refined depth map as (1, H, W)
        np.testing.assert_allclose(
            np.asarray(out.dpv_refined), want["dpv_refined"][0],
            rtol=2e-4, atol=5e-3,
            err_msg="DGF model: refined depth map diverged")
        np.testing.assert_allclose(
            np.asarray(out.dpv_cur_refined), want["dpv_cur_refined"][0],
            rtol=2e-4, atol=5e-3,
            err_msg="DGF model: dmap_cur_refined diverged")


# ---------------------------------------------------------------------------
# D-Net optional branches: costV refinement convs (basic.py:189-196,304-308)
# and the in-net Bayesian filtering framework (basic.py:309-321). Neither is
# reachable from the reference KVNET (refine_costV is never passed, and its
# constructor crashes if set — `self.apply(self.weight_init)` names a method
# that doesn't exist, basic.py:196 vs 198), so the oracle here is a directly
# constructed D_NET_BASIC with the constructor bug patched.
# ---------------------------------------------------------------------------

def test_dnet_refine_costv_and_bayes_parity(dgf_bundle):
    import jax

    from tools.ref_oracle import _import_reference

    _import_reference()
    import models.basic as ref_basic

    # patch the reference's broken init hook so the branch can construct
    ref_basic.D_NET_BASIC.weight_init = ref_basic.D_NET_BASIC._weight_init
    torch.manual_seed(11)
    oracle = dgf_bundle["oracle"]
    fe = ref_basic.feature_extractor(feature_dim=32, multi_scale=True)
    dnet = ref_basic.D_NET_BASIC(
        fe, oracle.cam_intrinsics, oracle.d_candi, sigma_soft_max=10.0,
        BV_log=True, normalize=True, use_img_intensity=True,
        output_features=True, refine_costV=True)

    ref, srcs, poses, bv_predict = dgf_bundle["inputs"]
    t_ref = torch.from_numpy(
        np.ascontiguousarray(ref.transpose(2, 0, 1))[None]).float()
    t_srcs = torch.from_numpy(
        np.ascontiguousarray(srcs.transpose(0, 3, 1, 2))[None]).float()
    t_poses = torch.from_numpy(poses[None]).float()
    t_bvp = torch.from_numpy(bv_predict[None]).float()
    with torch.no_grad():
        bv_first, _ = dnet(t_ref, t_srcs, t_poses, BV_predict=None)
        bv_fused, _ = dnet(t_ref, t_srcs, t_poses, BV_predict=t_bvp)

    # remap the bare D_NET state_dict into the importer's KVNET namespace
    sd = {}
    for k, v in dnet.state_dict().items():
        if k.startswith("feature_extraction."):
            # d_net.feature_extraction is the feature_extractor wrapper whose
            # own submodule is also named feature_extraction
            sd["feature_extractor." + k[len("feature_extraction."):]] = \
                v.numpy()
        else:
            sd["d_net." + k] = v.numpy()

    cfg = ModelConfig(feature_dim=32, kv_feature_dim=32, ndepth=8,
                      t_win_r=T_WIN_R, refine_net="DGF",
                      refine_costv=True, dnet_bayes=True)
    model = KVNet(cfg=cfg, single_refine=False)
    cam = camera_from_K(oracle.K_dpv)
    d_candi = jnp.asarray(oracle.d_candi)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ref), jnp.asarray(srcs),
        jnp.asarray(poses), cam, d_candi, jnp.asarray(bv_predict),
        jnp.asarray(True))
    params, report = import_torch_state_dict(sd, params)
    assert not report["unmatched_torch_keys"], report
    assert not report["shape_mismatches"], report
    # with dnet_bayes there must be no K-Net in the tree at all
    assert "kv_net" not in params["params"], list(params["params"])

    apply = jax.jit(model.apply)
    out_first = apply(params, jnp.asarray(ref), jnp.asarray(srcs),
                      jnp.asarray(poses), cam, d_candi,
                      jnp.asarray(bv_predict), jnp.asarray(False))
    out_fused = apply(params, jnp.asarray(ref), jnp.asarray(srcs),
                      jnp.asarray(poses), cam, d_candi,
                      jnp.asarray(bv_predict), jnp.asarray(True))
    np.testing.assert_allclose(
        np.asarray(out_first.bv_cur), bv_first[0].numpy(),
        rtol=2e-4, atol=2e-3,
        err_msg="refine_costV: refined measurement diverged")
    # first-frame fused == measurement (reference returns BV unfused)
    np.testing.assert_allclose(
        np.asarray(out_first.dpv), bv_first[0].numpy(),
        rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out_fused.dpv), bv_fused[0].numpy(),
        rtol=2e-4, atol=2e-3,
        err_msg="in-net Bayesian fusion diverged")
