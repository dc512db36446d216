"""Layer-level numerical parity with torch + state-dict import mapping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from neuralrgbd_tpu.models.layers import (  # noqa: E402
    BatchNorm,
    ConvB,
    ConvTranspose,
    avg_pool2d,
    leaky_relu,
    upsample_bilinear_ac,
)


def _t2f_conv2d(w):
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
def test_conv2d_matches_torch(rng, stride, dilation):
    tconv = tnn.Conv2d(5, 7, 3, stride=stride,
                       padding=dilation if dilation > 1 else 1,
                       dilation=dilation, bias=False)
    x = rng.randn(1, 5, 12, 16).astype(np.float32)
    ref = tconv(torch.from_numpy(x)).detach().numpy()

    # torch convbn uses padding=dilation when dilation>1 (psm_submodule.py:13)
    conv = ConvB(7, 3, stride, dilation if dilation > 1 else 1, dilation,
                 use_bias=False)
    params = {"params": {"kernel": _t2f_conv2d(tconv.weight)}}
    out = conv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_conv3d_matches_torch(rng):
    tconv = tnn.Conv3d(4, 6, 3, stride=1, padding=1, bias=False)
    x = rng.randn(1, 4, 6, 8, 10).astype(np.float32)
    ref = tconv(torch.from_numpy(x)).detach().numpy()
    conv = ConvB(6, 3, 1, 1, dims=3, use_bias=False)
    w = jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0))
    out = conv.apply({"params": {"kernel": w}},
                     jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3), ref,
                               rtol=1e-4, atol=1e-5)


def test_conv_transpose_matches_torch(rng):
    tconv = tnn.ConvTranspose2d(6, 4, 4, stride=2, padding=1, bias=True)
    x = rng.randn(1, 6, 8, 12).astype(np.float32)
    ref = tconv(torch.from_numpy(x)).detach().numpy()
    ct = ConvTranspose(4, 4, 2, 1, use_bias=True)
    w_t = tconv.weight.detach().numpy()          # (I, O, kh, kw)
    w = jnp.asarray(w_t[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy())
    params = {"params": {"kernel": w,
                         "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    out = ct.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_batchnorm_matches_torch_no_running_stats(rng):
    tbn = tnn.BatchNorm2d(5, track_running_stats=False)
    with torch.no_grad():
        tbn.weight.copy_(torch.rand(5) + 0.5)
        tbn.bias.copy_(torch.rand(5))
    tbn.eval()  # with track_running_stats=False, eval still uses batch stats
    x = rng.randn(3, 5, 8, 8).astype(np.float32)
    ref = tbn(torch.from_numpy(x)).detach().numpy()
    bn = BatchNorm()
    params = {"params": {
        "scale": jnp.asarray(tbn.weight.detach().numpy()),
        "bias": jnp.asarray(tbn.bias.detach().numpy()),
    }}
    out = bn.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-3, atol=1e-4)


def test_leaky_relu_and_pool_and_upsample(rng):
    x = rng.randn(2, 5, 16, 24).astype(np.float32)
    ref = F.leaky_relu(torch.from_numpy(x)).numpy()
    out = leaky_relu(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)

    ref = F.avg_pool2d(torch.from_numpy(x), 4).numpy()
    out = avg_pool2d(jnp.asarray(x.transpose(0, 2, 3, 1)), 4)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-5, atol=1e-6)

    ref = F.interpolate(torch.from_numpy(x), size=(32, 48), mode="bilinear",
                        align_corners=True).numpy()
    out = upsample_bilinear_ac(jnp.asarray(x.transpose(0, 2, 3, 1)), (32, 48))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_state_dict_import_covers_tree():
    """Fabricate a torch state_dict with the reference's key names and check
    every conv/bn/deconv leaf of the flax tree is written exactly once."""
    from neuralrgbd_tpu.config import ModelConfig
    from neuralrgbd_tpu.data import synthetic_batch
    from neuralrgbd_tpu.train import create_train_state
    from neuralrgbd_tpu.config import TrainConfig
    from neuralrgbd_tpu.utils.torch_import import (
        build_name_map,
        import_torch_state_dict,
    )

    cfg = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                      d_min=0.5, d_max=4.0)
    batch, _ = synthetic_batch(cfg, n_lanes=1, img_hw=(64, 96), seed=0)
    state = create_train_state(cfg, TrainConfig(), batch)

    # build the fake state_dict: for every mapped torch key whose flax leaf
    # exists, create a tensor of the right (torch-layout) shape
    name_map = build_name_map()
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        key = "/".join(p.key for p in path if hasattr(p, "key"))
        flat[key.replace("params/", "")] = np.asarray(leaf)

    inv = {"conv2d": lambda s: (s[3], s[2], s[0], s[1]),
           "conv3d": lambda s: (s[4], s[3], s[0], s[1], s[2]),
           "deconv2d": lambda s: (s[2], s[3], s[0], s[1]),
           "copy": lambda s: s}
    rng_ = np.random.RandomState(0)
    sd = {}
    for tkey, (fkey, kind) in name_map.items():
        if fkey in flat:
            sd["module." + tkey] = rng_.randn(
                *inv[kind](flat[fkey].shape)).astype(np.float32)

    new_params, report = import_torch_state_dict(sd, state.params)
    assert report["n_imported"] == len(sd), report
    assert not report["missing_flax_keys"]
    assert not report["shape_mismatches"]
    assert not report["unmatched_torch_keys"]
    # every leaf covered
    assert report["n_imported"] == report["n_params_total"], (
        report["n_imported"], report["n_params_total"])

    # round-trip value check on one deconv: flip+transpose applied
    w_t = sd["module.r_net.trans_conv0.0.weight"]
    new_flat = {
        "/".join(p.key for p in path if hasattr(p, "key")).replace(
            "params/", ""): np.asarray(v)
        for path, v in
        jax.tree_util.tree_flatten_with_path(new_params)[0]
    }
    w_f = new_flat["r_net/trans_conv0/kernel"]
    np.testing.assert_allclose(
        w_f, w_t[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def test_psmnet_warm_start_partial_import():
    """import_psmnet_state_dict == load_pretrained_PSMNet semantics
    (utils/models.py:12-37): feature-extractor tensors imported, everything
    else untouched."""
    import jax
    import jax.numpy as jnp

    from neuralrgbd_tpu.config import ModelConfig
    from neuralrgbd_tpu.models.kvnet import KVNet
    from neuralrgbd_tpu.ops.camera import camera_from_K
    from neuralrgbd_tpu.utils.torch_import import (build_name_map,
                                                   import_psmnet_state_dict)

    cfg = ModelConfig(feature_dim=64, kv_feature_dim=64, ndepth=8, t_win_r=1)
    model = KVNet(cfg=cfg)
    K = np.array([[40.0, 0, 24], [0, 36, 16], [0, 0, 1]], np.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((64, 96, 3)), jnp.zeros((2, 64, 96, 3)),
        jnp.tile(jnp.eye(4), (2, 1, 1)), camera_from_K(K),
        jnp.linspace(0.5, 4.0, 8), jnp.zeros((8, 16, 24)),
        jnp.asarray(True),
    )

    # synthesize a PSMNet-style checkpoint: torch-layout arrays for every
    # feature-extraction tensor (keys WITHOUT the kvnet prefix, module.-
    # prefixed like released PSMNet checkpoints), plus a decoy key
    rng = np.random.RandomState(0)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    shapes = {"/".join(p.key for p in path if hasattr(p, "key"))
              .replace("params/", ""): leaf.shape for path, leaf in flat}
    sd = {"module.decoy.weight": rng.randn(3, 3).astype(np.float32)}
    n_fe = 0
    for tkey, (fkey, kind) in build_name_map().items():
        if not tkey.startswith("feature_extractor.feature_extraction."):
            continue
        if fkey not in shapes:
            continue  # downsample convs exist only on strided blocks
        shape = shapes[fkey]
        if kind == "conv2d":
            tshape = (shape[3], shape[2], shape[0], shape[1])
        else:
            tshape = shape
        sd["module." + tkey[len("feature_extractor."):]] = (
            rng.randn(*tshape).astype(np.float32))
        n_fe += 1

    new_params, report = import_psmnet_state_dict(sd, params)
    assert report["n_imported"] == n_fe > 50
    # non-feature-extraction keys are filtered before mapping, exactly like
    # load_pretrained_PSMNet's key-intersection
    assert report["unmatched_torch_keys"] == []

    # feature extractor changed, everything else bit-identical
    changed = unchanged = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(new_params)[0]:
        key = "/".join(p.key for p in path if hasattr(p, "key"))
        old = dict(
            (("/".join(p.key for p in pp if hasattr(p, "key"))), ll)
            for pp, ll in flat)[key]
        same = np.array_equal(np.asarray(leaf), np.asarray(old))
        if "feature_extractor" in key:
            changed += 0 if same else 1
        else:
            assert same, f"non-FE leaf modified: {key}"
            unchanged += 1
    assert changed == n_fe
    assert unchanged > 10
