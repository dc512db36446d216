"""KNet up_sample_ratio parity vs the reference KV_NET_BASIC branch.

The reference's optional trilinear D-upsample of the gain volume
(``/root/reference/code/models/basic.py:128-139``): classify at coarse D,
then ``F.upsample(res_volume, (ratio*D, H, W), mode='trilinear',
align_corners=True)``. Dead at all reference call sites
(``d_upsample_ratio_KV_net=None``, KVNET.py:75-77) but real forward code —
this closes the last unported KV_NET_BASIC path and anchors the coarse-D
K-Net fast path's upsample half.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from neuralrgbd_tpu.models.knet import KNet  # noqa: E402
from neuralrgbd_tpu.models.layers import linear_interp_matrix_ac  # noqa: E402
from neuralrgbd_tpu.utils.torch_import import import_torch_state_dict  # noqa: E402


def _ref_kvnet(in_ch, feature_dim, ratio, seed=0):
    """Instantiate the reference KV_NET_BASIC on CPU torch."""
    from tools.ref_oracle import _import_reference

    _import_reference()
    import models.basic as ref_basic

    torch.manual_seed(seed)
    net = ref_basic.KV_NET_BASIC(in_ch, feature_dim=feature_dim,
                                 up_sample_ratio=ratio)
    net.train()  # BN batch statistics (track_running_stats=False semantics)
    return net


def test_interp_matrix_matches_torch_trilinear_d():
    """The (ratio*D, D) matrix reproduces F.upsample trilinear
    align_corners=True exactly when only D changes."""
    rng = np.random.RandomState(0)
    for D, ratio in [(8, 2), (16, 4), (5, 2)]:
        x = rng.randn(1, 1, D, 6, 7).astype(np.float32)
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(ratio * D, 6, 7), mode="trilinear",
            align_corners=True).numpy()
        M = np.asarray(linear_interp_matrix_ac(D, ratio * D))
        got = np.einsum("od,ncdhw->ncohw", M, x)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ratio", [2, 4])
def test_knet_up_sample_ratio_matches_reference(ratio):
    in_ch, fdim, D, H, W = 16, 8, 6, 8, 12
    ref = _ref_kvnet(in_ch, fdim, ratio)

    rng = np.random.RandomState(3)
    vol = rng.randn(1, in_ch, D, H, W).astype(np.float32) * 0.5
    with torch.no_grad():
        want = ref(torch.from_numpy(vol)).numpy()  # (1, 1, ratio*D, H, W)
    assert want.shape == (1, 1, ratio * D, H, W)

    knet = KNet(feature_dim=fdim, up_sample_ratio=ratio)
    vol_f = jnp.asarray(vol.transpose(0, 2, 3, 4, 1))  # NDHWC
    params = knet.init(jax.random.PRNGKey(0), vol_f)
    # reuse the full-model name map by prefixing the standalone state_dict
    sd = {f"kv_net.{k}": v for k, v in ref.state_dict().items()}
    wrapped = {"params": {"kv_net": params["params"]}}
    imported, report = import_torch_state_dict(sd, wrapped)
    assert report["n_imported"] == report["n_params_total"], report
    got = np.asarray(knet.apply(
        {"params": imported["params"]["kv_net"]}, vol_f))  # (1, ratio*D, H, W)
    np.testing.assert_allclose(got, want[:, 0], rtol=1e-4, atol=1e-4)


def test_knet_no_ratio_unchanged():
    """up_sample_ratio=None must leave the original output bit-unchanged."""
    rng = np.random.RandomState(5)
    vol = jnp.asarray(rng.randn(1, 4, 6, 8, 16).astype(np.float32))
    base = KNet(feature_dim=8)
    params = base.init(jax.random.PRNGKey(1), vol)
    want = base.apply(params, vol)
    got = KNet(feature_dim=8, up_sample_ratio=None).apply(params, vol)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
