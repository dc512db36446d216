"""Oracle parity of the four legacy refinement heads vs the reference
(models/Refine.py:135-585), on identical random-init weights + inputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from neuralrgbd_tpu.models.refine_legacy import (  # noqa: E402
    RefineNet3D,
    RefineNetDeMoN,
    RefineNetUnet2D,
    RefineNetUNet3D,
)
from neuralrgbd_tpu.utils.torch_import import import_refine_head  # noqa: E402


@pytest.fixture(scope="module")
def ref_refine():
    from tools.ref_oracle import _import_reference

    _import_reference()
    import models.Refine as R
    return R


def _sd(model):
    return {k: v.detach().numpy().copy()
            for k, v in model.state_dict().items()}


def _check(ours, theirs, atol=2e-4):
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=atol)


def test_unet2d_parity(ref_refine):
    torch.manual_seed(0)
    S = 4                                   # DPV statistics channels
    tmodel = ref_refine.RefineNet_Unet2D(in_channels=3 + S)
    rng = np.random.RandomState(1)
    stats = rng.randn(1, S, 16, 24).astype(np.float32)
    img = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(stats), torch.from_numpy(img)).numpy()

    model = RefineNetUnet2D()
    j_stats = jnp.asarray(stats.transpose(0, 2, 3, 1))
    j_img = jnp.asarray(img.transpose(0, 2, 3, 1))
    params = model.init(jax.random.PRNGKey(0), j_stats, j_img)
    params, rep = import_refine_head(_sd(tmodel), params, "unet2d")
    assert rep["n_imported"] == rep["n_params_total"], rep
    got = np.asarray(model.apply(params, j_stats, j_img))
    _check(got.transpose(0, 3, 1, 2), want)


def test_demon_parity(ref_refine):
    torch.manual_seed(2)
    tmodel = ref_refine.RefineNet_DeMoN(img_ch=3)
    rng = np.random.RandomState(3)
    dmap = rng.rand(1, 1, 16, 24).astype(np.float32) * 3
    img = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(dmap), torch.from_numpy(img)).numpy()

    model = RefineNetDeMoN()
    j_dmap = jnp.asarray(dmap.transpose(0, 2, 3, 1))
    j_img = jnp.asarray(img.transpose(0, 2, 3, 1))
    params = model.init(jax.random.PRNGKey(0), j_dmap, j_img)
    params, rep = import_refine_head(_sd(tmodel), params, "demon")
    assert rep["n_imported"] == rep["n_params_total"], rep
    # activations reach ~2e3 (dmap in meters amplified); atol scales with it
    got = np.asarray(model.apply(params, j_dmap, j_img))
    _check(got.transpose(0, 3, 1, 2), want, atol=5e-3)


@pytest.mark.parametrize("deconv", [True, False])
def test_refine3d_parity(ref_refine, deconv):
    torch.manual_seed(4)
    tmodel = ref_refine.RefineNet(in_channels=4, deconv_upsample=deconv)
    rng = np.random.RandomState(5)
    vol = rng.randn(1, 1, 8, 16, 24).astype(np.float32)
    img_vol = rng.randn(1, 3, 8, 16, 24).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(vol),
                      torch.from_numpy(img_vol)).numpy()

    model = RefineNet3D(in_channels=4, deconv_upsample=deconv)
    j_vol = jnp.asarray(vol.transpose(0, 2, 3, 4, 1))
    j_img = jnp.asarray(img_vol.transpose(0, 2, 3, 4, 1))
    params = model.init(jax.random.PRNGKey(0), j_vol, j_img)
    params, rep = import_refine_head(_sd(tmodel), params,
                                     "3d" if deconv else "3d_nearest")
    assert rep["n_imported"] == rep["n_params_total"], rep
    got = np.asarray(model.apply(params, j_vol, j_img))
    _check(got.transpose(0, 4, 1, 2, 3), want, atol=5e-4)


@pytest.mark.parametrize("res", [True, False])
def test_unet3d_parity(ref_refine, res):
    torch.manual_seed(6)
    cls = (ref_refine.RefineNet_UNet_Res if res
           else ref_refine.RefineNet_UNet)
    tmodel = cls(in_channels=4)
    rng = np.random.RandomState(7)
    vol = rng.randn(1, 1, 8, 16, 24).astype(np.float32)
    img_vol = rng.randn(1, 3, 8, 16, 24).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(vol),
                      torch.from_numpy(img_vol)).numpy()

    model = RefineNetUNet3D(in_channels=4, res=res)
    j_vol = jnp.asarray(vol.transpose(0, 2, 3, 4, 1))
    j_img = jnp.asarray(img_vol.transpose(0, 2, 3, 4, 1))
    params = model.init(jax.random.PRNGKey(0), j_vol, j_img)
    params, rep = import_refine_head(_sd(tmodel), params,
                                     "unet3d_res" if res else "unet3d")
    assert rep["n_imported"] == rep["n_params_total"], rep
    got = np.asarray(model.apply(params, j_vol, j_img))
    _check(got.transpose(0, 4, 1, 2, 3), want, atol=5e-4)
