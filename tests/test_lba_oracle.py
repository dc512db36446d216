"""Torch-oracle parity for the LBA photometric pose optimizer.

Drives the ACTUAL reference ``_opt_pose_warping`` (single-view variant,
``ICP/opt_pose_numerical.py:28-170``, CPU torch via tools/ref_oracle's
patching) against ``pose/lba.py`` on identical per-scale pyramid inputs —
forward-only AND ``bi_direct_warp`` — and asserts the optimized pose after
the full Adam schedule matches. This pins the whole chain: unitQ chart,
depth-based backward warp, hole mask, conf-weighted L1, per-scale LR
halving, and torch-Adam-exact updates.

The bi-direct case runs single-scale: the reference passes ``dmap_src``
straight into the warp each scale (opt_pose_numerical.py:141), so a
per-scale list raises and a single full-res tensor shape-mismatches any
coarser scale — single-scale is its only working configuration.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from neuralrgbd_tpu.ops.camera import camera_from_K  # noqa: E402
from neuralrgbd_tpu.ops.rotations import (  # noqa: E402
    rotation_to_unitq,
    unitq_to_rotation,
)
from neuralrgbd_tpu.pose.lba import (  # noqa: E402
    build_dmap_pyramid,
    build_pyramid,
    make_lba_optimizer,
)

H, W = 32, 48
MAX_ITER = 4
LR = 0.01


def _problem():
    rng = np.random.RandomState(3)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    img_src = np.stack([
        np.sin(xs / 6.0 + c) + np.cos(ys / 4.0 - c) for c in range(3)
    ], -1).astype(np.float32)
    img_ref = np.stack([
        np.sin(xs / 6.0 + 0.35 + c) + np.cos(ys / 4.0 + 0.2 - c)
        for c in range(3)
    ], -1).astype(np.float32)
    dmap_ref = (2.0 + 0.3 * np.sin(xs / 9.0) * np.cos(ys / 7.0)
                ).astype(np.float32)
    dmap_src = (2.1 + 0.25 * np.cos(xs / 8.0) * np.sin(ys / 6.0)
                ).astype(np.float32)
    conf = (0.4 + 0.5 * rng.rand(H, W)).astype(np.float32)

    th = 0.02
    R0 = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0],
                   [0, 0, 1]], np.float32)
    t0 = np.array([0.04, -0.02, 0.03], np.float32)
    return img_ref, img_src, dmap_ref, dmap_src, conf, R0, t0


def _cams(scales):
    ours, dicts = [], []
    from tools.ref_oracle import make_cam_intrinsics
    for s in scales:
        w, h = W // s, H // s
        K = np.array([[40.0 / s, 0, w / 2.0],
                      [0, 40.0 / s, h / 2.0],
                      [0, 0, 1.0]], np.float32)
        ours.append(camera_from_K(K))
        dicts.append(make_cam_intrinsics(K, h, w))
    return ours, dicts


def _pyramids(img_ref, img_src, dmap_ref, dmap_src, conf, cams, scales):
    """Shared per-scale arrays (our avg-pool pyramid, materialized once)."""
    pyr = build_pyramid(jnp.asarray(img_ref), jnp.asarray(dmap_ref),
                        jnp.asarray(conf), jnp.asarray(img_src)[None],
                        cams, scales)
    dpyr = build_dmap_pyramid(jnp.asarray(dmap_src)[None], scales)
    return ([tuple(np.asarray(x).copy() for x in p[:4]) + (p[4],)
             for p in pyr],
            [np.asarray(d).copy() for d in dpyr])


def _run_reference(pyr_np, dpyr_np, cam_dicts, R0, t0, bi_direct):
    from tools.ref_oracle import _import_reference
    _import_reference()
    import mutils.misc as m_misc
    from ICP.opt_pose_numerical import _opt_pose_warping

    def nchw(a):  # (h, w, c) -> (1, c, h, w)
        return torch.from_numpy(np.ascontiguousarray(
            a.transpose(2, 0, 1)[None]))

    imgs_ref = [nchw(p[0]) for p in pyr_np]
    dmaps_ref = [torch.from_numpy(p[1]) for p in pyr_np]
    confs = [torch.from_numpy(p[2])[None, None] for p in pyr_np]
    imgs_src = [nchw(p[3][0]) for p in pyr_np]
    # single tensor: the only form the reference's bi-direct branch accepts
    dmap_src = torch.from_numpy(dpyr_np[-1][0]) if bi_direct else None

    uq0 = np.asarray(rotation_to_unitq(jnp.asarray(R0)))
    opt_t, opt_R, _, _ = _opt_pose_warping(
        imgs_ref, dmaps_ref, imgs_src,
        torch.from_numpy(uq0.copy()), torch.from_numpy(t0.copy()),
        cam_dicts, max_iter=MAX_ITER, LR=LR, opt_vars=[1, 1],
        dmap_src=dmap_src, bi_direct_warp=bi_direct, conf_maps_ref=confs)
    R_out = m_misc.UnitQ2Rotation(opt_R).numpy()
    return R_out, opt_t.numpy()


def _run_ours(pyr_np, dpyr_np, cams, R0, t0, bi_direct):
    pyr = [(jnp.asarray(p[0]), jnp.asarray(p[1]), jnp.asarray(p[2]),
            jnp.asarray(p[3]), p[4]) for p in pyr_np]
    opt = make_lba_optimizer(n_scales=len(pyr), max_iter=MAX_ITER,
                             lr=LR, opt_R=True, opt_t=True,
                             bi_direct=bi_direct)
    uq0 = rotation_to_unitq(jnp.asarray(R0))[None]
    t0j = jnp.asarray(t0)[None]
    if bi_direct:
        uq, t = opt(pyr, uq0, t0j, [jnp.asarray(d) for d in dpyr_np])
    else:
        uq, t = opt(pyr, uq0, t0j)
    return np.asarray(unitq_to_rotation(uq[0])), np.asarray(t[0])


@pytest.mark.parametrize("bi_direct", [False, True])
def test_lba_optimizer_matches_reference(bi_direct):
    img_ref, img_src, dmap_ref, dmap_src, conf, R0, t0 = _problem()
    scales = (1,) if bi_direct else (4, 2, 1)
    cams, cam_dicts = _cams(scales)
    pyr_np, dpyr_np = _pyramids(img_ref, img_src, dmap_ref, dmap_src,
                                conf, cams, scales)

    R_ref, t_ref = _run_reference(pyr_np, dpyr_np, cam_dicts, R0, t0,
                                  bi_direct)
    R_our, t_our = _run_ours(pyr_np, dpyr_np, cams, R0, t0, bi_direct)

    # both must have moved off the init (the problem has signal)
    assert np.abs(t_ref - t0).max() > 1e-4
    np.testing.assert_allclose(t_our, t_ref, rtol=0, atol=2e-4)
    np.testing.assert_allclose(R_our, R_ref, rtol=0, atol=2e-4)
