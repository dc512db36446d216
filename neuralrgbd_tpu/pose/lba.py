"""Local Bundle Adjustment: direct photometric pose refinement in JAX.

The reference (``ICP/opt_pose_numerical.py``) runs a per-view Adam loop over
(unit-quaternion, translation) through the differentiable depth-based warp,
on a 3-scale image pyramid (downsample 4/2/1), LR halved per scale,
confidence-weighted L1 with a warped-hole mask (:28-170). Its "parallel"
variant optimizes all views jointly with one Adam (:172-304) — since the
objective separates per view and Adam is coordinate-wise, that is exactly a
vmap over views, which is how it's built here: one jitted program, the whole
20-iteration x 3-scale schedule as lax loops, no host round-trips.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.models.layers import avg_pool2d
from neuralrgbd_tpu.ops.camera import Camera
from neuralrgbd_tpu.ops.rotations import (
    rotation_to_unitq,
    unitq_to_rotation,
)
from neuralrgbd_tpu.ops.sweep import backward_warp_by_depth


def _photometric_loss(uq, t, img_ref, dmap_ref, conf_ref, img_src, cam,
                      dmap_src=None):
    """Confidence-weighted L1 between the warped source and the reference.

    mask = 1 - (warped == 0): treats exact zeros as out-of-frame holes —
    the reference's semantics (opt_pose_numerical.py:127-133), mask detached.
    Mean over ALL pixels (torch L1Loss default), not just valid ones.

    ``dmap_src`` enables the bi-directional term
    (opt_pose_numerical.py:112-148): additionally warp the REFERENCE into
    the source frame with the inverted rotation (unitQ conjugate == R^T)
    and the NEGATED translation (the reference uses ``-opt_t``, not the
    true SE(3) inverse ``-R^T t`` — matched exactly), unweighted L1.
    The reference only wires this in its single-view variant (the parallel
    one raises ``not implemented`` at :275); here it composes with vmap.

    Warps use the quad-packed gather (bit-identical bilinear formulation,
    tests/test_sampling.py): one gather per pixel instead of four makes
    the full 3-scale x 20-it program 292 -> 80 ms on v5e (PERF.md "LBA
    pipeline") — the C=3 rows are narrow enough that index throughput,
    not row bytes, is the bound.
    """
    R = unitq_to_rotation(uq)
    warped = backward_warp_by_depth(img_src[None], dmap_ref, R[None],
                                    t[None], cam, sample_method="quad")[0]
    mask = jax.lax.stop_gradient((warped != 0.0).astype(warped.dtype))
    c = conf_ref[..., None]
    loss = jnp.mean(jnp.abs(warped * mask * c - img_ref * mask * c))
    if dmap_src is not None:
        warped_r = backward_warp_by_depth(img_ref[None], dmap_src,
                                          R.T[None], (-t)[None], cam,
                                          sample_method="quad")[0]
        mask_r = jax.lax.stop_gradient(
            (warped_r != 0.0).astype(warped_r.dtype))
        loss = loss + jnp.mean(jnp.abs(warped_r * mask_r - img_src * mask_r))
    return loss


def _adam_update(g, m, v, step, lr, b1=0.9, b2=0.999, eps=1e-8):
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    mh = m / (1 - b1 ** step)
    vh = v / (1 - b2 ** step)
    return lr * mh / (jnp.sqrt(vh) + eps), m, v


def make_lba_optimizer(
    n_scales: int = 3,
    max_iter: int = 20,
    lr: float = 0.01,
    opt_R: bool = True,
    opt_t: bool = True,
    bi_direct: bool = False,
):
    """Build the jitted multi-scale LBA step.

    Returns ``optimize(pyr, uq0, t0[, src_dmaps])`` where pyr is a list
    (coarse->fine) of (img_ref (H,W,C), dmap_ref (H,W), conf_ref (H,W),
    imgs_src (V,H,W,C), cam) and uq0/t0 are (V,3) initializations. With
    ``bi_direct``, ``src_dmaps`` is the matching coarse->fine list of
    per-view source depths (V,H,W) feeding the reverse-warp term
    (opt_pose_numerical.py:112-148). Output: optimized (V,3),(V,3).
    """

    def optimize(pyr, uq0, t0, src_dmaps=None):
        def per_view(uq_init, t_init, src_pyr_leaves, src_dmap_leaves):
            uq, t = uq_init, t_init
            m = jnp.zeros(6)
            v = jnp.zeros(6)
            count = 0.0
            for iscale in range(n_scales):
                img_ref, dmap_ref, conf_ref, cam = pyr_static[iscale]
                img_src = src_pyr_leaves[iscale]
                dmap_src = (src_dmap_leaves[iscale] if bi_direct else None)
                scale_lr = lr / (2.0 ** iscale)  # opt_pose_numerical.py:94-97

                def body(it, carry):
                    uq, t, m, v, count = carry
                    count = count + 1.0
                    g_uq, g_t = jax.grad(_photometric_loss, argnums=(0, 1))(
                        uq, t, img_ref, dmap_ref, conf_ref, img_src, cam,
                        dmap_src
                    )
                    g = jnp.concatenate([g_uq * float(opt_R),
                                         g_t * float(opt_t)])
                    upd, m, v = _adam_update(g, m, v, count, scale_lr)
                    uq = uq - upd[:3]
                    t = t - upd[3:]
                    return uq, t, m, v, count

                uq, t, m, v, count = jax.lax.fori_loop(
                    0, max_iter, body, (uq, t, m, v, count)
                )
            return uq, t

        # stash the per-scale static (ref) arrays for closure; src stacked
        pyr_static = [(p[0], p[1], p[2], p[4]) for p in pyr]
        srcs = [p[3] for p in pyr]  # each (V, H, W, C)
        if bi_direct:
            if src_dmaps is None:
                raise ValueError("bi_direct=True requires src_dmaps")
            return jax.vmap(per_view, in_axes=(0, 0, 0, 0))(
                uq0, t0, srcs, list(src_dmaps)
            )
        return jax.vmap(per_view, in_axes=(0, 0, 0, None))(
            uq0, t0, srcs, None
        )

    return jax.jit(optimize)


def make_lba_program(
    cams: Sequence[Camera],
    dw_scales=(4, 2, 1),
    max_iter: int = 20,
    step: float = 0.01,
    opt_vars=(1, 1),
    bi_direct: bool = False,
):
    """The whole per-frame LBA as ONE jitted dispatch.

    ``local_ba_direct`` leaves the pyramid build (8+ pooling enqueues), the
    chart conversion, and the pose assembly outside the optimizer jit — fine
    for tests, but on the tunneled chip every enqueue costs ~2-5 ms of host
    time (PERF.md "Host-loop export de-stall"). This fuses pyramid + unitQ
    chart + the multi-scale Adam schedule + SE(3) assembly into one program:
    ``run(img_ref, imgs_src, dmap_ref, conf_ref, rel_inits) -> (V, 4, 4)``.
    Semantics identical to ``local_ba_direct`` (reference
    opt_pose_numerical.py:172-304 parallel variant).
    """
    optimizer = make_lba_optimizer(
        n_scales=len(dw_scales), max_iter=max_iter, lr=step,
        opt_R=bool(opt_vars[0]), opt_t=bool(opt_vars[1]),
        bi_direct=bi_direct,
    )

    @jax.jit
    def run(img_ref, imgs_src, dmap_ref, conf_ref, rel_inits,
            dmaps_src=None):
        rel = jnp.asarray(rel_inits)
        uq0 = jax.vmap(rotation_to_unitq)(rel[:, :3, :3])
        t0 = rel[:, :3, 3]
        pyr = build_pyramid(img_ref, dmap_ref, conf_ref, imgs_src,
                            cams, dw_scales)
        if bi_direct:
            uq, t = optimizer(pyr, uq0, t0,
                              build_dmap_pyramid(dmaps_src, dw_scales))
        else:
            uq, t = optimizer(pyr, uq0, t0)

        def assemble(uq_i, t_i):
            out = jnp.eye(4)
            out = out.at[:3, :3].set(unitq_to_rotation(uq_i))
            out = out.at[:3, 3].set(t_i)
            return out

        return jax.vmap(assemble)(uq, t)

    return run


def build_pyramid(img_ref, dmap_ref, conf_ref, imgs_src, cams: Sequence[Camera],
                  dw_scales=(4, 2, 1)):
    """Coarse->fine pyramid via average pooling (m_misc.downsample_img)."""
    pyr = []
    for s, cam in zip(dw_scales, cams):
        if s > 1:
            ir = avg_pool2d(img_ref, s)
            dr = avg_pool2d(dmap_ref[..., None], s)[..., 0]
            cr = avg_pool2d(conf_ref[..., None], s)[..., 0]
            sr = avg_pool2d(imgs_src, s)
        else:
            ir, dr, cr, sr = img_ref, dmap_ref, conf_ref, imgs_src
        pyr.append((ir, dr, cr, sr, cam))
    return pyr


def build_dmap_pyramid(dmaps_src, dw_scales=(4, 2, 1)):
    """Coarse->fine per-view source-depth pyramid for the bi-direct term."""
    out = []
    for s in dw_scales:
        if s > 1:
            out.append(avg_pool2d(dmaps_src[..., None], s)[..., 0])
        else:
            out.append(dmaps_src)
    return out


def local_ba_direct(
    img_ref,            # (H, W, C) reference image
    imgs_src,           # (V, H, W, C) source images
    dmap_ref,           # (H, W) reference depth (regressed from the DPV)
    conf_ref,           # (H, W) confidence (exp(max_d DPV)^2, caller-side)
    cams: Sequence[Camera],   # intrinsics per scale, coarse->fine
    rel_pose_inits,     # (V, 4, 4) initial relative poses ref->src
    dw_scales=(4, 2, 1),
    max_iter: int = 20,
    step: float = 0.01,
    opt_vars=(1, 1),
    optimizer=None,
    dmaps_src=None,     # (V, H, W) source depths -> bi-direct warp term
):
    """Reference ``local_BA_direct[_parallel]`` equivalent: returns (V, 4, 4)
    optimized relative poses. ``dmaps_src`` enables ``bi_direct_warp``
    (opt_pose_numerical.py:35,57,112-140; the reference's parallel variant
    raises 'not implemented' there — here it is supported uniformly)."""
    bi_direct = dmaps_src is not None
    rel = jnp.asarray(rel_pose_inits)
    uq0 = jax.vmap(rotation_to_unitq)(rel[:, :3, :3])
    t0 = rel[:, :3, 3]

    pyr = build_pyramid(jnp.asarray(img_ref), jnp.asarray(dmap_ref),
                        jnp.asarray(conf_ref), jnp.asarray(imgs_src),
                        cams, dw_scales)
    optimize = optimizer or make_lba_optimizer(
        n_scales=len(dw_scales), max_iter=max_iter, lr=step,
        opt_R=bool(opt_vars[0]), opt_t=bool(opt_vars[1]),
        bi_direct=bi_direct,
    )
    if bi_direct:
        uq, t = optimize(pyr, uq0, t0,
                         build_dmap_pyramid(jnp.asarray(dmaps_src),
                                            dw_scales))
    else:
        uq, t = optimize(pyr, uq0, t0)

    def assemble(uq_i, t_i):
        out = jnp.eye(4)
        out = out.at[:3, :3].set(unitq_to_rotation(uq_i))
        out = out.at[:3, 3].set(t_i)
        return out

    return jax.vmap(assemble)(uq, t)
