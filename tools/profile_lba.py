"""Slope-time the fused LBA program on the real TPU.

The LBA CLI's steady state is ~854 ms/frame of `lba` stage time after the
host de-stall — this isolates where it goes: the lba_run device program
(20 it x 3 scales x 4 views of warp+VJP), the lba_maps regression, and the
per-call sync, each timed by the N2-N1 slope.

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_lba.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.ops.camera import camera_from_K
from neuralrgbd_tpu.pose.lba import make_lba_program

H, W, V = 256, 384, 4
print("devices:", jax.devices(), flush=True)

rng = np.random.RandomState(0)
K = np.array([[280.0, 0, W / 2], [0, 280.0, H / 2], [0, 0, 1]], np.float32)
cams = [camera_from_K(np.diag([1 / s, 1 / s, 1.0]).astype(np.float32) @ K)
        for s in (4, 2, 1)]

img_ref = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
imgs_src = jnp.asarray(rng.rand(V, H, W, 3).astype(np.float32))
dmap = jnp.asarray((2 + rng.rand(H, W)).astype(np.float32))
conf = jnp.asarray(rng.rand(H, W).astype(np.float32))
inits = np.stack([np.eye(4, dtype=np.float32)] * V)
inits[:, :3, 3] = 0.02 * rng.randn(V, 3)
inits = jnp.asarray(inits)

# LBA_REAL_RES=<result dir>: feed a REAL exported depth/conf (d_/conf_
# pgm, meters*1000) instead of the i.i.d.-random map — device time of the
# warp gathers can be CONTENT-dependent, and the random map is not
# representative of the pipeline's steady state (round-5 finding: the
# trained-weight LBA CLI measured ~10x the random-map slope number).
import os as _os

if _os.environ.get("LBA_REAL_RES"):
    from neuralrgbd_tpu.infer.export import read_pgm

    res = _os.environ["LBA_REAL_RES"]
    idx = int(_os.environ.get("LBA_REAL_IDX", "20"))
    dmap = jnp.asarray(read_pgm(
        _os.path.join(res, f"d_{idx:05d}.pgm")).astype(np.float32) / 1000.0)
    conf = jnp.asarray(read_pgm(
        _os.path.join(res, f"conf_{idx:05d}.pgm")).astype(np.float32)
        / 1000.0)
    import PIL.Image

    img = np.asarray(PIL.Image.open(
        _os.path.join(res, f"img_{idx:05d}.png")), np.float32) / 255.0
    img_ref = jnp.asarray(img)
    imgs_src = jnp.asarray(np.stack([img] * V))
    print(f"REAL maps from {res} idx {idx}: d range "
          f"[{float(dmap.min()):.3f},{float(dmap.max()):.3f}] conf mean "
          f"{float(conf.mean()):.3f}", flush=True)


def timed(label, fn, n1=3, n2=10, reps=3):
    fn()  # compile
    jax.block_until_ready(fn())
    ts = {n1: [], n2: []}
    for _ in range(reps):
        for n in (n1, n2):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn()
            jax.block_until_ready(out)
            ts[n].append(time.perf_counter() - t0)
    dt = (min(ts[n2]) - min(ts[n1])) / (n2 - n1)
    print(f"{label:<40s} {dt*1e3:8.1f} ms/call", flush=True)
    return dt


for it in (20, 5, 1):
    run = make_lba_program(cams, max_iter=it)
    timed(f"lba_run 3-scale x {it} it x V=4",
          lambda r=run: r(img_ref, imgs_src, dmap, conf, inits))

run1 = make_lba_program(cams[-1:], dw_scales=(1,), max_iter=20)
timed("lba_run 1-scale(full) x 20 it",
      lambda: run1(img_ref, imgs_src, dmap, conf, inits))
run1c = make_lba_program(cams[:1], dw_scales=(4,), max_iter=20)
timed("lba_run 1-scale(quarter) x 20 it",
      lambda: run1c(img_ref, imgs_src, dmap, conf, inits))

# ---- sampler variants on the full 3-scale program ----
# (the production default is 'quad' — pose/lba.py passes it explicitly;
# this overrides it to quantify the alternatives)
import neuralrgbd_tpu.ops.sampling as sampling
import neuralrgbd_tpu.ops.sweep as sweep

orig = sampling.grid_sample_2d
for meth in ("taps", "slice"):
    sweep.grid_sample_2d = (
        lambda img, c, padding="zeros", m=meth, **kw: orig(
            img, c, padding=padding,
            method=(None if m == "taps" else m)))
    run_m = make_lba_program(cams, max_iter=20)
    try:
        timed(f"lba_run 3-scale x 20 it ({meth} gather)",
              lambda r=run_m: r(img_ref, imgs_src, dmap, conf, inits))
    except Exception as e:  # noqa: BLE001
        print(f"{meth}: FAILED {type(e).__name__}: {e}", flush=True)
sweep.grid_sample_2d = orig
