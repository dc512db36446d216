"""Per-component slope timing of the pair-packed K-Net chain.

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_knet_fast.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

import neuralrgbd_tpu.ops.pallas.conv3d_pair as cp

D, H, W = 64, 64, 96
N1, N2 = 8, 40


def slope(fn, init, label, flops=0.0, reps=3):
    def make(n):
        @jax.jit
        def run(c):
            c = jax.lax.fori_loop(0, n, lambda i, c: fn(c), c)
            return jnp.sum(jax.tree_util.tree_leaves(c)[0][0, :2, :2]
                           .astype(jnp.float32))

        return run

    r1, r2 = make(N1), make(N2)
    float(r1(init)); float(r2(init))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(r1(init)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(r2(init)); t2s.append(time.perf_counter() - t0)
    dt = (min(t2s) - min(t1s)) / (N2 - N1)
    tf = f"  {flops/dt/1e12:5.1f} TF/s" if flops else ""
    print(f"{label:<46s} {dt*1e3:8.3f} ms{tf}", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    WP, P2, RU2 = cp._geom(H, W)
    z = jnp.asarray(rng.randn(D, P2, 128).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray((rng.randn(3, 3, 3, 64, 64) * 0.05).astype(np.float32))
    rhs = cp.pack_weights(w)
    xp2 = jax.jit(cp.dense_to_xp2, static_argnums=(1, 2))(z, H, W)
    flops_layer = 2 * D * H * W * 27 * 64 * 64

    # kernel alone (fixed inputs, chained via a scalar poke)
    def layer_only(c):
        zc, st = cp.conv_pair_layer(xp2, rhs, H, W)
        return c.at[0, 0, 0].set(zc[0, 0, 0] + st[0, 0].astype(jnp.bfloat16))

    slope(layer_only, z, "conv_pair_layer (kernel only)", flops_layer)

    def pad_only(c):
        a = cp.dense_to_xp2(c, H, W)
        # consume the whole array so XLA can't dead-code the pass
        return (c * 1.0).at[0, :2, :2].set(a[1:2, 60:62, :2] + jnp.sum(a[2]))

    slope(pad_only, z, "dense_to_xp2 (XLA glue)")

    st0 = jnp.asarray(rng.rand(8, 128).astype(np.float32)) * 100 + 100
    sc = jnp.ones((64,), jnp.float32)
    bi = jnp.zeros((64,), jnp.float32)

    def bn_only(c):
        y = cp.bn_apply(c, st0, sc, bi, D * H * W, True, None, H, W)
        return y

    slope(bn_only, z, "bn_apply (XLA glue)")

    def full_glue(c):
        a, y = cp.bn_recompose(c, st0, sc, bi, D * H * W, True, None, H, W)
        zc, st = cp.conv_pair_layer(a, rhs, H, W)
        return zc

    slope(full_glue, z, "one full chained layer (glue + kernel)",
          flops_layer)


if __name__ == "__main__":
    main()
