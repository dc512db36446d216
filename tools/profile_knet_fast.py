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


def slope(fn, args, label, flops=0.0, reps=3):
    """fn(carry, *args) -> carry; args passed as real arguments (no giant
    embedded constants — the remote-compile 413 trap)."""
    def make(n):
        @jax.jit
        def run(c, *a):
            c = jax.lax.fori_loop(0, n, lambda i, c: fn(c, *a), c)
            return jnp.sum(c[0, :2, :2].astype(jnp.float32))

        return run

    init, *rest = args
    r1, r2 = make(N1), make(N2)
    float(r1(init, *rest)); float(r2(init, *rest))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(r1(init, *rest)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(r2(init, *rest)); t2s.append(time.perf_counter() - t0)
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
    rhs = jax.jit(cp.pack_weights)(w)
    xp2 = jax.jit(cp.dense_to_xp2, static_argnums=(1, 2))(z, H, W)
    flops_layer = 2 * D * H * W * 27 * 64 * 64
    st0 = jnp.asarray(rng.rand(8, 128).astype(np.float32)) * 100 + 100
    sc = jnp.ones((64,), jnp.float32)
    bi = jnp.zeros((64,), jnp.float32)

    def layer_only(c, xp2, rhs):
        zc, st = cp.conv_pair_layer(xp2, rhs, H, W)
        return c.at[0, 0, 0].set(zc[0, 0, 0] + st[0, 0].astype(jnp.bfloat16))

    slope(layer_only, (z, xp2, rhs), "conv_pair_layer (kernel only)",
          flops_layer)

    def glue_only(c, st0, sc, bi):
        a, y = cp.bn_recompose(c, st0, sc, bi, D * H * W, True, None, H, W)
        return (c * 1.0).at[0, :2, :2].set(
            a[1, 60:62, :2] + y[0, :2, :2] + jnp.sum(a[2, ::8, ::8]))

    slope(glue_only, (z, st0, sc, bi), "bn_recompose (fused XLA glue)")

    def full_layer(c, rhs, st0, sc, bi):
        a, y = cp.bn_recompose(c, st0, sc, bi, D * H * W, True, None, H, W)
        zc, st = cp.conv_pair_layer(a, rhs, H, W)
        return zc

    slope(full_layer, (z, rhs, st0, sc, bi),
          "one full chained layer (glue + kernel)", flops_layer)


def ends():
    """Entry/exit segments of knet_fast_apply (run: --ends)."""
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    from neuralrgbd_tpu.models.knet import KNet

    vol = jnp.asarray(rng.randn(D, H, W, 16).astype(np.float32) * 0.5)
    knet = KNet(feature_dim=64)
    params = knet.init(jax.random.PRNGKey(0), vol[None])["params"]
    k0 = params["dres0_0"]["conv"]["kernel"]
    bn0 = params["dres0_0"]["bn"]
    k1 = params["classify_1"]["kernel"]
    WP, P2, _ = cp._geom(H, W)
    z = jnp.asarray(rng.randn(D, P2, 128).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def entry(c, k0, sc, bi):
        y = jax.lax.conv_general_dilated(
            c[None].astype(jnp.bfloat16), k0.astype(jnp.bfloat16),
            (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)[0]
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(y - mean), axis=(0, 1, 2))
        y = jnp.maximum((y - mean) * jax.lax.rsqrt(var + 1e-5) * sc + bi, 0)
        xp = cp.dense_to_xp2(cp.pack_dense(y), H, W)
        return c.at[0, 0, 0, 0].set(xp[1, 60, 0].astype(c.dtype))

    slope(lambda c, *a: entry(c, *a),
          (vol[:, :, :, :].astype(jnp.float32) * 1.0, k0,
           bn0["scale"], bn0["bias"]),
          "entry: dres0_0 conv+bn+pack+pad")

    def exit_seg(c, k1):
        out = cp.unpack_dense(c, H, W).astype(jnp.bfloat16)
        gain = jax.lax.conv_general_dilated(
            out[None], k1.astype(jnp.bfloat16), (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)[0]
        return c.at[0, 0, 0].set(gain[0, 0, 0, 0].astype(c.dtype))

    slope(lambda c, *a: exit_seg(c, *a), (z, k1),
          "exit: unpack + classify_1 (N=1 conv)")


if __name__ == "__main__":
    if __import__("sys").argv[-1] == "--ends":
        ends()
    else:
        main()
