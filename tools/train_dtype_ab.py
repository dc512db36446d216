"""A/B: train step time + 60-step loss trajectory, fp32 vs bf16 compute."""
import sys, time, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo/tools")
from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.data import synthetic_batch
from neuralrgbd_tpu.train import create_train_state, make_train_step

for dt in ("float32", "bfloat16"):
    cfg = ModelConfig(dtype=dt)
    tcfg = TrainConfig(lr=1e-4, grad_clip_max=2.0)
    batch, _ = synthetic_batch(cfg, n_lanes=1, img_hw=(256, 384), seed=0)
    state = create_train_state(cfg, tcfg, batch)
    step = make_train_step(cfg, tcfg)
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    D, h, w = cfg.ndepth, 64, 96
    bvp = jnp.full((1, D, h, w), -np.log(D), jnp.float32)
    cv = jnp.ones((1,), bool)
    key = jax.random.PRNGKey(0)
    out = step(state, b, bvp, cv, key)   # compile (donates bvp's buffer)
    float(out.loss)
    bvp = jnp.full((1, D, h, w), -np.log(D), jnp.float32)  # fresh post-donation
    # timing: chain N steps, fetch last loss
    keys = [jax.random.PRNGKey(i) for i in range(60)]
    losses = []
    t0 = time.perf_counter()
    st, bp = state, bvp
    N = 60
    for i in range(N):
        out = step(st, b, bp, cv, keys[i])
        st, bp = out.state, out.bv_predict
        losses.append(out.loss)
        if i % 10 == 9:
            jax.block_until_ready(out.loss)   # bound the dispatch queue
    lv = np.asarray(jnp.stack(losses))
    dt_s = (time.perf_counter() - t0) / N
    print(f"{dt}: {dt_s*1e3:.1f} ms/step  loss[0,10,30,59] ="
          f" {lv[0]:.4f} {lv[10]:.4f} {lv[30]:.4f} {lv[59]:.4f}", flush=True)
