"""Microbenchmarks v2: chain-dependent dispatch + scalar fetch to force
real device execution (block_until_ready appears to be a no-op over the
axon tunnel)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.ba import schur_lm, pose_only
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config


def chain_time(step, x0, fetch, n=10, label=""):
    """step: x -> x (device). Times n chained steps + final fetch."""
    x = step(x0)
    float(fetch(x))  # warm compile + one round trip
    # measure round-trip-only (0 steps)
    t = time.perf_counter()
    float(fetch(x0))
    rt = time.perf_counter() - t
    t = time.perf_counter()
    x = x0
    for _ in range(n):
        x = step(x)
    float(fetch(x))
    dt = (time.perf_counter() - t - rt) / n
    print(f"{label:44s} {dt*1e3:8.3f} ms/step  (rt {rt*1e3:.2f} ms)")
    return dt


def main():
    enable_compilation_cache()
    cfg = Config()
    rng = np.random.default_rng(0)
    Kw, L = cfg.keyframe.window_size, cfg.ba.max_landmarks
    cam = cfg.camera
    K = jnp.asarray([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], jnp.float32)

    pts = np.stack([rng.uniform(-20, 20, L), rng.uniform(-5, 5, L), rng.uniform(10, 60, L)], -1).astype(np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (Kw, 1, 1))
    uv = rng.uniform(0, 1000, (L, Kw, 2)).astype(np.float32)

    def mkprob(T_c_w):
        return schur_lm.BAProblem(
            T_c_w=T_c_w, points=jnp.asarray(pts), uv=jnp.asarray(uv),
            obs_mask=jnp.ones((L, Kw), jnp.float32), point_mask=jnp.ones(L, jnp.float32),
            pose_mask=jnp.ones(Kw, jnp.float32),
            fixed_pose=jnp.zeros(Kw, jnp.float32).at[0].set(1.0),
        )

    T0 = jnp.asarray(T)
    for it in (1, 5, 10):
        chain_time(
            lambda Tx, i=it: schur_lm.lm_optimize(mkprob(Tx), K, iters=i).T_c_w,
            T0, lambda Tx: jnp.sum(Tx), n=8, label=f"lm_optimize iters={it}")
    for it in (1, 10):
        chain_time(
            lambda Tx, i=it: pose_only.optimize_pose_only(mkprob(Tx), K, iters=i).T_c_w,
            T0, lambda Tx: jnp.sum(Tx), n=8, label=f"pose_only iters={it}")

    # 60x60 solve, chained
    A = np.asarray(rng.normal(size=(60, 60)), np.float32)
    A = A @ A.T + 600 * np.eye(60, dtype=np.float32)
    Aj = jnp.asarray(A)

    @jax.jit
    def chol_step(b):
        Lc = jnp.linalg.cholesky(Aj + jnp.sum(b) * 0)
        return jax.scipy.linalg.cho_solve((Lc, True), b) * 0.1 + 1.0

    chain_time(chol_step, jnp.ones(60), lambda x: jnp.sum(x), n=20,
               label="cholesky60 + cho_solve (chained)")

    @jax.jit
    def inv_step(b):
        return (jnp.linalg.inv(Aj + jnp.sum(b) * 0) @ b) * 0.1 + 1.0
    chain_time(inv_step, jnp.ones(60), lambda x: jnp.sum(x), n=20,
               label="inv60 @ b (chained)")

    # frontend extract, chained via adding scalar to image
    from stereo_visual_slam_tpu.models import frontend as frontend_mod
    H, W = cfg.padded_hw
    left = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.float32)
    right = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.float32)
    extract = frontend_mod.make_extractor(cfg)

    @jax.jit
    def ext_step(x):
        f = extract(left + x * 0, right)
        return jnp.sum(f.yx) * 1e-9

    chain_time(ext_step, jnp.asarray(0.0), lambda x: x, n=8,
               label=f"extract full ({H}x{W}) chained")

    # full fused step
    from stereo_visual_slam_tpu.models import vslam
    full_step = vslam.make_full_step(cfg, extract)
    st = vslam.empty_state(cfg)
    n = cfg.frontend.n_features
    st = st._replace(
        valid=jnp.ones((n,), bool), lm_id=jnp.arange(n, dtype=jnp.int32),
        lm_pos=jnp.asarray(np.stack([rng.uniform(-20, 20, n), rng.uniform(-5, 5, n), rng.uniform(10, 60, n)], -1), jnp.float32),
        signs=jnp.asarray(np.where(rng.integers(0, 2, (n, 256)), 1.0, -1.0), jnp.float32),
    )
    images = jnp.asarray(rng.integers(0, 255, (2, H, W)), jnp.uint8)
    key = jax.random.PRNGKey(0)

    def fs_step(x):
        s2, info, upg = full_step(images, st._replace(T_c_w=st.T_c_w + x * 0), jnp.asarray(1.0, jnp.float32), key, jnp.asarray(0, jnp.int32))
        return jnp.sum(s2.T_c_w) * 1e-9

    chain_time(fs_step, jnp.asarray(0.0), lambda x: x, n=8,
               label="fused full_step chained")


if __name__ == "__main__":
    main()
