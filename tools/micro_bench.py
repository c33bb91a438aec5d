"""Microbenchmarks: BA per-iteration cost, cholesky cost, frontend stages."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.ba import schur_lm, pose_only
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config


def timeit(fn, *args, n=20, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t) / n
    print(f"{label:40s} {dt*1e3:8.3f} ms")
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
    prob = schur_lm.BAProblem(
        T_c_w=jnp.asarray(T), points=jnp.asarray(pts), uv=jnp.asarray(uv),
        obs_mask=jnp.ones((L, Kw), jnp.float32), point_mask=jnp.ones(L, jnp.float32),
        pose_mask=jnp.ones(Kw, jnp.float32),
        fixed_pose=jnp.zeros(Kw, jnp.float32).at[0].set(1.0),
    )

    for it in (1, 2, 4, 8):
        timeit(lambda p=prob, i=it: schur_lm.lm_optimize(p, K, iters=i), n=10,
               label=f"lm_optimize iters={it}")
    for it in (1, 4, 8):
        timeit(lambda p=prob, i=it: pose_only.optimize_pose_only(p, K, iters=i), n=10,
               label=f"pose_only iters={it}")

    # cholesky + cho_solve of 60x60
    A = np.asarray(rng.normal(size=(60, 60)), np.float32)
    A = A @ A.T + 60 * np.eye(60, dtype=np.float32)
    b = np.asarray(rng.normal(size=(60,)), np.float32)
    Aj, bj = jnp.asarray(A), jnp.asarray(b)

    @jax.jit
    def chol_solve(A, b):
        Lc = jnp.linalg.cholesky(A)
        return jax.scipy.linalg.cho_solve((Lc, True), b)

    timeit(chol_solve, Aj, bj, label="cholesky60 + cho_solve")

    @jax.jit
    def lin_solve(A, b):
        return jnp.linalg.solve(A, b)
    timeit(lin_solve, Aj, bj, label="jnp.linalg.solve 60x60")

    @jax.jit
    def inv_solve(A, b):
        return jnp.linalg.inv(A) @ b
    timeit(inv_solve, Aj, bj, label="inv(60x60) @ b")

    # frontend stages
    from stereo_visual_slam_tpu.models import frontend as frontend_mod
    H, W = cfg.padded_hw
    left = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.float32)
    right = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.float32)
    extract = frontend_mod.make_extractor(cfg)
    timeit(lambda: extract(left, right), n=10, label=f"extract full ({H}x{W})")

    # individual ops
    from stereo_visual_slam_tpu.ops import fast as fast_mod
    from stereo_visual_slam_tpu.ops import anms as anms_mod
    from stereo_visual_slam_tpu.ops import orb as orb_mod
    from stereo_visual_slam_tpu.ops import stereo as stereo_mod
    import inspect
    print("# available:", [n for n, _ in inspect.getmembers(fast_mod, callable)][:10])


if __name__ == "__main__":
    main()
