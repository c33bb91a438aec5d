"""Data-parallel front-end: batched feature extraction over a device mesh.

Feature extraction (detection, description, stereo depth) is per-frame
independent — only tracking and BA are sequential. For offline mapping /
dataset processing, the throughput lever is to extract features for B frames
at once with the batch sharded across the mesh: every device runs the full
frontend on its shard of frames, zero communication. This is the
"near-linear frames/s scaling" axis of BASELINE.json.

Usage:
    bf = BatchFrontend(config, mesh)
    feats = bf.extract(left_batch, right_batch)   # (B, H, W) -> batched tables
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereo_visual_slam_tpu.models import frontend as frontend_mod
from stereo_visual_slam_tpu.utils.config import Config

BATCH_AXIS = "frames"


def make_frontend_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(devices, (BATCH_AXIS,))


class BatchFrontend:
    def __init__(self, config: Config, mesh: Mesh):
        self.config = config
        self.mesh = mesh
        extract = frontend_mod.make_extractor(config)
        batch_sharding = NamedSharding(mesh, P(BATCH_AXIS))

        @jax.jit
        def batched(left, right):
            left = jax.lax.with_sharding_constraint(left, batch_sharding)
            right = jax.lax.with_sharding_constraint(right, batch_sharding)
            return jax.vmap(extract)(left, right)

        self._fn = batched
        self._sharding = batch_sharding

    def extract(self, left_batch: jnp.ndarray, right_batch: jnp.ndarray):
        """left/right: (B, H, W) padded f32; B must divide the mesh size."""
        left_batch = jax.device_put(left_batch, self._sharding)
        right_batch = jax.device_put(right_batch, self._sharding)
        return self._fn(left_batch, right_batch)
