"""Device-mesh data parallelism over ICI.

The reference's multi-GPU story is off-tree Lightning DDP/NCCL on SLURM
(reference requirements.txt:9,17; README.md:41). The TPU-native equivalent
(SURVEY.md §2.3): a 1-D `jax.sharding.Mesh` over the data axis, per-device
batch shards, gradient `pmean` riding ICI inside one `shard_map`-ped step,
and cross-replica BatchNorm (`bn_axis_name`) for sync-BN statistics. The
model (~26M params ≈ 100 MB fp32) is fully replicated — no parameter
sharding needed; for pods, `jax.distributed.initialize` extends the same
mesh over DCN.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init over DCN for pod slices (SURVEY.md §2.3): the same
    1-D data mesh then spans all hosts' devices. On single-host (or when the
    env provides the cluster config, e.g. GKE/TPU-VM metadata) the arguments
    can be omitted."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over the first n (default: all) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devs)} available on platform "
                f"{devs[0].platform!r}; for a virtual CPU mesh set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=<n> and "
                "jax.config.update('jax_platforms', 'cpu') before any jax "
                "device access (see tests/conftest.py)"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = DATA_AXIS,
                axis_pos: int = 0) -> Dict[str, Any]:
    """Place a host batch with the batch axis sharded over the mesh.
    ``axis_pos=1`` shards dim 1 (a stacked multi-step batch, leading k)."""
    sharding = NamedSharding(mesh, P(*([None] * axis_pos), axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_parallel_train_step(train_step, mesh: Mesh, axis: str = DATA_AXIS,
                             stacked: bool = False):
    """shard_map a single-device train step over the data mesh.

    `train_step` must already be built with StepConfig(axis_name=axis) and
    modules constructed with bn_axis_name=axis, so grads/losses pmean and BN
    stats sync inside. State is replicated, batch sharded on dim 0 — or on
    dim 1 when ``stacked`` (a multi-step batch stack with leading (k, ...)
    axis, train/steps.py make_multi_step: every device runs all k steps on
    its shard of each per-step batch).
    """
    mapped = jax.shard_map(
        train_step,
        mesh=mesh,
        in_specs=(P(), P(None, axis) if stacked else P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_parallel_eval_accumulate_step(acc_step, mesh: Mesh, axis: str = DATA_AXIS):
    """shard_map the streaming-eval step: batch sharded, confusion counts and
    ROC histograms psum'd over the mesh so the harness gets exact DATASET-
    level accumulators (identical to single-device — no per-batch metric
    averaging bias). Predictions are dropped on-device to avoid an
    all-gather the eval loop never reads."""

    def step(params, stats, batch):
        _, conf, auc = acc_step(params, stats, batch)
        conf = jax.tree.map(lambda x: jax.lax.psum(x, axis), conf)
        auc = jax.tree.map(lambda x: jax.lax.psum(x, axis), auc)
        return conf, auc

    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)
