"""Device mesh construction and sharding rules.

The reference's only parallelism is single-node DDP over NCCL
(ref /root/reference/valle/bin/trainer.py:913-915,1152).  Here the equivalent
is a ``jax.sharding.Mesh`` with a ``data`` axis (batch sharding; GSPMD emits
the gradient all-reduce over ICI) and a reserved ``model`` axis for tensor
sharding past one chip.  Multi-host init is ``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, (data, model, n)
    if data * model == n and model == 1:
        arr = np.asarray(devices).reshape(data, model)
    else:
        arr = mesh_utils.create_device_mesh((data, model), devices=devices)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays sharded over the data axis (leading dim)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params, mesh: Mesh):
    """Tensor-parallel layout over the 'model' axis (GSPMD).

    Megatron-style: QKV/FFN-in kernels column-sharded, out-proj/FFN-out
    row-sharded, embeddings sharded on the feature dim, everything else
    replicated.  With model=1 this degenerates to pure DP.
    """

    def spec_for(path, leaf) -> P:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        joined = "/".join(str(n) for n in names)
        nd = leaf.ndim
        if "in_proj" in joined or "linear1" in joined or "kv_proj" in joined or "q_proj" in joined:
            if names[-1] == "kernel":
                return P(*([None] * (nd - 1) + ["model"]))
        if "out_proj" in joined or "linear2" in joined:
            if names[-1] == "kernel":
                return P(*([None] * (nd - 2) + ["model", None]))
        if names[-1] == "embedding" or "embeddings_rest" in joined:
            return P(*([None] * (nd - 1) + ["model"]))
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params
    )


def quantized_shardings(variables, mesh: Mesh) -> dict:
    """Shardings for a ``quantize_variables()`` output (int8 serving over a
    dp x tp mesh).

    ``params`` follow :func:`param_shardings` (int8 kernels sit at the same
    paths).  ``qscale`` per-output-channel scales shard with their kernel's
    OUTPUT axis: column-sharded modules (QKV/FFN-in) shard the scale's last
    axis over 'model'; row-sharded modules (out-proj/FFN-out) keep the full
    output per shard, so their scales replicate.
    """
    column_sharded = ("in_proj", "linear1", "kv_proj", "q_proj")
    # any other collection (batch_stats, cache, ...) replicates — these must
    # be SHARDINGS, not the original arrays, for tree_map(device_put, ...)
    out = {
        k: jax.tree.map(lambda _leaf: replicated(mesh), v)
        for k, v in variables.items()
        if k not in ("params", "qscale")
    }
    out["params"] = param_shardings(variables["params"], mesh)
    if "qscale" in variables:

        def spec_for(path, leaf) -> P:
            names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
            joined = "/".join(names)
            if any(m in joined for m in column_sharded):
                return P(*([None] * (leaf.ndim - 1) + ["model"]))
            return P()

        out["qscale"] = jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)),
            variables["qscale"],
        )
    return out


def shard_batch(batch: dict, mesh: Mesh, axis: int = 0) -> dict:
    """Shard a host batch dict with dim ``axis`` over 'data' (axis=1 for
    train batches whose leading dim is the micro-batch axis).

    When the mesh spans multiple processes, each process's array is its
    PROCESS-LOCAL portion (the rank-sharded loader's batch) and the global
    array is their concatenation along ``axis`` — the DDP semantics the
    reference's per-rank DataLoader has (ref trainer.py:1000-1014).
    ``jax.device_put`` would instead treat the local array as the global
    value and silently use only each host's addressable slice of it,
    dropping half of every host's loaded data; hence
    ``make_array_from_process_local_data`` on multi-process meshes."""
    procs = {d.process_index for d in mesh.devices.flat}
    multiprocess = len(procs) > 1

    def put(a):
        spec = [None] * a.ndim
        spec[axis] = "data"
        sharding = NamedSharding(mesh, P(*spec))
        if multiprocess:
            a = np.asarray(a)
            global_shape = list(a.shape)
            global_shape[axis] *= len(procs)
            return jax.make_array_from_process_local_data(
                sharding, a, tuple(global_shape)
            )
        return jax.device_put(a, sharding)

    return jax.tree.map(put, batch)
