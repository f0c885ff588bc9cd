"""Device mesh + sharding rules.

The scale-out design (absent from the single-GPU reference; see SURVEY.md
section 2.8) is GSPMD: a ('data', 'model') mesh, batch axes sharded over
'data', the wide parameter tables sharded over 'model', and XLA inserting
the collectives. One code path runs on 1 chip, an 8-device CPU test mesh,
or a v5e pod -- only the mesh shape changes.

Sharded parameters (everything else is replicated):
  * BrandAspects.aspects_embeddings (num_aspects x common_dim) -- row-sharded
  * BrandAspects.brand_embeddings (brand_num+1 x num_aspects) -- col-sharded
    (contracting dims line up so the aspect mixture is a local matmul
    followed by a psum XLA derives itself)
  * the MFC mapping kernels (mapping_in can be ~9k wide) -- input-sharded
  * BERT FFN kernels -- megatron-style (intermediate sharded)
"""

from __future__ import annotations

import re
from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(mesh_shape: str = "", devices=None) -> Mesh:
    """mesh_shape "4,2" -> Mesh(data=4, model=2). "" -> all devices on data.

    A shape smaller than the device count uses the leading subset (e.g.
    "--mesh_shape 1,1" forces single-device on a multi-chip host)."""
    devices = devices if devices is not None else jax.devices()
    if mesh_shape:
        dims = tuple(int(x) for x in mesh_shape.split(","))
        if len(dims) == 1:
            dims = (dims[0], 1)
    else:
        dims = (len(devices), 1)
    n = dims[0] * dims[1]
    if n > len(devices):
        raise ValueError("mesh %s needs %d devices, have %d"
                         % (dims, n, len(devices)))
    arr = np.asarray(devices[:n]).reshape(dims)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# parameter-path -> PartitionSpec rules (regex on '/'-joined path)
_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    (r"brand_encoding/aspects_embeddings$", P("model", None)),
    (r"brand_encoding/brand_embeddings$", P(None, "model")),
    (r"(visual|text)_mapping/fc1/kernel$", P("model", None)),
    (r"bert/layer_\d+/intermediate/kernel$", P(None, "model")),
    (r"bert/layer_\d+/intermediate/bias$", P("model")),
    (r"bert/layer_\d+/output/kernel$", P("model", None)),
)


def _rule_for(mesh: Mesh, path, leaf, skip_bert: bool = False) -> NamedSharding:
    name = "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)
    if hasattr(leaf, "shape"):
        for pat, spec in _PARAM_RULES:
            if skip_bert and pat.startswith("bert/"):
                # pipeline parallelism owns the 'model' axis for the BERT
                # layer stack: megatron-style FFN sharding on the same
                # axis would make the per-step stack a GSPMD all-gather
                # instead of a free local slice of a replicated buffer
                continue
            if re.search(pat, name):
                sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
                if len(spec) <= len(leaf.shape) and all(
                        ax is None or leaf.shape[dim] % sizes[ax] == 0
                        for dim, ax in enumerate(spec)):
                    return NamedSharding(mesh, spec)
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params, pp: bool = False):
    """Tree of NamedShardings for a FancyRec param tree. pp=True keeps the
    BERT layer stack replicated ('model' is the pipeline-stage axis)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, l: _rule_for(mesh, p, l, skip_bert=pp), params)


def state_shardings(mesh: Mesh, state, pp: bool = False):
    """Shardings for a whole TrainState.

    The param rules key on path suffixes, so they apply equally to params
    and to the optimizer moments (Adam mu/nu mirror the param tree paths);
    everything else (queue, counters, rng) is replicated.
    """
    return jax.tree_util.tree_map_with_path(
        lambda p, l: _rule_for(mesh, p, l, skip_bert=pp), state)


def shard_state(mesh: Mesh, state, pp: bool = False):
    """device_put a TrainState with its shardings; jit then propagates them."""
    return jax.device_put(state, state_shardings(mesh, state, pp=pp))


def process_batch_shard(mesh: Mesh, batch_size: int):
    """-> (process_index, process_count) when per-process IO sharding is
    safe for this mesh/batch, else None (fall back to every host
    assembling the full global batch).

    Safe means each process's addressable devices cover a contiguous,
    equal block of the 'data' axis (process p owns exactly data rows
    [p*D/P, (p+1)*D/P), each row on one process) and the batch splits
    evenly across processes. Verified against the actual device
    ownership of the mesh, not assumed from construction order."""
    pcount = jax.process_count()
    if pcount <= 1:
        return None
    data = mesh.devices.shape[0]
    # batch must divide the full DATA AXIS, not just the process count:
    # a non-dividing batch takes shard_batch's replicate fallback, which
    # under process-local loading would replicate each LOCAL slice as if
    # it were the global batch -- silently wrong results
    if data % pcount or batch_size % data:
        return None
    owners = np.asarray(
        [[d.process_index for d in row] for row in mesh.devices])
    row_owner = owners[:, 0]
    if not (owners == row_owner[:, None]).all():
        return None   # a data row spans processes
    expected = np.repeat(np.arange(pcount), data // pcount)
    if not np.array_equal(row_owner, expected):
        return None   # ownership blocks not contiguous/process-ordered
    return (jax.process_index(), pcount)


def require_divisible_batch(mesh: Mesh, batch_size: int,
                            flag: str = "--batch_size") -> None:
    """Reject silent 1/N training throughput at mesh-build time.

    config.finalize can only check an EXPLICIT --mesh_shape; the default
    "" (all devices on 'data') resolves its data axis here, where the
    device count is known. A batch that does not divide the data axis
    would make shard_batch replicate every step: correct results, every
    device computing the full batch."""
    data = int(mesh.devices.shape[0])
    if data > 1 and batch_size % data:
        raise ValueError(
            "%s %d is not divisible by the data mesh axis %d: the batch "
            "would be replicated on every device instead of sharded. "
            "Pick a multiple of %d (or shrink the mesh with --mesh_shape)."
            % (flag, batch_size, data, data))


_warned_replicate = set()


def shard_batch(mesh: Mesh, batch, batch_axis: int = 0,
                process_local: bool = False):
    """device_put a batch dict sharding the batch dim over 'data'.

    Arrays whose batch dim does not divide the data axis are replicated
    (still correct, but every device computes the full batch): that is a
    throughput bug for real batches, so it warns once per shape.
    config.finalize rejects the explicit --mesh_shape version of this
    mistake and require_divisible_batch the default-mesh version (the
    trainer calls it right after build_mesh).

    process_local=True: each process passes only ITS contiguous slice of
    the batch axis (a process-sharded BatchLoader) and the global array
    is assembled shard-wise with no cross-host data movement -- the mesh
    lays devices out process-major, so process p's addressable shards
    are exactly rows [p*B/P, (p+1)*B/P). Non-batch leaves must still be
    globally identical on every process (they replicate)."""
    pcount = jax.process_count()

    def put(x):
        x = np.asarray(x) if not hasattr(x, "ndim") else x
        if process_local and pcount > 1 and x.ndim > batch_axis:
            if (x.shape[batch_axis] * pcount) % mesh.devices.shape[0]:
                # replicating a LOCAL slice would silently treat it as
                # the global batch; process_batch_shard guards batch
                # divisibility up front, so reaching here is a bug
                raise ValueError(
                    "process-local batch axis %d of shape %s (x%d "
                    "processes) does not divide the data mesh axis %d"
                    % (batch_axis, x.shape, pcount,
                       mesh.devices.shape[0]))
            return jax.make_array_from_process_local_data(
                batch_sharding(mesh, x.ndim, batch_axis), x)
        if x.ndim > batch_axis and x.shape[batch_axis] % mesh.devices.shape[0] == 0:
            return jax.device_put(x, batch_sharding(mesh, x.ndim, batch_axis))
        if x.ndim > batch_axis and x.shape[batch_axis] > 1 \
                and mesh.devices.shape[0] > 1 \
                and x.shape[batch_axis] not in _warned_replicate:
            _warned_replicate.add(x.shape[batch_axis])
            import warnings
            warnings.warn(
                "shard_batch: axis %d of shape %s does not divide the "
                "data mesh axis %d; replicating (1/%d of the sharded "
                "throughput)" % (batch_axis, x.shape,
                                 mesh.devices.shape[0],
                                 mesh.devices.shape[0]))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(put, batch)
