"""Device mesh construction + sharding rules.

TPU-native replacement for the reference's entire distribution stack
(Lightning DDP, `nn.DataParallel`, DeepSpeed ZeRO-3 + CPU offload — SURVEY
§2.9/§5.8). One `jax.sharding.Mesh` with three axes covers all of it:

  data  — batch of cine slices (DDP / DataParallel equivalent; gradients
          all-reduce via the psum XLA inserts under jit)
  fsdp  — parameter/optimizer-state sharding (ZeRO-3 equivalent; XLA
          all-gathers parameters per layer and reduce-scatters gradients)
  model — megatron-style tensor parallelism over the transformer trunks
          (DiT/Latte/Swin attention qkv/proj + MLP Denses: column-parallel
          in, row-parallel out; XLA inserts the per-block all-reduce)

Shardings are expressed with NamedSharding/PartitionSpec and handed to
jax.jit — no NCCL/MPI/DeepSpeed translation, collectives ride the ICI.
The tensor-parallel rules are pure parameter annotations (the GSPMD
recipe): no model code changes, the partitioner propagates the sharding
through the qkv einsum/head reshape and places one all-reduce after each
row-parallel matmul, exactly the megatron dataflow.
"""

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, fsdp: int = 1, model: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Build a ('data', 'fsdp', 'model') mesh. data=-1 = remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if fsdp <= 0:
        fsdp = 1
    if model <= 0:
        model = 1
    if data <= 0:
        data = n // (fsdp * model)
    total = data * fsdp * model
    assert total <= n, f"mesh {data}x{fsdp}x{model} exceeds {n} devices"
    dev_array = np.asarray(devices[:total]).reshape(data, fsdp, model)
    return Mesh(dev_array, axis_names=("data", "fsdp", "model"))


def axis_size(mesh: Mesh, name: str) -> int:
    """Extent of a mesh axis, 1 when the mesh doesn't have it (meshes built
    before the 'model' axis existed still work)."""
    return int(dict(mesh.shape).get(name, 1))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Device-put a host batch pytree with the batch axis over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_batch_or_replicate(tree: Any, mesh: Mesh) -> Any:
    """shard_batch, falling back to replication for ragged batches.

    device_put with a 'data' PartitionSpec requires the batch dimension to
    divide the axis extent; validation loaders run drop_last=False, so the
    last batch of an epoch can be ragged. Replicating that one batch keeps
    every metric bit-identical to the single-device run (pad-replicating
    would bias the batch mean) at the cost of redundant compute on one
    batch per epoch.
    """
    n = int(mesh.shape["data"])
    b = jax.tree.leaves(tree)[0].shape[0]
    if b % n == 0:
        return shard_batch(tree, mesh)
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)


def _fsdp_spec(shape, fsdp_size: int) -> P:
    """Shard the largest axis divisible by the fsdp extent; else replicate.

    Skips tiny params (biases, scalars) — gathering them costs more than
    storing them replicated.
    """
    if fsdp_size == 1 or np.prod(shape) < 2 * 1024 * fsdp_size:
        return P()
    cands = [(dim, ax) for ax, dim in enumerate(shape) if dim % fsdp_size == 0]
    if not cands:
        return P()
    _, ax = max(cands)
    spec = [None] * len(shape)
    spec[ax] = "fsdp"
    return P(*spec)


# Megatron partition rules for the shared transformer vocabulary
# (models/dit.py Attention/Mlp, reused by Latte, and name-matched by Swin's
# WindowAttention qkv/proj + its shared-Mlp blocks — Swin uses the same Mlp
# module precisely so these rules cover it; see models/swin.py MLP part):
# kernel axis index to put on 'model'. Column-parallel
# layers (qkv, MLP up-projection) split their OUTPUT features; the paired
# row-parallel layer (attention proj, MLP down-projection) splits its INPUT
# features so the only cross-shard sum is one all-reduce per block output.
_TP_RULES = (
    (re.compile(r"qkv/kernel$"), 1),
    (re.compile(r"qkv/bias$"), 0),
    (re.compile(r"Mlp_\d+/Dense_0/kernel$"), 1),
    (re.compile(r"Mlp_\d+/Dense_0/bias$"), 0),
    (re.compile(r"proj/kernel$"), 0),
    (re.compile(r"Mlp_\d+/Dense_1/kernel$"), 0),
)


def _tp_spec(path: str, shape, tp_size: int, fsdp_size: int) -> Optional[P]:
    """Tensor-parallel spec for a transformer param, else None.

    When the param is also large enough to fsdp-shard, the remaining kernel
    axis goes on 'fsdp' (2D sharding — weights live once per data-replica
    group, the megatron+ZeRO-3 composition).
    """
    if tp_size == 1:
        return None
    for rule, ax in _TP_RULES:
        if rule.search(path):
            if ax >= len(shape) or shape[ax] % tp_size != 0:
                return None  # indivisible: fall back to the fsdp rule
            spec = [None] * len(shape)
            spec[ax] = "model"
            if (fsdp_size > 1 and len(shape) == 2
                    and np.prod(shape) >= 2 * 1024 * fsdp_size
                    and shape[1 - ax] % fsdp_size == 0):
                spec[1 - ax] = "fsdp"
            return P(*spec)
    return None


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k)))))
    return "/".join(parts)


def fsdp_shardings(params_shapes: Any, mesh: Mesh) -> Any:
    """Map a pytree of ShapeDtypeStructs (or arrays) to NamedShardings.

    fsdp axis: shape-based ZeRO-3 rule. model axis (if the mesh has one with
    extent > 1): megatron tensor-parallel rules, matched by param path, for
    attention/MLP kernels; optimizer-state leaves mirror their param's tree
    path so Adam moments shard identically.
    """
    fsdp_size = axis_size(mesh, "fsdp")
    tp_size = axis_size(mesh, "model")
    tp_matched = [0]

    def _one(path, leaf):
        spec = _tp_spec(_path_str(path), leaf.shape, tp_size, fsdp_size)
        if spec is None:
            spec = _fsdp_spec(leaf.shape, fsdp_size)
        elif "model" in tuple(spec):
            tp_matched[0] += 1
        return NamedSharding(mesh, spec)

    out = jax.tree_util.tree_map_with_path(_one, params_shapes)
    # Guard against silent TP loss (round-3 verdict #5): a mesh with a real
    # 'model' axis over a param tree where NO rule matched means either the
    # net has nothing tensor-parallelizable (requesting TP is a config
    # error) or a module rename broke the path regexes — both must fail
    # loudly, not fall back to fsdp-only replication.
    if tp_size > 1 and tp_matched[0] == 0:
        paths = [_path_str(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(params_shapes)[0]]
        raise ValueError(
            "mesh has model axis of size %d but no parameter matched any "
            "tensor-parallel rule (_TP_RULES); first params: %s"
            % (tp_size, paths[:8]))
    return out
