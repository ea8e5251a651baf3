"""Complex <-> float32 packing at jit boundaries.

The axon TPU tunnel (and conservatively, any TPU runtime) only moves real
arrays across the host<->device boundary; complex64 is fully supported
*inside* compiled programs. Every jitted entry point in this framework
therefore takes/returns float32 pytrees: complex leaves are packed as
``{"__re": real, "__im": imag}`` dicts on host and reassembled with
`jax.lax.complex` on device.
"""

from typing import Any

import jax
import numpy as np

RE, IM = "__re", "__im"


def pack_array(x):
    """Complex ndarray -> {"__re","__im"} float32 dict; passthrough otherwise."""
    if np.iscomplexobj(x):
        return {RE: np.ascontiguousarray(x.real, dtype=np.float32),
                IM: np.ascontiguousarray(x.imag, dtype=np.float32)}
    return x


def is_packed(x: Any) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {RE, IM}


def pack(tree: Any) -> Any:
    """Recursively pack complex leaves of a nested dict/list structure."""
    if isinstance(tree, dict):
        if is_packed(tree):
            return tree
        return {k: pack(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(pack(v) for v in tree)
    return pack_array(tree)


def unpack(tree: Any) -> Any:
    """Inverse of `pack`, run inside jit: rebuilds complex leaves."""
    if isinstance(tree, dict):
        if is_packed(tree):
            return jax.lax.complex(tree[RE], tree[IM])
        return {k: unpack(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(unpack(v) for v in tree)
    return tree


def pack_jnp(tree: Any) -> Any:
    """Pack complex leaves of device arrays (inside jit, before returning)."""
    import jax.numpy as jnp

    def _pack(x):
        if hasattr(x, "dtype") and jnp.iscomplexobj(x):
            return {RE: jnp.real(x), IM: jnp.imag(x)}
        return x

    if isinstance(tree, dict) and not is_packed(tree):
        return {k: pack_jnp(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(pack_jnp(v) for v in tree)
    return _pack(tree)


def unpack_np(tree: Any) -> Any:
    """Host-side inverse: packed float arrays -> numpy complex64."""
    if isinstance(tree, dict):
        if is_packed(tree):
            return np.asarray(tree[RE]) + 1j * np.asarray(tree[IM])
        return {k: unpack_np(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(unpack_np(v) for v in tree)
    return np.asarray(tree)
