"""Tensor parallelism as sharding rules over a ``(data, model)`` mesh.

The reference has no TP (SURVEY.md §2.10) and none is *needed* at these model
sizes — this module exists so scaling past one chip's HBM/FLOPs is a sharding
change, not a rewrite: parameters are placed by path-pattern rules
(Megatron-style split of attention qkv/out and FFN in/out projections over a
``model`` mesh axis) and GSPMD propagates the layouts through the unmodified
jitted train/sample steps, emitting the all-reduces over ICI. No model code
knows TP exists.

Composition: the same rules apply to a whole ``TrainState`` (params, EMA,
optimizer moments share param paths), and ``shard_batch``'s ``P('data')``
placement is valid on any mesh carrying a ``data`` axis, so DP x TP is one
mesh constructor call.
"""

from __future__ import annotations

import re
from typing import Any, Iterable, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# path-pattern -> PartitionSpec; first match wins, no match = replicated.
# Patterns anchor on the module/param names of the attention + SwiGLU blocks
# (nn/attention.py, nn/blocks.py) shared by every model family here.
DEFAULT_TP_RULES: tuple[tuple[str, P], ...] = (
    # attention: split projected features (heads) on the way in,
    # reduce over them on the way out
    (r"attn/qkv/kernel$", P(None, "model")),
    (r"attn/qkv/bias$", P("model")),
    (r"attn/out/kernel$", P("model", None)),
    # SwiGLU FFN: split the hidden dim; out projection reduces over it
    (r"ffn\d*/vg_kernel$", P(None, "model")),
    (r"ffn\d*/vg_bias$", P("model")),
    (r"ffn\d*/out_kernel$", P("model", None)),
)


def tp_mesh(n_model: int, devices: Iterable[jax.Device] | None = None) -> Mesh:
    """a 2-D ``(data, model)`` mesh: ``model`` spans ``n_model`` adjacent
    devices (keep it within an ICI-connected group), ``data`` the rest"""
    devs = np.array(list(devices) if devices is not None else jax.devices())
    if len(devs) % n_model != 0:
        raise ValueError(f"{len(devs)} devices not divisible by n_model={n_model}")
    return Mesh(devs.reshape(-1, n_model), axis_names=("data", "model"))


def _path_str(path: Sequence) -> str:
    parts = []
    for k in path:
        for attr in ("key", "name", "idx"):
            if hasattr(k, attr):
                parts.append(str(getattr(k, attr)))
                break
        else:
            parts.append(str(k))
    return "/".join(parts)


def _fits(shape: tuple[int, ...], spec: P, mesh: Mesh) -> bool:
    """a spec applies only if every named axis divides its array dim"""
    if len(spec) > len(shape):
        return False
    for dim, names in zip(shape, spec):
        if names is None:
            continue
        names = names if isinstance(names, tuple) else (names,)
        span = int(np.prod([mesh.shape[n] for n in names]))
        if dim % span != 0:
            return False
    return True


def shard_by_rules(
    tree: Any,
    mesh: Mesh,
    rules: Sequence[tuple[str, P]] = DEFAULT_TP_RULES,
) -> Any:
    """place every array of ``tree`` on ``mesh`` — by the first matching
    path rule, replicated otherwise. Works on a params pytree or a whole
    TrainState (optimizer moments/EMA mirror the param paths, so the same
    rules hit them too); indivisible dims fall back to replication rather
    than erroring, so one odd head count never blocks a run."""
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def place(path, x):
        spec = P()
        if getattr(x, "ndim", 0) > 0:
            s = _path_str(path)
            for pat, candidate in compiled:
                if pat.search(s):
                    if _fits(x.shape, candidate, mesh):
                        spec = candidate
                    break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)
