"""Logical-axis sharding rules.

The model code annotates parameters with *logical* axis names ("embed", "mlp",
"heads", ...); this module maps them onto mesh axes via a rule table, the
standard JAX recipe for switching between DP / FSDP / TP without touching model
code. This subsumes what the reference gets from DeepSpeed ZeRO
(ocr_training.py:153-185) and vLLM tensor parallelism (pipeline.py:719-720).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from karanta_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS, MODEL_AXIS

# rule: logical axis name -> mesh axis (or None = replicated)
LogicalAxisRules = tuple[tuple[str, Optional[str]], ...]

# Default rules: embed dim sharded over fsdp (zero-like param sharding),
# head/mlp output dims over model (tensor parallel), batch over data.
DEFAULT_RULES: LogicalAxisRules = (
    ("batch", DATA_AXIS),
    ("embed", FSDP_AXIS),
    ("heads", MODEL_AXIS),
    ("kv_heads", MODEL_AXIS),
    ("mlp", MODEL_AXIS),
    ("vocab", MODEL_AXIS),
    ("head_dim", None),
    ("seq", None),
    ("kv_seq", None),
    ("layers", None),
    ("patch", None),
    ("vit_embed", None),
    ("vit_mlp", MODEL_AXIS),
    ("vit_heads", MODEL_AXIS),
)

# Rules for pure data-parallel (inference on small meshes / tests).
REPLICATED_RULES: LogicalAxisRules = (("batch", DATA_AXIS),)


def spec_from_logical(logical_axes: Sequence[Optional[str]],
                      rules: LogicalAxisRules = DEFAULT_RULES) -> P:
    table = dict(rules)
    mesh_axes = []
    used: set[str] = set()
    for ax in logical_axes:
        mapped = table.get(ax) if ax is not None else None
        if mapped is not None and mapped in used:
            mapped = None  # a mesh axis can appear at most once in a spec
        if mapped is not None:
            used.add(mapped)
        mesh_axes.append(mapped)
    return P(*mesh_axes)


def logical_to_named_sharding(mesh: Mesh,
                              logical_axes: Sequence[Optional[str]],
                              rules: LogicalAxisRules = DEFAULT_RULES) -> NamedSharding:
    return NamedSharding(mesh, spec_from_logical(logical_axes, rules))


def shard_pytree(tree: Any, axes_tree: Any, mesh: Mesh,
                 rules: LogicalAxisRules = DEFAULT_RULES) -> Any:
    """Device-put a pytree of arrays according to a matching pytree of logical axes."""

    def place(x, axes):
        sh = logical_to_named_sharding(mesh, axes, rules)
        return jax.device_put(x, sh)

    return jax.tree.map(place, tree, axes_tree,
                        is_leaf=lambda x: x is None)


def sharding_tree(axes_tree: Any, mesh: Mesh,
                  rules: LogicalAxisRules = DEFAULT_RULES) -> Any:
    """Pytree of NamedShardings from a pytree of logical-axis tuples."""
    return jax.tree.map(
        lambda axes: logical_to_named_sharding(mesh, axes, rules),
        axes_tree,
        is_leaf=lambda x: isinstance(x, tuple) and all(
            a is None or isinstance(a, str) for a in x),
    )
