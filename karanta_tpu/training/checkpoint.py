"""Checkpoint save/restore: step-numbered directories, keep-last-N,
COMPLETED markers, resume discovery.

Parity with the reference's checkpoint semantics (karanta/training/utils.py:
244-372 get_last_checkpoint/clean_last_n_checkpoints, ocr_training.py:784-802
periodic save_state + keep-last-2): checkpoints live under
<output_dir>/step_<N>/, a COMPLETED marker is written last (crash-safe), and
resume picks the newest completed step. Storage uses orbax-checkpoint
(the TPU-native array serializer) for the state pytree plus a JSON sidecar
for host metadata.
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil
from typing import Any, Optional

logger = logging.getLogger(__name__)

STEP_RE = re.compile(r"^(step|epoch)_(\d+)$")
COMPLETED = "COMPLETED"


def checkpoint_dirs(output_dir: str) -> list[tuple[int, str]]:
    """Sorted (step, path) of checkpoint dirs under output_dir."""
    if not os.path.isdir(output_dir):
        return []
    found = []
    for name in os.listdir(output_dir):
        match = STEP_RE.match(name)
        if match:
            found.append((int(match.group(2)), os.path.join(output_dir, name)))
    return sorted(found)


def get_last_checkpoint(output_dir: str,
                        incomplete: bool = False) -> Optional[str]:
    """Newest checkpoint dir, requiring the COMPLETED marker unless
    incomplete=True (reference utils.py:244-266)."""
    for _, path in reversed(checkpoint_dirs(output_dir)):
        if incomplete or os.path.exists(os.path.join(path, COMPLETED)):
            return path
    return None


def clean_last_n_checkpoints(output_dir: str, keep_last: int = 2) -> None:
    dirs = checkpoint_dirs(output_dir)
    for _, path in dirs[:-keep_last] if keep_last > 0 else dirs:
        logger.info("removing old checkpoint %s", path)
        shutil.rmtree(path, ignore_errors=True)


def save_checkpoint(output_dir: str, step: int, state: Any,
                    metadata: Optional[dict] = None,
                    keep_last: int = 2) -> str:
    """Save a pytree state to <output_dir>/step_<N>/ atomically.

    Multi-process safe: the orbax save itself is a collective (every process
    calls it and writes the shards it owns — fsdp-sharded state never
    materializes on one host), while the host-side file operations (rmtree,
    metadata, COMPLETED marker, retention) run on process 0 only, fenced by
    device barriers.
    """
    import jax
    import orbax.checkpoint as ocp

    multiprocess = jax.process_count() > 1
    primary = not multiprocess or jax.process_index() == 0
    if multiprocess:
        from jax.experimental import multihost_utils

    path = os.path.join(output_dir, f"step_{step}")
    if primary:
        os.makedirs(output_dir, exist_ok=True)
        if os.path.exists(path):
            shutil.rmtree(path)
    if multiprocess:  # nobody writes into a directory being deleted
        multihost_utils.sync_global_devices(f"ckpt_pre_{step}")

    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(os.path.abspath(os.path.join(path, "state")), state)
    checkpointer.wait_until_finished()
    if multiprocess:  # COMPLETED must postdate every process's shards
        multihost_utils.sync_global_devices(f"ckpt_post_{step}")

    if primary:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump({"step": step, **(metadata or {})}, f)
        with open(os.path.join(path, COMPLETED), "w") as f:
            f.write("done\n")
        if keep_last:
            clean_last_n_checkpoints(output_dir, keep_last)
    logger.info("saved checkpoint %s", path)
    return path


def restore_params(path: str) -> tuple[Any, dict]:
    """Restore only the model params from a TrainState checkpoint.

    Target-less orbax restore returns the TrainState pytree as its flattened
    children ``[params, opt_state, step]`` (train_step.TrainState); the
    params subtree keeps its dict structure. Note: target-less restore still
    reads the optimizer state from disk — acceptable for serving start-up
    (one-time I/O), avoids needing the optimizer to rebuild a target.
    Returns (params, metadata).
    """
    state, metadata = restore_checkpoint(path, None)
    params = state[0] if isinstance(state, (list, tuple)) else state["params"]
    return params, metadata


def restore_checkpoint(path: str, target: Any) -> tuple[Any, dict]:
    """Restore a pytree state saved by save_checkpoint.

    `target` is an example pytree (same structure/shapes/dtypes/shardings).
    With target=None the restore is cross-platform safe: orbax's bare
    target-less restore replays the SAVED sharding metadata, whose device
    names belong to the saving process (a CPU-trained checkpoint served on
    a TPU host dies with "Device TFRT_CPU_0 was not found"). Instead we
    build an abstract target from the checkpoint's own shapes/dtypes with
    every array placed on this process's default device.
    Returns (state, metadata).
    """
    import jax
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    state_path = os.path.abspath(os.path.join(path, "state"))
    if target is None:
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        target = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                           sharding=sharding),
            checkpointer.metadata(state_path).item_metadata)
    state = checkpointer.restore(state_path, target)
    meta_path = os.path.join(path, "metadata.json")
    metadata = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return state, metadata
