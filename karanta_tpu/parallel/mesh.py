"""Device-mesh bootstrap.

TPU-native replacement for the reference's NCCL/Accelerate process-group setup
(reference: scripts/train_karanta_ocr.sh NCCL env, karanta/training/ocr_training.py:128-207)
and for vLLM's `--tensor-parallel-size/--data-parallel-size` plumbing
(reference: karanta/pipeline.py:719-722). All parallelism here is expressed as a
`jax.sharding.Mesh` over ICI/DCN with named axes; XLA inserts the collectives.

Axis conventions:
  "data"  — batch / page sharding (DP). Replicated params, sharded activations.
  "fsdp"  — parameter+optimizer sharding axis (ZeRO-like; reference DeepSpeed
            ZeRO-2/3 equivalent — ocr_training.py:153-185).
  "seq"   — sequence/context parallelism for training activations (the
            reference has no SP — it caps context instead, SURVEY §5.7; this
            axis is TPU-native headroom past that cap). See parallel/context.py.
  "pipe"  — pipeline-parallel stage axis (GPipe schedule over microbatches via
            ppermute; reference has no PP — SURVEY §2.9). See
            parallel/pipeline.py.
  "model" — tensor-parallel axis (megatron-style qkv/mlp sharding; reference
            delegates this to vLLM -tp).

Device-layout order is (data, pipe, fsdp, seq, model): inner axes carry the
chattiest collectives (TP psum every layer, SP K/V all-gather every layer,
FSDP param all-gathers) and land on ICI-adjacent chips; "pipe" moves one
activation per microbatch per stage boundary — the lightest traffic — so it
sits outermost after "data" (whose position is fixed: multi-host batch
feeding assumes each process owns a contiguous block of the data axis).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
PIPE_AXIS = "pipe"
FSDP_AXIS = "fsdp"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"
AXIS_NAMES = (DATA_AXIS, PIPE_AXIS, FSDP_AXIS, SEQ_AXIS, MODEL_AXIS)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Declarative mesh shape. -1 in exactly one field means "absorb the rest".

    Field order keeps (data, fsdp, model) positional compatibility; the mesh
    device layout is always (data, pipe, fsdp, seq, model) — see module
    docstring.
    """

    data: int = -1
    fsdp: int = 1
    model: int = 1
    seq: int = 1
    pipe: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int, int, int]:
        dims = [self.data, self.pipe, self.fsdp, self.seq, self.model]
        free = [i for i, d in enumerate(dims) if d == -1]
        if len(free) > 1:
            raise ValueError(f"At most one mesh axis may be -1, got {dims}")
        fixed = math.prod(d for d in dims if d != -1)
        if free:
            if n_devices % fixed != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes product {fixed}"
                )
            dims[free[0]] = n_devices // fixed
        if math.prod(dims) != n_devices:
            raise ValueError(
                f"Mesh {tuple(dims)} does not cover {n_devices} devices"
            )
        return tuple(dims)  # type: ignore[return-value]

    @property
    def layout_dims(self) -> tuple[int, int, int, int, int]:
        return (self.data, self.pipe, self.fsdp, self.seq, self.model)


def create_mesh(
    config: MeshConfig | None = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = AXIS_NAMES,
) -> Mesh:
    """Build a Mesh with axes (data, fsdp, model) over the given devices.

    Device order is the order returned by jax.devices(), which on TPU slices
    follows the physical torus so that the innermost ("model") axis lands on
    neighbouring chips — keeping TP collectives on ICI, not DCN.
    """
    config = config or MeshConfig()
    devices = list(devices) if devices is not None else jax.devices()
    dims = config.layout_dims
    if -1 not in dims and math.prod(dims) < len(devices):
        # fully specified mesh smaller than the machine: use a device subset
        devices = devices[: math.prod(dims)]
    shape = config.resolve(len(devices))
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def local_mesh() -> Mesh:
    """Single-process mesh over all visible devices, data-parallel only."""
    return create_mesh(MeshConfig(data=-1, fsdp=1, model=1))


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bootstrap (jax.distributed). No-op for single-process runs.

    Replaces the reference's NCCL process-group init
    (ocr_training.py:135 InitProcessGroupKwargs / accelerate launch).
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
