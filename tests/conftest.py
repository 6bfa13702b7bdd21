"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-device sharding is validated without TPU hardware via XLA's host-platform
device-count flag (SURVEY.md §4: the mesh-faking harness the reference lacks).
Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

# The environment's sitecustomize may have force-registered a TPU backend and
# pinned jax_platforms; re-pin to cpu before any backend initialization.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat test runs skip XLA compiles.
from karanta_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


@pytest.fixture(scope="session")
def mesh8():
    from karanta_tpu.parallel import MeshConfig, create_mesh

    assert len(jax.devices()) == 8
    return create_mesh(MeshConfig(data=2, fsdp=2, model=2))
