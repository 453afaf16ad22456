"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware.

XLA_FLAGS must be set before the first backend init. JAX_PLATFORMS env alone
is NOT enough here: the machine's sitecustomize (axon TPU tunnel) imports jax
at interpreter startup and calls jax.config.update('jax_platforms',
'axon,cpu'), which overrides the env var — so we re-update the config after
import."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    # the dryrun's canonical flag set (thread caps + raised collective
    # rendezvous timeouts — XLA:CPU aborts the process if 8 partitions miss a
    # collective by 40s, which single-core serialization can trigger). Using
    # the byte-identical set also lets suite runs and the driver's
    # dryrun_multichip share persistent-compile-cache entries.
    import __graft_entry__
    os.environ["XLA_FLAGS"] = __graft_entry__._dryrun_xla_flags(8)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the SPMD trainer tests cost minutes of XLA time
# on one CPU core; cache them across suite runs (and warm the driver's
# dryrun path)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_dir():
    if not GOLDEN_DIR.exists():
        pytest.skip("golden data not generated (run scripts/gen_golden.py)")
    return GOLDEN_DIR


def load_golden(name: str) -> dict:
    path = GOLDEN_DIR / f"{name}.npz"
    if not path.exists():
        pytest.skip(f"golden file {name}.npz not generated (run scripts/gen_golden.py)")
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}
