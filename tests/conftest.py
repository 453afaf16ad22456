"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware.

XLA_FLAGS must be set before the first backend init. JAX_PLATFORMS env alone
is NOT enough here: the machine's sitecustomize (axon TPU tunnel) imports jax
at interpreter startup and calls jax.config.update('jax_platforms',
'axon,cpu'), which overrides the env var — so we re-update the config after
import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

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
