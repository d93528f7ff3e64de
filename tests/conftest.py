import os
import subprocess
import sys

# Preferred test platform is a virtual 8-device CPU mesh; set the knobs if
# nothing has claimed the platform yet.  In the axon TPU environment a
# sitecustomize hook pins the TPU backend at interpreter start — there the
# single-device tests simply run on the TPU (exercising the real hardware
# path) and multi-device sharding tests run through the cpu_subprocess
# fixture, which re-launches python with a scrubbed environment.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def scrubbed_cpu_env(n_devices: int = 8) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("_JAX_PLATFORMS_PINNED", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "").strip()
        + f" --xla_force_host_platform_device_count={n_devices}").strip()
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return env


def run_on_cpu_mesh(code: str, n_devices: int = 8,
                    timeout: int = 240) -> subprocess.CompletedProcess:
    """Run a python snippet in a subprocess on an n-device CPU mesh."""
    return subprocess.run(
        [sys.executable, "-c", code], env=scrubbed_cpu_env(n_devices),
        capture_output=True, text=True, timeout=timeout, cwd=REPO_ROOT)


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES


@pytest.fixture(scope="session")
def cpu_mesh_runner():
    return run_on_cpu_mesh
