"""Driver-gate hardening: dryrun_multichip must be able to host an
n-device mesh even when the process was launched pinned to a single-chip
platform (this environment's axon sitecustomize imports jax at interpreter
start and pins JAX_PLATFORMS to the TPU relay, defeating the driver's
xla_force_host_platform_device_count env forcing)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import __graft_entry__ as g
g._ensure_virtual_cpu_devices(8)
import jax
ds = jax.devices()
assert len(ds) >= 8, ds
assert ds[0].platform == "cpu", ds
print("ok", len(ds))
"""


def test_ensure_virtual_cpu_devices_under_noncpu_pin():
    # Fresh interpreter pinned to a non-CPU platform (the sitecustomize may
    # rewrite the value to its own plugin name -- either way it is not
    # "cpu", which is the condition the self-arm keys on).  The child never
    # touches the pinned backend: _ensure_virtual_cpu_devices must flip to
    # an 8-device virtual CPU backend BEFORE the first device query, so
    # this passes even with the TPU tunnel dead.
    env = dict(os.environ, JAX_PLATFORMS="tpu")
    env.pop("XLA_FLAGS", None)  # prove the arming needs no env-var help
    r = subprocess.run([sys.executable, "-c", _CHILD], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "ok" in r.stdout, (r.stdout, r.stderr)


def test_ensure_virtual_cpu_devices_under_sitecustomize_pin():
    # The real failure case: env says "cpu" but the axon sitecustomize's
    # register() has already set jax.config.jax_platforms = "axon,cpu" --
    # the env var under-reports the pin, so the self-arm must key on the
    # CONFIG value.  (On hosts without the tunnel env this collapses to the
    # driver's plain cpu+XLA_FLAGS launch, where the arm no-ops and the env
    # forcing supplies the devices -- both paths end at >= 8 CPU devices.)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    r = subprocess.run([sys.executable, "-c", _CHILD], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "ok" in r.stdout, (r.stdout, r.stderr)
