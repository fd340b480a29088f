"""The driver's acceptance artifacts must work where the driver runs them.

Round-1 regression: ``dryrun_multichip`` asserted on device count instead of
self-provisioning a virtual CPU mesh, so the driver (one real TPU chip
visible) recorded rc=1 despite the multi-device code passing tests.  These
tests invoke ``__graft_entry__`` in fresh subprocesses that mimic the
driver's environment.
"""

import pytest
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(**overrides):
    env = dict(os.environ)
    # Simulate the driver: a backend with ONE device and no virtual-mesh
    # flags.  (conftest.py exports an 8-device XLA_FLAGS into os.environ;
    # strip it so dryrun_multichip must self-provision.)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    env.update(overrides)
    return env


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_virtual_mesh():
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO_ROOT, env=_clean_env(), capture_output=True, text=True,
        timeout=1500)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip ok" in proc.stdout + proc.stderr


@pytest.mark.slow
def test_entry_compiles_single_device():
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax, __graft_entry__ as g; fn, args = g.entry();"
         "print('entry ok', jax.eval_shape(fn, *args) is not None)"],
        cwd=REPO_ROOT, env=_clean_env(), capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "entry ok True" in proc.stdout


def test_entry_module_surface():
    """Fast-tier smoke: the driver entry module exposes both hooks with
    the contracted signatures (the compile checks above are slow-tier)."""
    import inspect

    import __graft_entry__ as g

    assert callable(g.entry)
    sig = inspect.signature(g.dryrun_multichip)
    assert list(sig.parameters) == ["n_devices"]
