"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU behaviour is exercised by bench.py / the driver's graft entry; tests
must be hermetic and runnable anywhere, so we force the CPU backend with 8
virtual devices (the JAX analogue of a fake multi-chip backend).
"""

import os
import sys

# Force the CPU platform: the ambient environment may export
# JAX_PLATFORMS=axon (a tunnelled TPU), and tests must never contend for it.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# XLA-CPU's default matmul precision is bf16-fastmath (errors ~1e-2); parity
# tests need true fp32 accumulation.  TPU production code sets dtypes
# explicitly, so this is test-only configuration.
jax.config.update("jax_default_matmul_precision", "highest")


REFERENCE_ROOT = "/root/reference/DiffSynth-Studio"


def _reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not _reference_available(),
    reason="reference repo not mounted; parity-oracle tests are skipped",
)


def _ensure_ref_package():
    """Register a synthetic package ``refds`` rooted at the reference tree.

    Loading reference files through a synthetic package (instead of importing
    ``diffsynth`` itself) avoids the heavy __init__ side-effects (modelscope,
    torchvision, ...).  Relative imports inside the loaded files resolve via
    the package __path__, which points at the real reference directories.
    """
    import types

    root = os.path.join(REFERENCE_ROOT, "diffsynth")
    if "refds" in sys.modules:
        return
    for name, path in [
        ("refds", root),
        ("refds.models", os.path.join(root, "models")),
        ("refds.schedulers", os.path.join(root, "schedulers")),
        ("refds.pipelines", os.path.join(root, "pipelines")),
        ("refds.extensions", os.path.join(root, "extensions")),
    ]:
        mod = types.ModuleType(name)
        mod.__path__ = [path]
        sys.modules[name] = mod


def load_ref_module(dotted: str):
    """Import e.g. 'models.qwen_image_dit' from the reference as a module."""
    import importlib

    if not _reference_available():
        pytest.skip("reference repo not mounted")
    _ensure_ref_package()
    return importlib.import_module(f"refds.{dotted}")


@pytest.fixture(scope="session")
def ref_diffsynth():
    """Compatibility fixture: returns the synthetic reference root package."""
    load_ref_module("schedulers.flow_match")
    return sys.modules["refds"]
