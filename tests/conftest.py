"""Test harness configuration.

Tests run on a *virtual 8-device CPU mesh* so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-run-compiles the
multi-chip path).  These env vars must be set before JAX is imported.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize may import jax and register a TPU backend
# before this conftest runs; jax reads JAX_PLATFORMS at import, so update the
# live config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def data_dir() -> Path:
    return REPO_ROOT / "tests" / "data"


@pytest.fixture(scope="session")
def kitti_frames(data_dir):
    """The 10 KITTI grayscale frames used as fixtures (uint8 arrays)."""
    import cv2
    import numpy as np

    frames = []
    img_dir = data_dir / "images"
    for p in sorted(img_dir.glob("*.png")):
        im = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
        assert im is not None
        frames.append(np.asarray(im, dtype=np.uint8))
    assert len(frames) == 10
    return frames


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Reset jax's in-process compilation caches after each test module.

    The XLA CPU compiler segfaulted (reproducibly, same test) compiling
    the PnP-relocalization sequence program ~140 compilations into a full
    suite run, while the same test compiles and passes standalone — a
    state-dependent compiler crash, not a code or memory issue (125 GB
    free at the time).  Clearing per-module keeps any single process's
    compiler state bounded; within-module caching (where reuse actually
    happens) is unaffected.
    """
    yield
    import jax

    jax.clear_caches()
