"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

The reference has no test suite at all (SURVEY.md §4); multi-chip behavior here
is validated with JAX's host-platform device-count trick.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# this image registers a TPU plugin from sitecustomize; force the cpu backend
# for hermetic, 8-virtual-device tests
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from egopack_tpu.data.synthetic import generate_ego4d_fixture  # noqa: E402


@pytest.fixture(scope="session")
def ego4d_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ego4d")
    return generate_ego4d_fixture(str(root), feature_dim=32, n_videos=2,
                                  actions_per_clip=30, n_oscc=24)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
