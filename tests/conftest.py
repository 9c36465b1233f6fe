"""Test harness config: run JAX on CPU with 8 virtual devices so sharding
tests exercise multi-chip code paths without a TPU pod (SURVEY §4).

The session environment pins JAX_PLATFORMS=axon (a remote-TPU tunnel) and a
sitecustomize module imports jax at interpreter start, so jax's config has
already latched the env var by the time pytest runs. We therefore override
via jax.config.update (valid until the first backend initialization).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: CPU compiles of the scanned mapping stages
# dominate test wall-clock; cache them across runs
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}"
)
assert jax.device_count() >= 8, "expected 8 virtual CPU devices for sharding tests"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-SLAM runs (minutes-to-tens-of-minutes on a small CPU box). "
        "Deselected by default; run with --runslow or `pytest -m slow`.",
    )


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full SLAMSystem.run() integration)",
    )


def pytest_collection_modifyitems(config, items):
    # an explicit -m expression (e.g. `-m slow`) takes full control
    if config.getoption("--runslow") or config.getoption("-m"):
        return
    import pytest

    skip = pytest.mark.skip(reason="slow tier: use --runslow or -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
