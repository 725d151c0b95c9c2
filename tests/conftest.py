import os

# Tests run on a virtual 8-device CPU mesh so that multi-chip sharding paths
# compile and execute without TPU hardware (the driver separately dry-runs the
# multi-chip path; bench.py runs on the real chip).
#
# Note: in this environment a site plugin pre-sets jax_platforms to
# "axon,cpu", so the JAX_PLATFORMS env var alone is not enough -- we must
# override the config before the backend initializes.
#
# Exception: the compiled-TPU gate (`CTPU_TPU_TESTS=1 pytest -m tpu`) keeps
# the real TPU backend so every Pallas kernel is exercised through Mosaic,
# not the interpreter (tests/test_tpu_compiled.py).
_TPU_GATE = os.environ.get("CTPU_TPU_TESTS") == "1"

if not _TPU_GATE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

if not _TPU_GATE:
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:  # pragma: no cover - backend already initialized
        pass


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: compiled-TPU kernel gate; run with CTPU_TPU_TESTS=1 pytest -m tpu",
    )
