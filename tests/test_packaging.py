"""Packaging gate: the repo must be pip-installable (reference parity: the
reference ships an installable package, /root/reference/pyproject.toml:1).

Builds a wheel with pip (offline: --no-build-isolation reuses the ambient
setuptools) and checks that the wheel carries the package, the native C++
source (needed for the lazy runtime build from site-packages), and a
version consistent with ``constriction_tpu.__version__``.
"""

import pathlib
import subprocess
import sys
import zipfile

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _have_setuptools() -> bool:
    try:
        import setuptools  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _have_setuptools(), reason="setuptools unavailable")
def test_wheel_builds_and_carries_native_source(tmp_path):
    res = subprocess.run(
        [
            sys.executable, "-m", "pip", "wheel",
            "--no-build-isolation", "--no-deps", "-w", str(tmp_path),
            str(REPO),
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    wheels = list(tmp_path.glob("constriction_tpu-*.whl"))
    assert len(wheels) == 1, (res.stdout, list(tmp_path.iterdir()))

    import constriction_tpu

    assert constriction_tpu.__version__ in wheels[0].name

    names = zipfile.ZipFile(wheels[0]).namelist()
    assert "constriction_tpu/__init__.py" in names
    assert "constriction_tpu/native/codec.cpp" in names, (
        "wheel must ship the C++ source for the lazy native build"
    )
    assert "constriction_tpu/native/selftest.cpp" in names
    # compiled artifacts must NOT be baked into the wheel (host-specific)
    assert not any(n.endswith(".so") for n in names)
    # every subpackage present
    for sub in ("models", "ops", "parallel", "stream", "symbol", "utils"):
        assert f"constriction_tpu/{sub}/__init__.py" in names


@pytest.mark.skipif(not _have_setuptools(), reason="setuptools unavailable")
def test_installed_package_round_trips(tmp_path):
    """pip install --target, then import from the install dir (not the repo)
    and run the README quick-start round trip."""
    target = tmp_path / "site"
    res = subprocess.run(
        [
            sys.executable, "-m", "pip", "install",
            "--no-build-isolation", "--no-deps", "--quiet",
            "--target", str(target), str(REPO),
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import constriction_tpu, numpy as np, pathlib\n"
        "p = pathlib.Path(constriction_tpu.__file__).resolve()\n"
        "assert str(p).startswith(%r), p\n"
        "from constriction_tpu.stream.stack import AnsCoder\n"
        "from constriction_tpu.stream.model import QuantizedGaussian\n"
        "enc = AnsCoder()\n"
        "m = QuantizedGaussian(-50, 50, 3.2, 9.6)\n"
        "syms = np.array([5, -3, 12], np.int32)\n"
        "enc.encode_reverse(syms, m)\n"
        "assert np.array_equal(enc.decode(m, 3), syms)\n"
    ) % (str(target), str(target))
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
        cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-2000:]
