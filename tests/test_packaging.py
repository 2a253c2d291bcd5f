"""Packaging sanity: pyproject metadata and console entry points.

Role parity with the reference's installable package (ref
/root/reference/setup.py): every CLI is reachable as a console script,
and the wheel's native-loader payload path is wired into
valle_tpu.data.native_loader's search order.
"""

import importlib
import tomllib
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _project():
    with open(ROOT / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_pyproject_parses_and_is_complete():
    proj = _project()["project"]
    assert proj["name"] == "tpu-valle"
    import valle_tpu

    assert proj["version"] == valle_tpu.__version__
    assert any(d.startswith("jax") for d in proj["dependencies"])


def test_console_scripts_resolve():
    scripts = _project()["project"]["scripts"]
    # one script per CLI in valle_tpu/bin (minus __init__)
    bins = {
        p.stem
        for p in (ROOT / "valle_tpu" / "bin").glob("*.py")
        if p.stem != "__init__"
    }
    targets = {v.split(":")[0].rsplit(".", 1)[-1] for v in scripts.values()}
    assert targets == bins, (targets, bins)
    for spec in scripts.values():
        mod_name, func_name = spec.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name))


def test_native_payload_declared_and_search_path_wired():
    pkg_data = _project()["tool"]["setuptools"]["package-data"]
    assert "valle_tpu.data" in pkg_data
    from valle_tpu.data import native_loader

    # In the repo checkout the loader builds from native/; the installed
    # fallback constant must point inside the package.
    assert native_loader._PKG_NATIVE == (
        ROOT / "valle_tpu" / "data" / "_native"
    )
    assert (ROOT / "native" / "loader" / "valle_loader.cc").exists()
