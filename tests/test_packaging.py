"""Packaging: `pip install -e .` must produce an importable package from a
clean venv without PYTHONPATH tricks (pyproject.toml; VERDICT r3 item 8).

The fresh venv sees this interpreter's site-packages through a .pth file
(the outer python is itself a venv, so --system-site-packages cannot
chain to it and the rig has no network for dependency downloads); the
editable install itself runs with --no-deps --no-build-isolation,
exactly what a dev loop uses."""

import os
import subprocess
import sys
import sysconfig

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_editable_install_imports_cleanly(tmp_path):
    venv = tmp_path / "venv"
    subprocess.run([sys.executable, "-m", "venv", str(venv)], check=True)
    py = str(venv / "bin" / "python")
    site = subprocess.run(
        [py, "-c",
         "import sysconfig; print(sysconfig.get_paths()['purelib'])"],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    with open(os.path.join(site, "parent_env.pth"), "w") as f:
        f.write(sysconfig.get_paths()["purelib"] + "\n")
    subprocess.run(
        [py, "-m", "pip", "install", "-e", REPO, "--no-deps",
         "--no-build-isolation", "-q"],
        check=True, cwd=REPO,
    )
    # import from a NEUTRAL cwd (not the repo), no PYTHONPATH: proves the
    # editable install wired the package, entry metadata, and config data
    probe = (
        "import litehandnet_tpu, os;"
        "from litehandnet_tpu.config import get_config;"
        "cfg = get_config('litehandnet/_2_freihand_224x244_dark_h4_ca_none');"
        "assert cfg.MODEL.name == 'litehandnet', cfg.MODEL.name;"
        "from litehandnet_tpu import native;"
        "print('OK', litehandnet_tpu.__version__)"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [py, "-c", probe], check=True, cwd=str(tmp_path),
        capture_output=True, text=True, env=env,
    )
    assert "OK 0.1.0" in out.stdout
