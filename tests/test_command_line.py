"""CLI argument plumbing (the reference test contract's
tests/config/test_command_line.py role): --key=value args reach the Config
with highest priority."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.argv[0] = "prog"  # ensure cmd-line parsing is active
from recbole_fairrec_tpu.config import Config
c = Config(model="FOCF", dataset="ml-100k", config_dict={"epochs": 1})
print("EPOCHS", c["epochs"])
print("LR", c["learning_rate"])
print("TOPK", c["topk"])
print("OBJ", c["fair_objective"])
"""


def test_cmd_line_overrides_dict_and_internal(tmp_path):
    script = tmp_path / "probe.py"
    script.write_text(SCRIPT)
    out = subprocess.run(
        [sys.executable, str(script), "--epochs=9", "--learning_rate=0.5",
         "--topk=[3,7]", "--fair_objective=value"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = dict(l.split(" ", 1) for l in out.stdout.strip().splitlines() if " " in l)
    assert lines["EPOCHS"] == "9"          # CLI beats config_dict
    assert lines["LR"] == "0.5"            # CLI beats internal default
    assert lines["TOPK"] == "[3, 7]"       # literal parsing
    assert lines["OBJ"] == "value"


def test_duplicate_cmd_arg_rejected(tmp_path):
    script = tmp_path / "probe2.py"
    script.write_text(SCRIPT)
    out = subprocess.run(
        [sys.executable, str(script), "--epochs=9", "--epochs=10"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert out.returncode != 0
    assert "duplicate" in (out.stderr + out.stdout).lower()


def test_packaging_console_entry():
    """Packaging surface (reference setup.py:41-43): pyproject.toml installs a
    `run_recbole` console script bound to recbole_fairrec_tpu.cli:main, and the
    package data (properties yamls, native source) resolves from the package."""
    import recbole_fairrec_tpu
    from recbole_fairrec_tpu import cli
    from recbole_fairrec_tpu.data import fast_tsv

    assert callable(cli.main)
    pkg_dir = os.path.dirname(recbole_fairrec_tpu.__file__)
    assert os.path.isfile(os.path.join(pkg_dir, "config", "properties", "overall.yaml"))
    assert os.path.isfile(fast_tsv._SRC)  # native reader source ships inside the package

    import tomllib
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as fh:
        meta = tomllib.load(fh)
    assert meta["project"]["name"] == "recbole_fairrec_tpu"
    assert meta["project"]["version"] == recbole_fairrec_tpu.__version__
    assert meta["project"]["scripts"]["run_recbole"] == "recbole_fairrec_tpu.cli:main"
