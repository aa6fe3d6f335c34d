"""Every shell workflow's CLI invocation must parse (the reference ships
scripts that crash on its own argparse; ours must not — PARITY D5)."""

import glob
import os
import shlex

from infodiffusion_tpu.cli import parse_args
from infodiffusion_tpu.eval_disentanglement import main as _eval_main  # noqa: F401
from infodiffusion_tpu.cli import build_parser

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _extract_invocations():
    out = []
    for sh in sorted(glob.glob(os.path.join(REPO, "scripts", "*.sh"))):
        for line in open(sh):
            line = line.strip()
            if line.startswith("python run.py"):
                out.append(("run", shlex.split(line)[2:], sh))
            elif line.startswith("python eval_disentanglement.py"):
                out.append(("disent", shlex.split(line)[2:], sh))
    return out


def test_all_script_invocations_parse():
    invocations = _extract_invocations()
    assert len(invocations) >= 10
    for kind, args, src in invocations:
        if kind == "run":
            cfg = parse_args(args)
            assert cfg.model in ("diff", "vae", "vanilla"), src
        else:
            ns = build_parser(require_mode=False).parse_args(args)
            assert ns.dataset, src


def test_example_scripts_parse_help():
    """examples/*.py must import cleanly and expose the standard CLI
    flag surface (argparse --help exits 0)."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("generate.py", "traverse.py"):
        r = subprocess.run(
            [sys.executable, os.path.join(root, "examples", name), "--help"],
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 0, (name, r.stderr[-500:])
        assert "--model" in r.stdout
