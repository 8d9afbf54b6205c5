"""Console entry points (pyproject [project.scripts]).

The runnable front-ends live in the repository's ``scripts/`` directory —
thin arg-parsing shells over the package API (the reference keeps its CLIs
the same way: scripts/train.py, inference/test.py). These wrappers locate
and execute them so ``pip install -e .`` gives working ``instantrestore-*``
commands from a source checkout; a wheel install without the scripts tree
gets an actionable error instead of an ImportError.
"""

from __future__ import annotations

import runpy
import sys
from pathlib import Path


def _run(script: str) -> int:
    path = Path(__file__).resolve().parent.parent / "scripts" / script
    if not path.exists():
        sys.stderr.write(
            f"{script} not found at {path}: the instantrestore-* console "
            "commands need a source checkout (pip install -e .). From a "
            "wheel install, use the library API (instantrestore_tpu.*) or "
            "run the scripts from the repository.\n"
        )
        return 2
    sys.argv[0] = str(path)
    runpy.run_path(str(path), run_name="__main__")
    return 0


def train() -> int:
    return _run("train.py")


def infer() -> int:
    return _run("infer.py")


def serve() -> int:
    return _run("serve.py")


def parity() -> int:
    return _run("parity.py")


def evaluate() -> int:
    return _run("evaluate.py")
