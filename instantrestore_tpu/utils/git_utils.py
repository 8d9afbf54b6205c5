"""Experiment provenance (reference: training/utils/git_utils.py:7-24)."""

from __future__ import annotations

import subprocess
from typing import Dict


def _git(*args: str) -> str:
    try:
        return subprocess.run(
            ["git", *args], capture_output=True, text=True, timeout=10
        ).stdout.strip()
    except Exception:
        return ""


def get_git_info() -> Dict[str, str]:
    return {
        "commit": _git("rev-parse", "HEAD"),
        "branch": _git("rev-parse", "--abbrev-ref", "HEAD"),
        "dirty": "yes" if _git("status", "--porcelain") else "no",
    }


def dump_git_info(exp_dir) -> None:
    from pathlib import Path

    info = get_git_info()
    Path(exp_dir).mkdir(parents=True, exist_ok=True)
    (Path(exp_dir) / "git_info.txt").write_text(
        "\n".join(f"{k}: {v}" for k, v in info.items()) + "\n"
    )
