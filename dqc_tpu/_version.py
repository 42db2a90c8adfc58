"""Version stamping (parity: the reference's _version.py, which derives
a PEP-440 version from git describe at build time and falls back to the
packaged constant at runtime — /root/reference/dqc/_version.py role).

Offline-first: the canonical version lives here; `python -m
dqc_tpu._version` prints it (used by packaging); when a git checkout is
present the local revision is appended for traceability.
"""
from __future__ import annotations

import os
import subprocess

__version__ = "0.1.0"


def get_version(with_git: bool = True) -> str:
    """Return the package version, appending `+g<sha>[.dirty]` when run
    from a git checkout (never raises; the bare constant is the
    fallback)."""
    if not with_git:
        return __version__
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.isdir(os.path.join(root, ".git")):
        return __version__
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=root,
            capture_output=True, text=True, timeout=5).stdout.strip()
        if not sha:
            return __version__
        dirty = subprocess.run(
            ["git", "status", "--porcelain"], cwd=root,
            capture_output=True, text=True, timeout=5).stdout.strip()
        return f"{__version__}+g{sha}" + (".dirty" if dirty else "")
    except Exception:  # noqa: BLE001 — version lookup must never fail
        return __version__


if __name__ == "__main__":
    print(get_version())
