"""Client working-directory state (SURVEY.md §2.A: ``hh cd / pwd``).

The reference persists a client-side working directory in a dotfile so
relative HDFS paths resolve across invocations. Engine analogue: a
tiny session-state object with the same resolution semantics,
persisted to ``~/.hts_cwd`` (override via env for tests).
"""

from __future__ import annotations

import os
import posixpath

STATE_FILE_ENV = "HTS_CWD_FILE"
DEFAULT_STATE_FILE = os.path.expanduser("~/.hts_cwd")


def _state_file() -> str:
    return os.environ.get(STATE_FILE_ENV, DEFAULT_STATE_FILE)


def pwd(default: str = "/") -> str:
    """`hh pwd`: current persisted working directory."""
    try:
        with open(_state_file()) as f:
            p = f.read().strip()
            return p or default
    except OSError:
        return default


def cd(path: str) -> str:
    """`hh cd PATH`: set (and persist) the working directory.

    Relative paths resolve against the current directory, mirroring
    the reference's behavior; returns the new absolute path.
    """
    new = resolve(path)
    with open(_state_file(), "w") as f:
        f.write(new)
    return new


def resolve(path: str) -> str:
    """Resolve a possibly-relative path against the persisted cwd,
    normalizing `.` / `..` components (posix semantics — HDFS paths
    are posix-like regardless of client OS)."""
    if path.startswith(("/", "hdfs://", "s3a://", "file:")):
        return posixpath.normpath(path) if path.startswith("/") else path
    return posixpath.normpath(posixpath.join(pwd(), path))
