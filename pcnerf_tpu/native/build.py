"""Build the native preprocessing library: ``python -m pcnerf_tpu.native.build``."""

from __future__ import annotations

import fcntl
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "src", "preprocess.cpp")
OUT = os.path.join(HERE, "libpcnerf_native.so")


def _fresh() -> bool:
    return os.path.exists(OUT) and os.path.getmtime(OUT) >= os.path.getmtime(SRC)


def build(force: bool = False) -> str:
    """Compile the shared library if stale.

    Safe under concurrent callers (parallel preprocessing jobs): the compile
    writes to a per-PID temp path and is moved into place atomically, and an
    flock serializes builders so a reader can never dlopen a half-written
    file.
    """
    if not force and _fresh():
        return OUT
    with open(os.path.join(HERE, ".build.lock"), "w") as lockf:
        fcntl.flock(lockf, fcntl.LOCK_EX)
        if force or not _fresh():  # re-check: another process may have built
            tmp = f"{OUT}.{os.getpid()}.tmp"
            cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                   "-fPIC", SRC, "-o", tmp]
            try:
                subprocess.run(cmd, check=True)
                os.replace(tmp, OUT)
            finally:
                if os.path.exists(tmp):
                    os.remove(tmp)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
