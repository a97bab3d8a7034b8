"""Session/temp-dir management (reference: hilo_mpc/util/session.py:28-67).

The reference needs temp dirs for JIT-compiled C artifacts; our XLA equivalent is the
persistent compilation cache, which `Session` configures — plus a scratch dir for
exported artifacts (solution .mat files, AOT-lowered executables).
"""
from __future__ import annotations

import os
import shutil
import tempfile
from typing import Optional


class TempDir:
    def __init__(self, prefix: str = "hilo_mpc_tpu_"):
        self.path = tempfile.mkdtemp(prefix=prefix)

    def cleanup(self):
        shutil.rmtree(self.path, ignore_errors=True)

    def __enter__(self):
        return self.path

    def __exit__(self, *exc):
        self.cleanup()


class Session:
    """Context manager owning a scratch dir and (optionally) a persistent XLA
    compilation cache so repeated runs skip recompiles."""

    def __init__(self, compilation_cache: Optional[str] = None,
                 prefix: str = "hilo_mpc_tpu_"):
        self._tmp = TempDir(prefix=prefix)
        self.path = self._tmp.path
        self._cache_dir = compilation_cache

    def __enter__(self):
        if self._cache_dir:
            os.makedirs(self._cache_dir, exist_ok=True)
            import jax

            jax.config.update("jax_compilation_cache_dir", self._cache_dir)
        return self

    def __exit__(self, *exc):
        self._tmp.cleanup()
        return False
