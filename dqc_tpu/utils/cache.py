"""On-disk array cache for expensive integral tensors.

Parity with the reference Cache (/root/reference/dqc/utils/cache.py): named
tensors stored under prefixed keys with a human-readable signature checked
against the current system (warn on mismatch). HDF5 is replaced by .npz —
no extra dependency, and the arrays are the only payload.

The TPU build additionally benefits from XLA's persistent compilation cache
(enable with jax.config.update('jax_compilation_cache_dir', ...)).
"""
from __future__ import annotations

import json
import os
import warnings
from typing import Callable, Dict, List, Optional

import numpy as np
import jax.numpy as jnp


class Cache:
    def __init__(self, fname: Optional[str] = None, signature: str = "",
                 paramnames: Optional[List[str]] = None, prefix: str = ""):
        self._fname = fname
        self._signature = signature
        self._paramnames = paramnames  # None = cache everything registered
        self._prefix = prefix
        self._store: Dict[str, np.ndarray] = {}
        self._loaded = False

    @classmethod
    def get_dummy(cls) -> "Cache":
        return cls(fname=None)

    def add_prefix(self, prefix: str) -> "Cache":
        c = Cache(self._fname, self._signature, self._paramnames,
                  self._prefix + prefix.rstrip("/") + "/")
        c._store = self._store
        c._loaded = self._loaded
        return c

    def _enabled(self, name: str) -> bool:
        if self._fname is None:
            return False
        if self._paramnames is None:
            return True
        return (self._prefix + name) in self._paramnames or \
            name in self._paramnames

    def _load(self):
        if self._loaded or self._fname is None:
            return
        self._loaded = True
        if not os.path.exists(self._fname):
            return
        with np.load(self._fname, allow_pickle=False) as z:
            meta = json.loads(bytes(z["__meta__"]).decode()) \
                if "__meta__" in z.files else {}
            if self._signature and meta.get("signature", "") != self._signature:
                warnings.warn(
                    f"Cache file {self._fname} was created for a different "
                    f"system (signature mismatch); ignoring its contents.")
                return
            for k in z.files:
                if k != "__meta__":
                    self._store[k] = z[k]

    def _flush(self):
        if self._fname is None:
            return
        payload = dict(self._store)
        payload["__meta__"] = np.frombuffer(
            json.dumps({"signature": self._signature}).encode(), dtype=np.uint8)
        np.savez(self._fname, **payload)

    def cache(self, name: str, fcn: Callable):
        """Return cached array for `name` or compute via fcn() and store."""
        key = self._prefix + name
        if not self._enabled(name):
            return fcn()
        self._load()
        if key in self._store:
            return jnp.asarray(self._store[key])
        val = fcn()
        self._store[key] = np.asarray(val)
        self._flush()
        return val

    def cache_multi(self, names: List[str], fcn: Callable):
        keys = [self._prefix + n for n in names]
        if not all(self._enabled(n) for n in names):
            return fcn()
        self._load()
        if all(k in self._store for k in keys):
            return tuple(jnp.asarray(self._store[k]) for k in keys)
        vals = fcn()
        for k, v in zip(keys, vals):
            self._store[k] = np.asarray(v)
        self._flush()
        return vals
