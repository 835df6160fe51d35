"""Minimal file-backed fake of the `lmdb` module API surface this framework
uses (open → env.begin(write=) → txn.get/put), so the LMDB write path
(prepare_data.py) and read path (lrhr_dataset.py) execute for real in tests
despite the wheel being absent from this image.

Persists the key→bytes store as a pickle at <path>/data.pkl; real lmdb also
treats `path` as a directory (subdir=True default) holding data.mdb.
"""

from __future__ import annotations

import builtins
import os
import pickle
from contextlib import contextmanager

_STORE_NAME = "data.pkl"


class _Txn:
    def __init__(self, store):
        self._store = store

    def get(self, key: bytes):
        return self._store.get(bytes(key))

    def put(self, key: bytes, value: bytes):
        self._store[bytes(key)] = bytes(value)
        return True


class _Env:
    def __init__(self, path: str, readonly: bool):
        self._file = os.path.join(path, _STORE_NAME)
        self._readonly = readonly
        if os.path.exists(self._file):
            with builtins.open(self._file, "rb") as f:
                self._store = pickle.load(f)
        else:
            if readonly:
                raise Exception(f"fake_lmdb: no such database {path}")
            self._store = {}

    @contextmanager
    def begin(self, write: bool = False):
        assert not (write and self._readonly), "write txn on readonly env"
        yield _Txn(self._store)
        if write:
            with builtins.open(self._file, "wb") as f:
                pickle.dump(self._store, f)

    def close(self):
        pass


def open(path, readonly=False, **kwargs):  # noqa: A001 - lmdb API name
    if not readonly:
        os.makedirs(path, exist_ok=True)
    return _Env(path, readonly)
