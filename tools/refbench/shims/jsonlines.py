# Minimal, faithful stand-in for the `jsonlines` package (not
# installed in this offline container), sufficient for the reference
# scripts' usage: jsonlines.open(path) iterated as a reader, and
# jsonlines.open(path, mode='w')/( 'r') with .write(obj) / iteration,
# used as a context manager. Serialization behavior matches the real
# package (one compact-ish json.dumps per line, UTF-8, no ASCII
# escaping) so the measured I/O volume is representative.
import json


class _Reader:
    def __init__(self, fp):
        self._fp = fp

    def __iter__(self):
        for line in self._fp:
            line = line.strip()
            if line:
                yield json.loads(line)

    def close(self):
        self._fp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class _Writer:
    def __init__(self, fp):
        self._fp = fp

    def write(self, obj):
        self._fp.write(json.dumps(obj, ensure_ascii=False))
        self._fp.write('\n')

    def close(self):
        self._fp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def open(path, mode='r'):
    import builtins
    if mode == 'w':
        return _Writer(builtins.open(path, 'w', encoding='utf-8'))
    if mode == 'r':
        return _Reader(builtins.open(path, 'r', encoding='utf-8'))
    raise ValueError(f'unsupported jsonlines mode: {mode}')
