# Pass-through stand-in for `tqdm` (not installed offline): returns
# the iterable unchanged; the bar-object form supports update/close.
# Keeping it a no-op UNDERSTATES the reference's cost (the real tqdm
# adds per-item overhead) — the conservative direction for a baseline.
class tqdm:
    def __init__(self, iterable=None, *args, **kwargs):
        self._iterable = iterable

    def __iter__(self):
        return iter(self._iterable if self._iterable is not None else ())

    def update(self, n=1):
        pass

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False
