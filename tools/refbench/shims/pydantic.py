"""Minimal stand-in for the pydantic surface the reference's
collections-preprocessing model.py touches (BaseModel kwargs-init,
Field defaults). Validation/coercion is skipped entirely — strictly
FASTER than real pydantic, the conservative direction for a reference
baseline (same rule as the dict-backed rocksdict shim)."""


class BaseModel:
    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)


def Field(default=None, default_factory=None, **_kwargs):
    return default if default_factory is None else default_factory()
