from . import deterministic, text, vector  # noqa: F401
