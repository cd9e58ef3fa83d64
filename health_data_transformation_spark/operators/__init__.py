from . import cleaning, dedup, similarity, topk, validate  # noqa: F401
