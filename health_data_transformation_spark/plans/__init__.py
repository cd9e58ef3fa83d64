from .analytics import REGISTRY, oracle_map, query_map  # noqa: F401
