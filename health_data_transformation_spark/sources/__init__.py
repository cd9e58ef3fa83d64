from . import bucketed, csv, formats, json  # noqa: F401
from .tables import TESTDATA_TABLES, load_table, register_views  # noqa: F401
