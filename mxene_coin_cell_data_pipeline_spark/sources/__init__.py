from .tables import load_table, register_views  # noqa: F401
from .cycler_csv import read_cycler_csv  # noqa: F401
