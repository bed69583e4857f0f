from .tables import load_table, load_tables  # noqa: F401
