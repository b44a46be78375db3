from .catalog import Catalog, load_table  # noqa: F401
