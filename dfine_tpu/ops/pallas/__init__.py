from .scatter_rows import rows_scatter_add  # noqa: F401
