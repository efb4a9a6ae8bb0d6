from .logging import get_logger, MetricsCSV  # noqa: F401
