from . import metrics, meters, progress_bar

__all__ = ["metrics", "meters", "progress_bar"]
