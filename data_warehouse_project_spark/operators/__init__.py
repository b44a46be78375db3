from .windows import latest_per_group, top_k_per_group  # noqa: F401
