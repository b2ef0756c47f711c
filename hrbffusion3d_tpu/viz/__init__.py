from . import viewer, stats  # noqa: F401
