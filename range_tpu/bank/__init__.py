from .bank import GeoBank  # noqa: F401
