from .query import CardQuery  # noqa: F401
