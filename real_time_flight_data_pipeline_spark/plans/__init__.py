from .catalog import REGISTRY, CatalogQuery  # noqa: F401
