from .catalog import REGISTRY, CatalogQuery  # noqa: F401

# Importing these modules registers their queries into REGISTRY.
from . import expr_ext  # noqa: E402,F401
from . import northstar  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
