# importing the package registers the dataset catalog (reference
# GLIGEN/dataset/catalog.py role)
from . import catalog as _catalog  # noqa: F401
