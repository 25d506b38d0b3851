from .mesh import BOOK_AXIS, PATH_AXIS, book_sharding, make_mesh, path_sharding, replicated
from .sharded_mc import sharded_book_price, sharded_mc_price

__all__ = [
    "BOOK_AXIS",
    "PATH_AXIS",
    "make_mesh",
    "path_sharding",
    "book_sharding",
    "replicated",
    "sharded_mc_price",
    "sharded_book_price",
]
