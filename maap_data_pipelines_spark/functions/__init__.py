from . import dates, hashing, vectors

__all__ = ["dates", "hashing", "vectors"]
