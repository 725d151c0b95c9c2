from . import bits, special

__all__ = ["bits", "special"]
