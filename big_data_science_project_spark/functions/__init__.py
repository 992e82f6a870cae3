from .numeric import dsum, davg, dsum_expr

__all__ = ["dsum", "davg", "dsum_expr"]
