from .build import build_method

__all__ = ["build_method"]
