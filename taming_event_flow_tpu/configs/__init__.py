from .parser import YAMLParser

__all__ = ["YAMLParser"]
