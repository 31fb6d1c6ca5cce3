from .core import (
    DateFilter,
    DepthFilter,
    ExtensionFilter,
    FilePatternFilter,
    FilterChain,
    NameFilter,
    OrFilter,
    PatternFilter,
    RegexPatternFilter,
    SizeFilter,
    VectorFilter,
)
from .factory import FilterFactory, build_chain_from_spec

__all__ = [
    "VectorFilter",
    "ExtensionFilter",
    "DepthFilter",
    "DateFilter",
    "SizeFilter",
    "PatternFilter",
    "RegexPatternFilter",
    "NameFilter",
    "FilePatternFilter",
    "OrFilter",
    "FilterChain",
    "FilterFactory",
    "build_chain_from_spec",
]
