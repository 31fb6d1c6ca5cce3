"""Filter registry + YAML/spec-driven construction.

The user-extension surface: the analog of the reference's
``FilterFactory.get_filter(name, **args)``
(/root/reference/app/helpers/filterFactory.py:14-35) and the YAML pipeline
config (/root/reference/app/process_files.py:20-64, config.yml). Users
register a ``VectorFilter`` subclass by name and instantiate chains from a
plain dict / YAML document::

    skip_filters:
      - ExtensionFilter: {excluded: [tmp, log]}
      - SizeFilter: {min_size: 1024}
    notify_filters:
      - PatternFilter: {authorized_pattern: "/photos/"}
    invert: false
"""

from __future__ import annotations

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


class FilterFactory:
    _registry: dict[str, type] = {}

    @classmethod
    def register(cls, klass: type, name: str | None = None) -> type:
        cls._registry[name or klass.__name__] = klass
        return klass

    @classmethod
    def get_filter(cls, name: str, **kwargs) -> VectorFilter:
        if name not in cls._registry:
            raise KeyError(f"unknown filter {name!r}; known: {sorted(cls._registry)}")
        klass = cls._registry[name]
        if klass is OrFilter:
            children = [_build_one(spec) for spec in kwargs.get("filters", [])]
            return OrFilter(children)
        # sets arrive from YAML as lists
        fixed = {k: (frozenset(v) if isinstance(v, list) and k in _SET_ARGS else v) for k, v in kwargs.items()}
        return klass(**fixed)


_SET_ARGS = {"authorized", "excluded", "excluded_names"}

for _k in (
    ExtensionFilter,
    DepthFilter,
    DateFilter,
    SizeFilter,
    PatternFilter,
    RegexPatternFilter,
    NameFilter,
    FilePatternFilter,
    OrFilter,
):
    FilterFactory.register(_k)


def _build_one(spec: dict) -> VectorFilter:
    if len(spec) != 1:
        raise ValueError(f"filter spec must be a single-key mapping, got {spec}")
    (name, kwargs), = spec.items()
    return FilterFactory.get_filter(name, **(kwargs or {}))


def build_chain_from_spec(spec: dict) -> FilterChain:
    """Build a FilterChain from a dict (e.g. parsed YAML)."""
    return FilterChain(
        skip_filters=[_build_one(s) for s in spec.get("skip_filters", [])],
        notify_filters=[_build_one(s) for s in spec.get("notify_filters", [])],
        invert=bool(spec.get("invert", False)),
    )
