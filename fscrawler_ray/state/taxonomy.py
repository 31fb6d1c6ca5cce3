"""Taxonomy — the reference's tree-shaped side model
(/root/reference/app/models/taxnomy.py:10-77): nodes with name / parent /
children / min_age, a materialized path, and depth; used to render and
filter category hierarchies.

Reimplemented as a flat Arrow-friendly structure: one row per node with a
materialized path, so subtree selection is a vectorized prefix predicate
(`pc.starts_with`) instead of tree walking — the idiomatic columnar shape
for hierarchy filters."""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class TaxonomyNode:
    name: str
    parent: str | None = None
    min_age: int = 3
    children: list = field(default_factory=list)


class Taxonomy:
    def __init__(self):
        self._nodes: dict[str, TaxonomyNode] = {}

    def add(self, name: str, parent: str | None = None, min_age: int = 3) -> TaxonomyNode:
        if "/" in name or not name:
            raise ValueError(f"node name must be a non-empty path segment without '/': {name!r}")
        if name in self._nodes:
            raise ValueError(f"duplicate node {name!r}")
        if parent is not None and parent not in self._nodes:
            raise KeyError(f"unknown parent {parent!r}")
        node = TaxonomyNode(name, parent, min_age)
        self._nodes[name] = node
        if parent is not None:
            self._nodes[parent].children.append(name)
        return node

    def materialized_path(self, name: str) -> str:
        parts = []
        cur: str | None = name
        while cur is not None:
            parts.append(cur)
            cur = self._nodes[cur].parent
        return "/" + "/".join(reversed(parts))

    def depth(self, name: str) -> int:
        return self.materialized_path(name).count("/")

    def effective_min_age(self, name: str) -> int:
        """Max min_age along the ancestry (a child can only restrict)."""
        cur: str | None = name
        best = 0
        while cur is not None:
            best = max(best, self._nodes[cur].min_age)
            cur = self._nodes[cur].parent
        return best

    def to_table(self) -> pa.Table:
        names = sorted(self._nodes)
        return pa.table(
            {
                "name": pa.array(names),
                "parent": pa.array([self._nodes[n].parent for n in names], pa.string()),
                "path": pa.array([self.materialized_path(n) for n in names]),
                "depth": pa.array([self.depth(n) for n in names], pa.int32()),
                "min_age": pa.array([self._nodes[n].min_age for n in names], pa.int8()),
                "effective_min_age": pa.array([self.effective_min_age(n) for n in names], pa.int8()),
            }
        )

    def subtree_mask(self, table: pa.Table, root: str, path_col: str = "path") -> pa.Array:
        """Vectorized subtree membership over a materialized-path column."""
        prefix = self.materialized_path(root)
        return pc.or_(
            pc.equal(table.column(path_col), prefix),
            pc.starts_with(table.column(path_col), prefix + "/"),
        )
