"""YAML pipeline-spec loader — the user surface for configuring a crawl.

Analog of the reference's config.yml + FilterFactory wiring
(/root/reference/app/process_files.py:20-64, config.yml:1-159): seeds with
per-root category / min_age / target_table routing, a filter chain spec,
and engine knobs. Example::

    seeds:
      - url: http://host00.example.com/
        category: photos
        min_age: 3
        target_table: media
    filters:
      skip_filters:
        - ExtensionFilter: {excluded: [tmp, log]}
        - DepthFilter: {max_depth: 4}
    politeness_budget: 8
    n_shards: 4
    max_rounds: 64
    out_dir: /tmp/crawl_out
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml

from .crawl.engine import CrawlConfig, CrawlEngine
from .sources.synthweb import WebConfig


@dataclass
class SeedSpec:
    url: str
    category: str = "default"
    min_age: int = 3
    target_table: str = "results"


@dataclass
class PipelineSpec:
    seeds: list[SeedSpec] = field(default_factory=list)
    filters: dict = field(default_factory=dict)
    politeness_budget: int = 4
    n_shards: int = 4
    seen_capacity: int = 1 << 17
    salt_hosts: dict = field(default_factory=dict)
    max_rounds: int = 64
    out_dir: str | None = None
    checkpoint_dir: str | None = None
    checkpoint_every: int = 0
    prev_index_dir: str | None = None
    web: dict = field(default_factory=dict)

    @classmethod
    def from_yaml(cls, text_or_path: str) -> "PipelineSpec":
        import os

        if "\n" not in text_or_path and (
            text_or_path.endswith((".yml", ".yaml")) or os.path.exists(text_or_path)
        ):
            with open(text_or_path) as f:
                doc = yaml.safe_load(f)
        else:
            doc = yaml.safe_load(text_or_path)
        if not isinstance(doc, dict):
            raise ValueError(
                f"pipeline spec did not parse to a mapping (got {type(doc).__name__}); "
                "pass a YAML file path or YAML text"
            )
        seeds = [
            SeedSpec(**s) if isinstance(s, dict) else SeedSpec(url=s)
            for s in (doc.get("seeds") or [])
        ]
        return cls(
            seeds=seeds,
            filters=doc.get("filters", {}) or {},
            politeness_budget=int(doc.get("politeness_budget", 4)),
            n_shards=int(doc.get("n_shards", 4)),
            seen_capacity=int(doc.get("seen_capacity", 1 << 17)),
            salt_hosts={str(h): int(k) for h, k in (doc.get("salt_hosts") or {}).items()},
            max_rounds=int(doc.get("max_rounds", 64)),
            out_dir=doc.get("out_dir"),
            checkpoint_dir=doc.get("checkpoint_dir"),
            checkpoint_every=int(doc.get("checkpoint_every", 0)),
            prev_index_dir=doc.get("prev_index_dir"),
            web=doc.get("web", {}) or {},
        )

    def build_engine(self) -> tuple[CrawlEngine, list[str]]:
        # a "kind" key selects a registered Source (e.g. localfs); plain
        # keys configure the synthetic web as before
        if self.web and "kind" in self.web:
            web_spec = dict(self.web)
        else:
            web_spec = WebConfig(**self.web) if self.web else WebConfig()
        cfg = CrawlConfig(
            web=web_spec,
            chain_spec=self.filters or None,
            n_shards=self.n_shards,
            politeness_budget=self.politeness_budget,
            seen_capacity=self.seen_capacity,
            salt_hosts=self.salt_hosts or None,
            max_rounds=self.max_rounds,
            out_dir=self.out_dir,
            checkpoint_dir=self.checkpoint_dir,
            checkpoint_every=self.checkpoint_every,
            prev_index_dir=self.prev_index_dir,
        )
        return CrawlEngine(cfg), [s.url for s in self.seeds]

    def seed_meta(self) -> list[dict]:
        return [
            {"category": s.category, "min_age": s.min_age, "target_table": s.target_table}
            for s in self.seeds
        ]


def run_from_yaml(text_or_path: str) -> dict:
    spec = PipelineSpec.from_yaml(text_or_path)
    eng, seeds = spec.build_engine()
    return eng.run(seeds, seed_meta=spec.seed_meta())
