"""Cluster job entry point — what `ray job submit` runs on a real
multi-node cluster (the north rule's submission path):

    ray job submit --working-dir . -- python jobs/crawl_job.py crawl.yml

Connects to the cluster Ray (`address="auto"`); falls back to a local
session when no cluster is reachable (the sandbox case, where the N vs
4N evidence instead comes from `python bench.py --scaling`). The YAML
spec carries everything: seeds, source kind (synthweb / localfs / any
registered Source), filters, shard count, politeness, salting,
checkpoint cadence and output dirs — so the same file drives a laptop
test and a 256-node run.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    import ray

    if not ray.is_initialized():
        try:
            ray.init(address="auto", include_dashboard=False, logging_level="ERROR")
        except ConnectionError:
            ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, ".")
    from fscrawler_ray.config import run_from_yaml

    summary = run_from_yaml(sys.argv[1])
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
