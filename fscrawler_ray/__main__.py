"""CLI entry points — the analog of the reference's runnable modules
(crawler_entry_point / process_files / crawl_directory,
/root/reference/README.md:76). The CLI owns the Ray session (guarded init);
library code never does.

    python -m fscrawler_ray crawl  <config.yml>
    python -m fscrawler_ray process <crawl_out_dir> <processed_dir>
    python -m fscrawler_ray report  <crawl_out_dir>
"""

from __future__ import annotations

import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR", log_to_driver=False)
    return ray


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, *args = argv
    # validate BEFORE paying multi-second Ray startup
    needed = {"crawl": 1, "process": 2, "report": 1}
    if cmd not in needed:
        print(f"unknown command {cmd!r}", file=sys.stderr)
        return 2
    if len(args) < needed[cmd]:
        print(f"{cmd} requires {needed[cmd]} argument(s)\n{__doc__}", file=sys.stderr)
        return 2
    ray = _ensure_ray()
    try:
        if cmd == "crawl":
            from .config import run_from_yaml

            summary = run_from_yaml(args[0])
            print(json.dumps(summary))
        elif cmd == "process":
            from .pipelines.process_results import process_results

            print(json.dumps(process_results(args[0], args[1])))
        elif cmd == "report":
            from .pipelines.crawl_report import format_counts, host_rollup, top_hosts_by_bytes

            out = {
                "hosts": host_rollup(args[0]).to_pandas().to_dict("records"),
                "top_by_bytes": top_hosts_by_bytes(args[0]).to_pandas().to_dict("records"),
                "formats": format_counts(args[0]).to_pandas().to_dict("records"),
            }
            print(json.dumps(out, default=str))
    finally:
        # only shut down a session this CLI created when run standalone
        if __name__ == "__main__" and ray.is_initialized():
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
