"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship image-enrichment pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 (+ the training-data extensions); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible one (matching column
names). Ray is initialised by the driver — nothing here calls ray.init().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# fixed (sf-independent) output dir for the SQL-checked crawl rollup: the
# oracle_sql() string must name the path, and the driver re-runs the Ray
# query before the SQL, so last-write-wins keeps the two sides consistent
CRAWL_ROLLUP_DIR = "/tmp/fscrawler_oracle_crawl_out"
CRAWL_SCAN_DIR = "/tmp/fscrawler_oracle_crawl_scan"
CRAWL_SHARED_DIR = "/tmp/fscrawler_oracle_crawl_shared"
ROBOTS_RULES_DIR = "/tmp/fscrawler_oracle_robots_rules"
WDS_TAR_DIR = "/tmp/fscrawler_oracle_wds_tars"
WARC_DIR = "/tmp/fscrawler_oracle_warc"
SITEMAP_DIR = "/tmp/fscrawler_oracle_sitemaps"
SITEMAP_INCR_DIR = "/tmp/fscrawler_oracle_sitemaps_incr"
IMAGES_SPOOL_DIR = "/tmp/fscrawler_oracle_images"
AUDIO_SPOOL_DIR = "/tmp/fscrawler_oracle_audio"
VIDEO_SPOOL_DIR = "/tmp/fscrawler_oracle_video"
HOST_EDGES_DIR = "/tmp/fscrawler_oracle_hostedges"
HOST_HITS_EDGES_DIR = "/tmp/fscrawler_oracle_hostedges_hits"
HOST_PPR_EDGES_DIR = "/tmp/fscrawler_oracle_hostedges_ppr"
HOST_OPIC_EDGES_DIR = "/tmp/fscrawler_oracle_hostedges_opic"
HOST_LP_EDGES_DIR = "/tmp/fscrawler_oracle_hostedges_lp"
HOST_OPICB_EDGES_DIR = "/tmp/fscrawler_oracle_hostedges_opicb"
ANCHOR_EDGES_DIR = "/tmp/fscrawler_oracle_urledges_anchor"
CDC_CUR_DIR = "/tmp/fscrawler_oracle_cdc_cur"
CDC_PREV_DIR = "/tmp/fscrawler_oracle_cdc_prev"
CKPT_RUN_DIR = "/tmp/fscrawler_oracle_ckpt_run"
CKPT_DIR = "/tmp/fscrawler_oracle_ckpt"
ROBOTS_DIFF_OLD_DIR = "/tmp/fscrawler_oracle_robots_old"
ROBOTS_DIFF_NEW_DIR = "/tmp/fscrawler_oracle_robots_new"
WARCR_DIR = "/tmp/fscrawler_oracle_warc_revisit"
OPIC_C1_DIR = "/tmp/fscrawler_oracle_opic_c1"
OPIC_C2_DIR = "/tmp/fscrawler_oracle_opic_c2"
HOST_OPICC_EDGES_DIR = "/tmp/fscrawler_oracle_hostedges_opicc"
HOST_MOD_EDGES_DIR = "/tmp/fscrawler_oracle_hostedges_mod"
HOST_REC_EDGES_DIR = "/tmp/fscrawler_oracle_hostedges_rec"
RECRAWL_C1_DIR = "/tmp/fscrawler_oracle_recrawl_c1"
RECRAWL_C2_DIR = "/tmp/fscrawler_oracle_recrawl_c2"

# Why each rows-only query has no oracle_sql() entry (VERDICT r04 #7).
# Every entry is either inherently non-SQL-replayable (floats/FFT/pixel
# kernels, xxh64 — DuckDB has no xxh64) or depends on such a stage; where
# a SQL-CHECKED twin certifies the same kernel end-to-end it is named.
ROWS_ONLY_REASONS: dict[str, str] = {
    "minhash_neardup": "xxh64 minhash (no DuckDB xxh64); twin: minhash_md5_neardup replays bands->buckets->pairs, minhash_accuracy/lsh_recall score it",
    "ngram_jaccard_pairs": "xxh64 LSH candidate stage; twin: ngram_jaccard_exact (lossless prefix-filter join, identical verify kernel)",
    "simhash_neardup": "xxh64 simhash bits; twin: simhash_md5_docs (same fold over md5) + images_phash_* banded family",
    "simhash_docs": "xxh64 simhash bits; twin: simhash_md5_docs",
    "fingerprint_docs": "xxh64 rolling hash; twin: fingerprint_md5_docs (+ fingerprint_canon)",
    "top_tokens_approx": "Count-Min over xxh64 rows; twin: cms_token_estimates (md5 CMS, SQL-checked estimates)",
    "embedding_neardup": "float32 cosine thresholds (banker's-rounding drift across engines); twin: embedding_neardup_lsh (integer-exact verify, SQL-checked) + pytest brute-force pair parity",
    "embedding_clusters": "float k-means centroids (iterative float means); pytest: assignment = argmin distance",
    "semantic_neardup": "float k-means bucketing stage; twins: embedding_neardup_lsh/_groups/_dedup_clean (SQL-checked LSH bucketing, exact integer verify, CC closure, pruning) + pytest within-cluster == brute force",
    "neardup_components": "upstream pairs are xxh64-LSH-approximate; twin: neardup_components_exact (recursive-CTE closure over md5 pairs)",
    "corpus_dedup": "consumes xxh64 LSH pairs; twin: corpus_clean_exact + neardup_components_exact",
    "corpus_clean": "includes the LSH near-dup stage; twin: corpus_clean_exact (every rule deterministic, SQL-checked end-to-end)",
    "corpus_prep": "packing consumes corpus_clean's LSH survivors; twins: corpus_clean_exact + pack_sequences (SQL-checked packer)",
    "crawl_counters": "live engine/actor counter snapshot (includes scheduling-dependent chunk/task tallies); twin: crawl_counters_audit vs on-disk lineage",
    "crawl_host_degree": "observed link tally lives in engine state; twin: crawl_host_degree_exact over the written edge parts",
    "crawl_compact": "output file counts depend on writer parallelism (same rows, different part layout); rows+bytes conserved by pytest",
    "host_pagerank": "float power iteration converged by tol (iteration count data-dependent); twin: host_pagerank_exact (fixed-iteration integer oracle)",
    "images_enrich": "emits binary payload bytes + float decode features (brightness/entropy); metadata twins: images_attrs, images_thumbnails, images_shard_manifest",
    "images_phash_dedup": "in-memory corpus variant; twin: images_phash_dedup_spool over the written spool",
    "images_phash_neardup": "in-memory corpus variant; twin: images_phash_neardup_spool",
    "images_dedup_keep_best": "keep-best scoring uses float quality features; twin: images_dedup_keep_best_spool (integer keeper over the spool)",
    "images_neardup_groups": "in-memory corpus variant; twin: images_neardup_groups_spool (recursive-CTE transitive closure)",
    "images_caption_extract": "float caption/token features from the decode stage; twin: images_caption_features (integer feature subset, SQL-checked)",
    "images_quality_filter": "composite includes decode-stage pixel kernels (brightness bounds); metadata-prefix twin: crawl_host_quality + images_aspect_buckets",
    "images_caption_consistency": "float cosine between caption and pixel features; pytest: planted consistent/inconsistent pairs",
    "audio_features": "FFT/spectral float kernels (no SQL FFT); pytest: synthesized tones hit expected bins",
}
PAGERANK_EXACT_ITERS = 20
HITS_EXACT_ITERS = 8
PPR_EXACT_ITERS = 6
OPIC_EXACT_ITERS = 6
LP_EXACT_ITERS = 4


def _collect(ds, empty_cols: dict) -> Any:
    """Collect an output-sized Dataset eagerly with a TYPED empty
    fallback (a 0-row Dataset loses its schema through to_pandas, which
    fails the driver's dtype-strict compare).  ``empty_cols`` maps column
    name → pyarrow type, stating the schema once per query."""
    import pyarrow as pa

    batches = [b for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows]
    if not batches:
        return pa.table({n: pa.array([], t) for n, t in empty_cols.items()})
    return pa.concat_tables(batches)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (input_hint image table →
    attrs → hash → decode+phash verify → caption features)."""
    from fscrawler_ray.pipelines.flagship import flagship

    return flagship("/root/testdata/sf0.001")


def _crawl_queries() -> dict[str, Callable[[str], Any]]:
    from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
    from fscrawler_ray.sources.synthweb import SynthWeb, WebConfig

    def _scale(sf_dir: str) -> WebConfig:
        from fscrawler_ray.sources.images import rows_for_sf

        n = rows_for_sf(sf_dir, per_sf=2000)  # hosts*depth scale with sf
        n_hosts = max(4, min(32, n // 16))
        return WebConfig(seed=42, n_hosts=n_hosts, max_depth=3)

    # crawl_trace and crawl_counters share ONE cached engine run per
    # (process, sf_dir): the crawl is deterministic w.r.t. n_shards, so a
    # single run serves both views — halves the driver's check-time cost
    # for the crawl family (VERDICT r02 next-round #1)
    _run_cache: dict[str, tuple] = {}

    def _shared_run(sf_dir: str) -> tuple:
        if sf_dir not in _run_cache:
            import shutil

            cfg = _scale(sf_dir)
            # fixed out_dir: the run streams its trace + results to a known
            # spool so crawl_trace / crawl_counters_audit get real DuckDB
            # oracles over the on-disk lineage (the crawl_scan pattern)
            out = CRAWL_SHARED_DIR
            shutil.rmtree(out, ignore_errors=True)
            shutil.rmtree(out.rstrip("/") + "_trace", ignore_errors=True)
            shutil.rmtree(out.rstrip("/") + "_deadletter", ignore_errors=True)
            eng = CrawlEngine(CrawlConfig(web=cfg, n_shards=4, politeness_budget=4, max_rounds=40, out_dir=out))
            summary = eng.run(SynthWeb(cfg).seeds())
            _run_cache.clear()  # the fixed dir holds ONE sf at a time
            _run_cache[sf_dir] = (eng.trace_table(), summary, eng)
        return _run_cache[sf_dir]

    def _shared_engine(sf_dir: str):
        return _shared_run(sf_dir)[2]

    def crawl_trace(sf_dir: str):
        # SQL-CHECKED: the engine's trace_table() reconstruction (part merge
        # + global seq order) vs DuckDB reading the same streamed parts
        import pyarrow as pa

        t = _shared_run(sf_dir)[0]
        return t.set_column(
            t.schema.get_field_index("seq"), "seq", t.column("seq").cast(pa.int64())
        )

    def crawl_counters(sf_dir: str):
        import pyarrow as pa

        c = _shared_run(sf_dir)[1]["counters"]
        return pa.table({k: [int(v)] for k, v in c.items() if isinstance(v, int)})

    def crawl_counters_audit(sf_dir: str):
        """SQL-CHECKED counter/lineage consistency: the engine's own
        accounting (seq_offset, result_rows — driver-side integers) vs
        DuckDB counting the on-disk trace parts and result partitions the
        same run wrote.  A lost/duplicated part or a drifted counter breaks
        the match."""
        import pyarrow as pa

        s = _shared_run(sf_dir)[1]
        return pa.table(
            {
                "emitted": pa.array([int(s["emitted"])], pa.int64()),
                "result_rows": pa.array([int(s["result_rows"])], pa.int64()),
            }
        )

    def crawl_host_degree(sf_dir: str):
        """Observed host-graph degrees from the shared trace run's link
        tally (the pagerank feedback signal exposed as data): per host,
        weighted out-degree and in-degree.  Host-graph-sized; rows-only
        (the tally is engine state, not SQL-reachable)."""
        import pyarrow as pa

        eng = _shared_engine(sf_dir)
        outd: dict[str, int] = {}
        ind: dict[str, int] = {}
        for (s, t), c in eng.host_edges.items():
            outd[s] = outd.get(s, 0) + int(c)
            ind[t] = ind.get(t, 0) + int(c)
        hosts = sorted(set(outd) | set(ind))
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "out_links": pa.array([outd.get(h, 0) for h in hosts], pa.int64()),
                "in_links": pa.array([ind.get(h, 0) for h in hosts], pa.int64()),
            }
        )

    def crawl_scan(sf_dir: str):
        """No-stat fast-scan mode (FastCrawler analog): enumerate-only —
        now SQL-CHECKED: the scan streams its trace to a FIXED spool and
        the oracle reads the same parts back via DuckDB, certifying the
        engine's trace_table() reconstruction (part merge + seq order)
        against the raw on-disk lineage."""
        import shutil

        import pyarrow as pa

        cfg = _scale(sf_dir)
        out = CRAWL_SCAN_DIR
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(out.rstrip("/") + "_trace", ignore_errors=True)
        shutil.rmtree(out.rstrip("/") + "_deadletter", ignore_errors=True)
        eng = CrawlEngine(
            CrawlConfig(
                web=cfg, n_shards=2, politeness_budget=8, max_rounds=40, fetch_payloads=False, out_dir=out
            )
        )
        eng.run(SynthWeb(cfg).seeds())
        t = eng.trace_table()
        return t.set_column(
            t.schema.get_field_index("seq"), "seq", t.column("seq").cast(pa.int64())
        )

    # crawl_host_report and crawl_rollup consume the WRITTEN output of one
    # identical crawl config — share a single cached written run per
    # (process, sf_dir), like the trace/counters pair above (VERDICT r02
    # next-round #1: halve the driver's check-time cost for this family)
    _written_cache: dict[str, str] = {}

    def _shared_written_run(sf_dir: str) -> str:
        if sf_dir not in _written_cache:
            import shutil

            import dataclasses

            # dup_rate up to 0.5 so mirror pairs EXIST at check scale (the
            # written run is deliberately tiny; at 5% the 64 shared payload
            # identities almost never collide across hosts) — payload
            # identity only, the URL set and trace are untouched
            cfg = dataclasses.replace(_scale(sf_dir), dup_rate=0.5)
            out = CRAWL_ROLLUP_DIR
            shutil.rmtree(out, ignore_errors=True)
            shutil.rmtree(out.rstrip("/") + "_trace", ignore_errors=True)
            shutil.rmtree(out.rstrip("/") + "_deadletter", ignore_errors=True)
            eng = CrawlEngine(CrawlConfig(web=cfg, n_shards=2, politeness_budget=8, max_rounds=40, out_dir=out))
            eng.run(SynthWeb(cfg).seeds())
            _written_cache.clear()  # the fixed dir holds ONE sf at a time
            _written_cache[sf_dir] = out
        return _written_cache[sf_dir]

    def crawl_host_report(sf_dir: str):
        """Per-host rollup over the written run — now SQL-CHECKED like its
        siblings (was rows-only through round 2)."""
        import pyarrow as pa

        from fscrawler_ray.pipelines.crawl_report import host_rollup

        return _collect(
            host_rollup(_shared_written_run(sf_dir)),
            {"host": pa.string(), "files": pa.int64(), "total_bytes": pa.int64(), "max_depth": pa.int64()},
        )

    def crawl_mirrors(sf_dir: str):
        """Mirror-host pairs over the SAME written crawl output as
        crawl_rollup, SQL-CHECKED: the oracle self-joins the distinct
        (host, image_id) pairs of the written parquet.  Collected eagerly
        for the same shared-dir reason as crawl_rollup."""
        from fscrawler_ray.pipelines.crawl_report import mirror_hosts

        import pyarrow as pa

        out = _shared_written_run(sf_dir)
        return _collect(
            mirror_hosts(out), {"host_a": pa.string(), "host_b": pa.string(), "shared": pa.int64()}
        )

    def crawl_exif_report(sf_dir: str):
        """Per-(camera, orientation) shot report parsed from the EXIF-analog
        binary segments embedded in the crawled payloads
        (stages/image_stages.exif_batch over the shared written run),
        SQL-CHECKED: the generator derives EXIF fields from the low 40 bits
        of the payload seed — exactly what image_id's hex preserves — so
        the oracle re-derives (orientation, camera, last capture) from
        image_id while the engine genuinely parses container bytes."""
        import ray as _ray

        import pyarrow as pa

        from ray.data.aggregate import Max, Sum

        from fscrawler_ray.stages.image_stages import exif_batch

        out = _shared_written_run(sf_dir)
        ds = _ray.data.read_parquet(out, columns=["image_id", "bytes"])
        keys = ["exif_camera", "exif_orientation"]

        def partial(b: pa.Table) -> pa.Table:
            # per-block combiner (max + count), so only group-sized partials shuffle
            p = exif_batch(b).select(keys + ["exif_captured_at_us"])
            g = pa.TableGroupBy(p, keys).aggregate([("exif_captured_at_us", "max"), ([], "count_all")])
            return pa.table(
                {
                    "exif_camera": g.column("exif_camera"),
                    "exif_orientation": g.column("exif_orientation"),
                    "mx": g.column("exif_captured_at_us_max"),
                    "cnt": g.column("count_all"),
                }
            )

        agg = ds.map_batches(partial, batch_format="pyarrow").groupby(keys).aggregate(Max("mx"), Sum("cnt"))
        rep = agg.map_batches(
            lambda b: pa.table(
                {
                    "exif_camera": b.column("exif_camera"),
                    "exif_orientation": b.column("exif_orientation"),
                    "shots": b.column("sum(cnt)").cast(pa.int64()),
                    "last_capture_us": b.column("max(mx)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        return _collect(
            rep,
            {
                "exif_camera": pa.string(),
                "exif_orientation": pa.int32(),
                "shots": pa.int64(),
                "last_capture_us": pa.int64(),
            },
        )

    def crawl_iptc_report(sf_dir: str):
        """Per-row IPTC extraction over the shared written run, SQL-CHECKED:
        the engine parses the IIM dataset stream trailing the EXIF block in
        each payload (stages/image_stages.iptc_batch); the oracle re-derives
        (caption, keywords, byline) from image_id's hex — the generator
        contract (sources/synthweb.iptc_fields_for)."""
        import ray as _ray

        from fscrawler_ray.stages.image_stages import iptc_batch

        out = _shared_written_run(sf_dir)
        ds = _ray.data.read_parquet(out, columns=["image_id", "bytes"])

        def f(b):
            import pyarrow as pa

            t = iptc_batch(b)
            return t.select(["image_id", "iptc_caption", "iptc_byline", "iptc_keywords"])

        return ds.map_batches(f, batch_format="pyarrow")

    def crawl_snapshot_diff(sf_dir: str):
        """CDC report over the SAME written crawl output, SQL-CHECKED: the
        'previous' snapshot derives from the current one by deterministic
        SQL-expressible rules (drop seq%3==0 → those read 'added'; bump
        size by 7 at seq%5==0 → 'changed'; add url#gone ghosts at seq%7==0
        → 'removed'), so both engines diff the same two relations."""
        import ray as _ray

        import pyarrow as pa
        import pyarrow.compute as pc

        from fscrawler_ray.pipelines.crawl_report import snapshot_diff

        out = _shared_written_run(sf_dir)
        cur = _ray.data.read_parquet(out, columns=["url", "seq", "size"])

        def mk_prev(b: pa.Table) -> pa.Table:
            seq = b.column("seq")
            keep = b.filter(pc.not_equal(pc.subtract(seq, pc.multiply(pc.divide(seq, 3), 3)), 0))
            kseq = keep.column("seq")
            bump = pc.equal(pc.subtract(kseq, pc.multiply(pc.divide(kseq, 5), 5)), 0)
            size = pc.add(
                keep.column("size").cast(pa.int64()),
                pc.if_else(bump, pa.scalar(7, pa.int64()), pa.scalar(0, pa.int64())),
            )
            ghosts = b.filter(pc.equal(pc.subtract(seq, pc.multiply(pc.divide(seq, 7), 7)), 0))
            return pa.table(
                {
                    "url": pa.concat_arrays(
                        [
                            keep.column("url").combine_chunks().cast(pa.string()),
                            pc.binary_join_element_wise(
                                ghosts.column("url").combine_chunks().cast(pa.string()), "#gone", ""
                            ),
                        ]
                    ),
                    "size": pa.concat_arrays(
                        [size.combine_chunks(), ghosts.column("size").cast(pa.int64()).combine_chunks()]
                    ),
                }
            )

        prev = cur.map_batches(mk_prev, batch_format="pyarrow")
        diff = snapshot_diff(cur.drop_columns(["seq"]), prev, key="url", cmp_col="size")
        return _collect(
            diff,
            {"url": pa.string(), "status": pa.string(), "cur_size": pa.int64(), "prev_size": pa.int64()},
        )

    def crawl_politeness_audit(sf_dir: str):
        """Politeness-compliance audit over the written run, SQL-CHECKED:
        the per-(host, round) landing counts roll up to each host's MAX
        per-round rate — the observable the per-host token bucket bounds
        (test_trap_guard/test_token_bucket assert the bound; this query
        exposes it as data)."""
        import ray as _ray

        import pyarrow as pa

        from fscrawler_ray.pipelines.analytics import grouped_sum

        out = _shared_written_run(sf_dir)
        ds = _ray.data.read_parquet(out, columns=["host", "round"])
        per_round = grouped_sum(ds, ["host", "round"], {}, count_out="n").materialize()
        from ray.data.aggregate import Max

        agg = per_round.groupby("host").aggregate(Max("n"))
        agg = agg.map_batches(
            lambda b: b.rename_columns(["host", "max_per_round"]), batch_format="pyarrow"
        )
        return _collect(agg, {"host": pa.string(), "max_per_round": pa.int64()})

    def crawl_depth_funnel(sf_dir: str):
        """Frontier depth funnel over the written run, SQL-CHECKED: rows
        and bytes landed per crawl depth — the discovery-decay curve that
        tells an operator where max_depth should sit."""
        import ray as _ray

        import pyarrow as pa
        import pyarrow.compute as pc

        from fscrawler_ray.pipelines.analytics import grouped_sum

        out = _shared_written_run(sf_dir)
        ds = _ray.data.read_parquet(out, columns=["depth", "size"])
        ds = ds.map_batches(
            lambda b: pa.table(
                {
                    "depth": b.column("depth").cast(pa.int64()),
                    "size": pc.fill_null(b.column("size").cast(pa.int64()), 0),
                }
            ),
            batch_format="pyarrow",
        )
        agg = grouped_sum(ds, ["depth"], {"size": "total_bytes"}, count_out="files")
        agg = agg.map_batches(lambda b: b.select(["depth", "files", "total_bytes"]), batch_format="pyarrow")
        return _collect(agg, {"depth": pa.int64(), "files": pa.int64(), "total_bytes": pa.int64()})

    def crawl_compact(sf_dir: str):
        """Small-file compaction exercised on the shared written run
        (rows-only: file counts depend on writer parallelism)."""
        import shutil

        import pyarrow as pa

        from fscrawler_ray.pipelines.sinks import compact_results

        out = _shared_written_run(sf_dir)
        dest = "/tmp/fscrawler_compact_check"
        shutil.rmtree(dest, ignore_errors=True)
        stats = compact_results(out, dest, rows_per_file=50_000)
        return pa.table({k: pa.array([int(v)], pa.int64()) for k, v in stats.items()})

    def crawl_compact_audit(sf_dir: str):
        """SQL-CHECKED compaction lineage: the engine's pre-compaction row
        count vs DuckDB counting the compacted files it wrote — a dropped
        or duplicated row in the rewrite breaks the match.  (File counts
        stay in the rows-only crawl_compact: they depend on writer
        parallelism.)"""
        import shutil

        import pyarrow as pa

        from fscrawler_ray.pipelines.sinks import compact_results

        out = _shared_written_run(sf_dir)
        dest = "/tmp/fscrawler_oracle_compact"
        shutil.rmtree(dest, ignore_errors=True)
        stats = compact_results(out, dest, rows_per_file=50_000)
        return pa.table({"rows": pa.array([int(stats["rows"])], pa.int64())})

    def crawl_content_groups(sf_dir: str):
        """The reference's Content grouping (many URLs → one payload
        identity) over the written run, SQL-CHECKED: copies + first URL +
        canonical size per image_id."""
        import pyarrow as pa

        from fscrawler_ray.pipelines.crawl_report import content_groups

        out = _shared_written_run(sf_dir)
        return _collect(
            content_groups(out),
            {"image_id": pa.string(), "copies": pa.int64(), "first_url": pa.string(), "size": pa.int64()},
        )

    def crawl_prefix_rollup(sf_dir: str):
        """Bottom-up URL-hierarchy rollup over the written crawl output,
        SQL-CHECKED: every path PREFIX (depth 3..d) aggregates the bytes
        and file count beneath it — the reference's 'biggest directories'
        report (metrics_observer.py) computed top-down from leaves by
        prefix replication + ONE grouped sum, instead of the reference's
        event-driven per-dir accumulation."""
        import ray as _ray

        import pyarrow as pa
        import pyarrow.compute as pc

        from fscrawler_ray.pipelines.analytics import grouped_sum

        out = _shared_written_run(sf_dir)
        ds = _ray.data.read_parquet(out, columns=["url", "size"])

        def prefixes(b: pa.Table) -> pa.Table:
            url = b.column("url")
            if isinstance(url, pa.ChunkedArray):
                url = url.combine_chunks()
            segs = pc.split_pattern(url, "/")
            nseg = pc.list_value_length(segs).to_numpy(zero_copy_only=False)
            size = pc.fill_null(b.column("size").cast(pa.int64()), 0)
            parts = []
            # prefix depths 3..max ('http:', '', host, ...) — depth 3 is the
            # host root; the leaf itself (full depth) is excluded
            mx = int(nseg.max()) if len(nseg) else 0
            for d in range(3, mx):
                m = nseg > d
                idx = pa.array(np.flatnonzero(m), pa.int64())
                if len(idx) == 0:
                    continue
                sl = pc.list_slice(segs.take(idx), 0, d)
                pref = pc.binary_join(sl, "/")
                parts.append(pa.table({"prefix": pref, "sz": size.take(idx)}))
            if not parts:
                return pa.table({"prefix": pa.array([], pa.string()), "sz": pa.array([], pa.int64())})
            return pa.concat_tables(parts)

        import numpy as np

        agg = grouped_sum(ds.map_batches(prefixes, batch_format="pyarrow"), ["prefix"], {"sz": "total_bytes"}, count_out="files")
        agg = agg.map_batches(lambda b: b.select(["prefix", "files", "total_bytes"]), batch_format="pyarrow")
        return _collect(agg, {"prefix": pa.string(), "files": pa.int64(), "total_bytes": pa.int64()})

    def crawl_rollup(sf_dir: str):
        """Crawl → partitioned parquet → Dataset rollup, SQL-CHECKED: the
        oracle reads the same written parquet via DuckDB read_parquet()
        (VERDICT r02 #7 — a crawl-output query inside the oracle net).
        The output dir is fixed so the oracle_sql() string can name it."""
        import ray as _ray
        from ray.data.aggregate import Count, Sum

        import pyarrow as pa

        out = _shared_written_run(sf_dir)
        ds = _ray.data.read_parquet(out, columns=["host", "fmt", "size"])
        agg = ds.groupby(["host", "fmt"]).aggregate(Count(), Sum("size"))

        def f(b: pa.Table) -> pa.Table:
            return b.rename_columns(["host", "fmt", "n_images", "total_size"])

        # collect now (rollup-sized, a few rows): a lazy dataset would read
        # the fixed shared dir at CONSUMPTION time, after a later
        # _shared_written_run(other_sf) may have rewritten it
        batches = list(agg.map_batches(f, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
        return pa.concat_tables(batches) if batches else pa.table(
            {"host": pa.array([], pa.string()), "fmt": pa.array([], pa.string()),
             "n_images": pa.array([], pa.int64()), "total_size": pa.array([], pa.int64())}
        )

    def _host_edges(sf_dir: str):
        """Materialized (src_host, dst_host) edge Dataset of the crawled
        host graph: expand each traced URL's children through the batched
        Source protocol.  Reuses the cached shared crawl run."""
        import pyarrow as pa

        import ray as _ray

        trace = _shared_run(sf_dir)[0]
        cfg = _scale(sf_dir)
        urls_ds = _ray.data.from_arrow(trace.select(["url"]))

        def edges(b: pa.Table) -> pa.Table:
            web = SynthWeb(cfg)
            urls = b.column("url").to_pylist()
            kids = web.children_batch(urls)
            src = [u.split("://", 1)[1].split("/", 1)[0] for u, k in zip(urls, kids) for _ in k]
            dst = [c.split("://", 1)[1].split("/", 1)[0] for k in kids for c in k]
            if not src:
                return pa.table(
                    {"src_host": pa.array([], pa.string()), "dst_host": pa.array([], pa.string())}
                )
            return pa.table(
                {
                    "src_host": pa.array(src, pa.string()),
                    "dst_host": pa.array(dst, pa.string()),
                }
            )

        # consumed several times (two distinct-host groupbys + pagerank) —
        # materialize so the child expansion runs ONCE
        return urls_ds.map_batches(edges, batch_format="pyarrow").materialize()

    def _url_edges(sf_dir: str):
        """(src, dst) FULL-URL edge Dataset of the crawled link graph —
        the URL-granular sibling of _host_edges for anchor-text
        aggregation.  Reuses the cached shared crawl run."""
        import pyarrow as pa

        import ray as _ray

        trace = _shared_run(sf_dir)[0]
        cfg = _scale(sf_dir)
        urls_ds = _ray.data.from_arrow(trace.select(["url"]))

        def edges(b: pa.Table) -> pa.Table:
            web = SynthWeb(cfg)
            urls = b.column("url").to_pylist()
            kids = web.children_batch(urls)
            src = [u for u, k in zip(urls, kids) for _ in k]
            dst = [c for k in kids for c in k]
            return pa.table(
                {
                    "src": pa.array(src, pa.string()),
                    "dst": pa.array(dst, pa.string()),
                }
            )

        return urls_ds.map_batches(edges, batch_format="pyarrow")

    def _pagerank_over_hosts(e, max_iter: int = 60, tol: float = 1e-12):
        """Hash hosts to int64 node ids, run the distributed power
        iteration, map ids back to host names → pa.Table(host, rank)."""
        import numpy as np
        import pyarrow as pa

        from fscrawler_ray.functions.hashing import xxh64_batch
        from fscrawler_ray.pipelines.graph import pagerank

        def to_ids(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": xxh64_batch(b.column("src_host"), seed=1).view(np.int64),
                    "dst": xxh64_batch(b.column("dst_host"), seed=1).view(np.int64),
                }
            )

        # id → host name map: collect only the DISTINCT host names (a
        # host-table-sized grouped count per endpoint column), hash them
        # driver-side — the edge stream itself never reaches the driver
        distinct_hosts: set = set()
        for col in ("src_host", "dst_host"):
            for b in e.groupby(col).count().iter_batches(batch_format="pyarrow"):
                distinct_hosts.update(b.column(col).to_pylist())
        hl = sorted(distinct_hosts)
        ids = xxh64_batch(pa.array(hl, pa.string()), seed=1).view(np.int64)
        names = dict(zip(ids.tolist(), hl))
        r = pagerank(
            e.map_batches(to_ids, batch_format="pyarrow"), max_iter=max_iter, tol=tol
        ).to_pandas()
        r["host"] = [names[i] for i in r["node"]]
        out = r.sort_values("rank", ascending=False).reset_index(drop=True)
        return pa.table(
            {
                "host": pa.array(out["host"]),
                "rank": pa.array(out["rank"], pa.float64()),
            }
        )

    def host_pagerank(sf_dir: str):
        """Link analysis over the crawled host graph (crawl-prioritization
        signal); converges by tol → iteration count is data-dependent, so
        the check is rows-only (host_pagerank_exact is the SQL twin)."""
        return _pagerank_over_hosts(_host_edges(sf_dir))

    def crawl_mirrors_approx(sf_dir: str, p: int = 6):
        """SKETCHED twin of crawl_mirrors: per-host HyperLogLog registers
        over content ids, pairwise intersection by inclusion-exclusion
        |A∩B| ≈ est(A) + est(B) − est(max-merge(A,B)) — the mergeable-
        sketch answer to 'how much content do two hosts share' that costs
        #hosts × 2^p bytes instead of a distinct-pair shuffle.  All-pairs
        output is host-table²-sized (fine: hosts are cluster-scale
        metadata, not corpus rows).  SQL-CHECKED register-for-register at
        p=6 via the md5 HLL template (the approx_distinct oracle pattern),
        with the exact same integer 2^-rank fold and libm log."""
        import math

        import numpy as np
        import pyarrow as pa

        import ray as _ray

        from fscrawler_ray.functions.sketches import (
            _fold_by_key,
            hll_estimate_sql_exact,
            hll_fold_md5,
            hll_merge,
        )

        out = _shared_written_run(sf_dir)
        ds = _ray.data.read_parquet(out, columns=["host", "image_id"])
        acc = _fold_by_key(
            ds, "host", lambda sl: hll_fold_md5(sl.column("image_id"), p=p), hll_merge, np.uint8
        )
        hosts = sorted(acc)
        est = {h: hll_estimate_sql_exact(acc[h], p) for h in hosts}
        ha, hb, inter = [], [], []
        for i, a in enumerate(hosts):
            for b in hosts[i + 1 :]:
                u = hll_estimate_sql_exact(hll_merge(acc[a], acc[b]), p)
                ha.append(a)
                hb.append(b)
                inter.append(int(math.floor(((est[a] + est[b]) - u) * 1000.0 + 0.5)))
        return pa.table(
            {
                "host_a": pa.array(ha, pa.string()),
                "host_b": pa.array(hb, pa.string()),
                "inter_milli": pa.array(inter, pa.int64()),
            }
        )

    def crawl_host_degree_exact(sf_dir: str):
        """SQL-CHECKED weighted host in/out-degrees over the SPOOLED
        derived host-edge table (the same edges host_pagerank_exact
        replays): two grouped sums + an outer merge.  The rows-only
        crawl_host_degree reads the engine's internal link tally instead;
        this twin certifies the same degree arithmetic through DuckDB."""
        import shutil

        import pyarrow as pa

        import ray as _ray
        from ray.data.aggregate import Count

        shutil.rmtree(HOST_EDGES_DIR, ignore_errors=True)
        _host_edges(sf_dir).write_parquet(HOST_EDGES_DIR)
        e = _ray.data.read_parquet(HOST_EDGES_DIR)
        outd: dict[str, int] = {}
        ind: dict[str, int] = {}
        for col, acc in (("src_host", outd), ("dst_host", ind)):
            for b in e.groupby(col).aggregate(Count()).iter_batches(batch_format="pyarrow"):
                for h, c in zip(b.column(col).to_pylist(), b.column("count()").to_pylist()):
                    acc[h] = acc.get(h, 0) + int(c)
        hosts = sorted(set(outd) | set(ind))
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "out_links": pa.array([outd.get(h, 0) for h in hosts], pa.int64()),
                "in_links": pa.array([ind.get(h, 0) for h in hosts], pa.int64()),
            }
        )

    def crawl_tier_plan(sf_dir: str):
        """Recrawl tier scheduler over the shared written run, SQL-CHECKED:
        per-host change rates from K deterministic observation epochs →
        tier bands → integer budget split (crawl_report.tier_plan)."""
        import pyarrow as pa

        from fscrawler_ray.pipelines.crawl_report import tier_plan

        return _collect(
            tier_plan(_shared_written_run(sf_dir)),
            {
                "host": pa.string(),
                "n_urls": pa.int64(),
                "changes": pa.int64(),
                "rate_micro": pa.int64(),
                "tier": pa.string(),
                "budget": pa.int64(),
            },
        )

    def crawl_recrawl_cycle(sf_dir: str):
        """SQL-CHECKED two-cycle tier-crawl freshness loop (VERDICT r04
        #6): cycle-1 crawl → tier_plan → tier_priorities → prioritized
        cycle-2 re-crawl of the same web, certified by ONE integer row —
        coverage is priority-invariant (all three URL counts equal), the
        plan's integer budget split conserves the cap, and the throttle
        map actually fed to cycle 2 equals the plan's count(budget < max).
        Reference semantics analog: the refetch-vs-skip freshness decision
        of crawling_queue_consumer.py:110-115, composed fleet-wide."""
        import shutil

        from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
        from fscrawler_ray.pipelines.crawl_report import (
            TIER_BUDGET,
            recrawl_cycle_cert,
            tier_plan,
            tier_priorities,
        )

        cfg = _scale(sf_dir)
        seeds = SynthWeb(cfg).seeds()
        for out in (RECRAWL_C1_DIR, RECRAWL_C2_DIR):
            shutil.rmtree(out, ignore_errors=True)
            shutil.rmtree(out + "_trace", ignore_errors=True)
            shutil.rmtree(out + "_deadletter", ignore_errors=True)
        e1 = CrawlEngine(
            CrawlConfig(web=cfg, n_shards=4, politeness_budget=4, max_rounds=40, out_dir=RECRAWL_C1_DIR)
        )
        e1.run(seeds)
        e1.shutdown()
        plan = tier_plan(RECRAWL_C1_DIR, budget=TIER_BUDGET).materialize()
        prios = tier_priorities(plan)
        # throttled hosts refill as slow as max(1, int(4*0.25)) = 1
        # URL/round, so the re-crawl needs ~per-host-URL-count rounds
        e2 = CrawlEngine(
            CrawlConfig(
                web=cfg,
                n_shards=4,
                politeness_budget=4,
                max_rounds=256,
                out_dir=RECRAWL_C2_DIR,
                host_priorities=prios,
            )
        )
        e2.run(seeds)
        e2.shutdown()
        return recrawl_cycle_cert(
            RECRAWL_C1_DIR + "_trace", RECRAWL_C2_DIR + "_trace", plan, prios, TIER_BUDGET
        )

    def crawl_host_quality(sf_dir: str):
        """Per-host image-quality ladder pass rates over the shared written
        run, SQL-CHECKED (integer metadata predicates only)."""
        import pyarrow as pa

        from fscrawler_ray.pipelines.crawl_report import host_quality

        return _collect(
            host_quality(_shared_written_run(sf_dir)),
            {
                "host": pa.string(),
                "n_images": pa.int64(),
                "n_pass": pa.int64(),
                "pass_rate_micro": pa.int64(),
            },
        )

    def crawl_url_filter(sf_dir: str):
        """FineWeb-style per-URL filter verdicts over the shared written
        run, SQL-CHECKED (integer structural predicates + broadcast host
        blocklist + banned-token list)."""
        import pyarrow as pa

        from fscrawler_ray.pipelines.crawl_report import url_filter

        return _collect(
            url_filter(_shared_written_run(sf_dir)),
            {
                "url": pa.string(),
                "r_len": pa.int64(),
                "r_digits": pa.int64(),
                "r_depth": pa.int64(),
                "r_host": pa.int64(),
                "r_token": pa.int64(),
                "url_pass": pa.int64(),
            },
        )

    def crawl_robots_eval(sf_dir: str):
        """RFC 9309 robots re-audit over the shared written run,
        SQL-CHECKED: the engine's vectorized longest-match allow/deny
        evaluator (wildcards + $ anchor, crawl/robots.rfc_eval_paths) vs
        DuckDB independently translating each pattern to RE2 and replaying
        precedence with a join + grouped MAX.  The ruleset table is spooled
        to parquet so the oracle consumes the same input data, but the
        matching, translation and precedence logic are computed twice."""
        import shutil

        import pyarrow as pa

        from fscrawler_ray.pipelines.crawl_report import robots_eval, robots_ruleset

        out = _shared_written_run(sf_dir)
        shutil.rmtree(ROBOTS_RULES_DIR, ignore_errors=True)
        robots_ruleset(out).write_parquet(ROBOTS_RULES_DIR)
        return _collect(
            robots_eval(out),
            {
                "url": pa.string(),
                "host": pa.string(),
                "allow_len": pa.int64(),
                "deny_len": pa.int64(),
                "allowed": pa.int64(),
            },
        )

    def crawl_robots_audit(sf_dir: str):
        """Per-host robots re-audit rollup (denied-on-recrawl counts +
        allow-override wins), SQL-CHECKED against the same double-computed
        RFC evaluation as crawl_robots_eval."""
        import shutil

        import pyarrow as pa

        from fscrawler_ray.pipelines.crawl_report import robots_audit, robots_ruleset

        out = _shared_written_run(sf_dir)
        shutil.rmtree(ROBOTS_RULES_DIR, ignore_errors=True)
        robots_ruleset(out).write_parquet(ROBOTS_RULES_DIR)
        return _collect(
            robots_audit(out),
            {
                "host": pa.string(),
                "n_denied": pa.int64(),
                "n_override": pa.int64(),
                "n_urls": pa.int64(),
            },
        )

    def crawl_tier_plan_robots(sf_dir: str):
        """SQL-CHECKED robots-aware recrawl tiering: the freshness tier
        plan composed with the RFC robots re-audit — hosts whose ruleset
        now denies ≥7.5% of their emitted URLs (trace-audited, so the
        wildcard denies over dead-lettered leaves count) are demoted to the
        tier before the budget split (crawl slots stop flowing to hosts
        that mostly refuse them).  The oracle replays freshness banding,
        robots evaluation, the demotion AND the integer quota arithmetic
        end-to-end in one statement."""
        import shutil

        import pyarrow as pa

        from fscrawler_ray.pipelines.crawl_report import robots_ruleset, tier_plan_robots

        out = _shared_written_run(sf_dir)
        shutil.rmtree(ROBOTS_RULES_DIR, ignore_errors=True)
        # ruleset over the TRACE's host set (superset of output hosts) —
        # the audit side of the composition runs over the trace
        robots_ruleset(out.rstrip("/") + "_trace").write_parquet(ROBOTS_RULES_DIR)
        return _collect(
            tier_plan_robots(out),
            {
                "host": pa.string(),
                "n_urls": pa.int64(),
                "changes": pa.int64(),
                "rate_micro": pa.int64(),
                "denied_permille": pa.int64(),
                "tier": pa.string(),
                "budget": pa.int64(),
            },
        )

    def crawl_fairness_gini(sf_dir: str):
        """SQL-CHECKED crawl-budget fairness: exact-integer Gini of
        crawled-URL counts across hosts via the two-level distributed
        rank (no host-sized driver state); oracle replays the ranked
        cumulative formula with one ROW_NUMBER window."""
        import pyarrow as pa

        from fscrawler_ray.pipelines.crawl_report import fairness_gini

        out = _shared_written_run(sf_dir)
        return fairness_gini(out)

    def crawl_lorenz_deciles(sf_dir: str):
        """SQL-CHECKED Lorenz-decile concentration: hosts ranked ascending
        by (n_urls, host), cut into rank deciles, per-decile URL share in
        integer micros — the governor's 'top 10% of hosts hold X%'
        headline."""
        from fscrawler_ray.pipelines.crawl_report import lorenz_deciles

        out = _shared_written_run(sf_dir)
        return lorenz_deciles(out)

    def crawl_deadletters(sf_dir: str):
        """SQL-CHECKED dead-letter ledger audit: the engine's per-row
        fetch-failure records (written as a sibling table of the output,
        the reference's errored-path log analog) vs DuckDB deriving the
        expected failure set INDEPENDENTLY from the trace — a leaf is
        dead-lettered iff its URL extension is not an image format, so a
        dropped record, a duplicated record, or a mis-attributed reason
        all break the hash."""
        import pyarrow as pa

        from fscrawler_ray.pipelines.crawl_report import read_dead_letters

        out = _shared_written_run(sf_dir)

        def slim(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "url": b.column("url"),
                    "seq": b.column("seq").cast(pa.int64()),
                    "reason": b.column("reason"),
                }
            )

        return _collect(
            read_dead_letters(out).map_batches(slim, batch_format="pyarrow"),
            {"url": pa.string(), "seq": pa.int64(), "reason": pa.string()},
        )

    def crawl_split_leakage(sf_dir: str):
        """SQL-CHECKED host-GROUPED split + mirror leakage: assigning
        whole hosts to train/val prevents all intra-host leakage by
        construction, so the only remaining channel is cross-host content
        mirrors — exactly the pairs this query surfaces (mirror pairs
        whose two hosts straddle the split, with shared-content counts)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from fscrawler_ray.pipelines.crawl_report import mirror_hosts
        from fscrawler_ray.pipelines.sampling import split_of_ids

        out = _shared_written_run(sf_dir)
        pairs = _collect(
            mirror_hosts(out),
            {"host_a": pa.string(), "host_b": pa.string(), "shared": pa.int64()},
        )
        t = pa.table(
            {
                "host_a": pairs.column("host_a"),
                "host_b": pairs.column("host_b"),
                "split_a": split_of_ids(pairs.column("host_a")),
                "split_b": split_of_ids(pairs.column("host_b")),
                "shared": pairs.column("shared"),
            }
        )
        return t.filter(pc.invert(pc.equal(t.column("split_a"), t.column("split_b"))))

    def crawl_host_bfs(sf_dir: str):
        """SQL-CHECKED single-source BFS layers over the spooled host
        graph: the engine's iterative broadcast-frontier expansion vs
        DuckDB's recursive-CTE minimum-distance replay — the crawler's
        own frontier primitive inside the oracle net."""
        import shutil

        import pyarrow as pa
        import ray as _ray

        from fscrawler_ray.pipelines.graph import bfs_layers

        shutil.rmtree(HOST_EDGES_DIR, ignore_errors=True)
        _host_edges(sf_dir).write_parquet(HOST_EDGES_DIR)
        e = _ray.data.read_parquet(HOST_EDGES_DIR)
        t = bfs_layers(e, src_col="src_host", dst_col="dst_host")
        return t.rename_columns(["host", "dist"])

    def crawl_host_overlap(sf_dir: str):
        """SQL-CHECKED exact host content-overlap (Jaccard) matrix over
        the shared written run — the exact twin of crawl_mirrors_approx's
        HLL inclusion-exclusion estimate."""
        from fscrawler_ray.pipelines.crawl_report import host_overlap_exact

        return host_overlap_exact(_shared_written_run(sf_dir))

    def crawl_exif_normalized(sf_dir: str):
        """SQL-CHECKED EXIF-orientation-aware dimension normalization (the
        ingest step every image pipeline runs before training): the REAL
        byte parser reads orientation from each payload's EXIF segment;
        orientations 5-8 are transposed encodings, so display dims swap.
        The oracle re-derives orientation from the generator contract and
        the swap from the metadata columns."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray as _ray

        from fscrawler_ray.stages.image_stages import exif_batch

        out = _shared_written_run(sf_dir)
        ds = _ray.data.read_parquet(out, columns=["image_id", "bytes", "w", "h"])

        def f(b):
            e = exif_batch(b)
            o = e.column("exif_orientation").cast(pa.int64())
            w = b.column("w").cast(pa.int64())
            h = b.column("h").cast(pa.int64())
            swap = pc.greater_equal(o, 5)
            return pa.table(
                {
                    "image_id": b.column("image_id"),
                    "exif_orientation": o,
                    "norm_w": pc.if_else(swap, h, w),
                    "norm_h": pc.if_else(swap, w, h),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow")

    def crawl_round_profile(sf_dir: str):
        """SQL-CHECKED per-round crawl throughput profile over the written
        run: URLs landed, payload bytes, distinct hosts touched per round
        — the wave-shape diagnostic behind politeness-budget tuning."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray as _ray
        from ray.data.aggregate import Sum

        out = _shared_written_run(sf_dir)
        ds = _ray.data.read_parquet(out, columns=["round", "host", "size"])

        def partial(b):
            g = pa.TableGroupBy(
                pa.table(
                    {
                        "round": b.column("round").cast(pa.int64()),
                        "host": b.column("host"),
                        "n_urls": pa.array([1] * b.num_rows, pa.int64()),
                        "bytes": pc.fill_null(b.column("size").cast(pa.int64()), 0),
                    }
                ),
                ["round", "host"],
            ).aggregate([("n_urls", "sum"), ("bytes", "sum")])
            return g.rename_columns(["round", "host", "n_urls", "bytes"])

        per_host = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["round", "host"])
            .aggregate(Sum("n_urls"), Sum("bytes"))
        )

        def fin(b):
            g = pa.TableGroupBy(
                pa.table(
                    {
                        "round": b.column("round"),
                        "n_urls": b.column("sum(n_urls)").cast(pa.int64()),
                        "bytes": b.column("sum(bytes)").cast(pa.int64()),
                        "hosts": pa.array([1] * b.num_rows, pa.int64()),
                    }
                ),
                ["round"],
            ).aggregate([("n_urls", "sum"), ("bytes", "sum"), ("hosts", "sum")])
            return g.rename_columns(["round", "n_urls", "total_bytes", "n_hosts"])

        # per_host is (rounds × hosts)-bounded; the final rollup's groups
        # land whole in one block after the keyed aggregate
        agg = per_host.map_batches(fin, batch_format="pyarrow").groupby("round").aggregate(
            Sum("n_urls"), Sum("total_bytes"), Sum("n_hosts")
        )
        agg = agg.map_batches(
            lambda b: b.rename_columns(["round", "n_urls", "total_bytes", "n_hosts"]),
            batch_format="pyarrow",
        )
        return _collect(
            agg,
            {"round": pa.int64(), "n_urls": pa.int64(), "total_bytes": pa.int64(), "n_hosts": pa.int64()},
        )

    def crawl_host_url_quality(sf_dir: str):
        """SQL-CHECKED per-host URL-rule pass rates — the url_filter
        verdicts rolled up per host (the companion feedback signal to
        crawl_host_quality's image ladder for tier budgets)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray as _ray
        from ray.data.aggregate import Sum

        from fscrawler_ray.pipelines.crawl_report import url_flag_batch

        ds = _ray.data.read_parquet(_shared_written_run(sf_dir), columns=["url", "host"])

        def partial(b):
            up = url_flag_batch(b.column("url"), b.column("host")).column("url_pass")
            g = pa.TableGroupBy(
                pa.table(
                    {
                        "host": b.column("host"),
                        "n_urls": pa.array([1] * b.num_rows, pa.int64()),
                        "n_pass": up,
                    }
                ),
                ["host"],
            ).aggregate([("n_urls", "sum"), ("n_pass", "sum")])
            return g.rename_columns(["host", "n_urls", "n_pass"])

        out = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("host")
            .aggregate(Sum("n_urls"), Sum("n_pass"))
        )
        return out.map_batches(
            lambda b: pa.table(
                {
                    "host": b.column("host"),
                    "n_urls": b.column("sum(n_urls)").cast(pa.int64()),
                    "n_pass": b.column("sum(n_pass)").cast(pa.int64()),
                    "pass_rate_micro": pc.divide(
                        pc.multiply(b.column("sum(n_pass)").cast(pa.int64()), 1_000_000),
                        b.column("sum(n_urls)").cast(pa.int64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        )

    def crawl_curation_funnel(sf_dir: str):
        """Composed LAION-style curation funnel over the shared written
        run, SQL-CHECKED end-to-end: URL rules → quality ladder →
        keep-best phash dedup → byte-budget shard count."""
        import pyarrow as pa

        from fscrawler_ray.pipelines.image_corpus import curation_funnel

        return curation_funnel(_shared_written_run(sf_dir))

    def crawl_adaptive_budget(sf_dir: str):
        """SQL-CHECKED cost-adaptive politeness budgets over the written
        run: per-host exact p87.5 payload size (dyadic quantile — float-
        exact in both engines) → clamped integer budget."""
        from fscrawler_ray.pipelines.crawl_report import adaptive_budget

        return adaptive_budget(_shared_written_run(sf_dir))

    def crawl_growth_trend(sf_dir: str):
        """SQL-CHECKED Theil-Sen (median-of-pairwise-slopes) robust
        trend of per-round crawl volume — the outlier-proof 'is the
        frontier still growing' signal (one stalled round can't bend
        it, unlike least squares).  Slopes are offset by K=10^7 per
        round so the integer division is positive on both sides (DuckDB
        // truncates, Python floors — identical on nonnegatives);
        round table is rounds-bounded driver metadata."""
        import math

        import pyarrow as pa

        import ray as _ray

        out = _shared_written_run(sf_dir)
        ds = _ray.data.read_parquet(out, columns=["round"])
        counts = ds.groupby("round").count().to_pandas().sort_values("round")
        rd = counts["round"].astype(int).to_numpy()
        n = counts["count()"].astype(int).to_numpy()
        K = 10_000_000
        slopes = sorted(
            (int(n[j]) - int(n[i]) + K * (int(rd[j]) - int(rd[i])))
            * 1_000_000
            // (int(rd[j]) - int(rd[i]))
            for i in range(len(rd))
            for j in range(i + 1, len(rd))
        )
        med = slopes[math.ceil(len(slopes) * 0.5) - 1] - K * 1_000_000 if slopes else 0
        return pa.table(
            {
                "n_rounds": pa.array([len(rd)], pa.int64()),
                "n_pairs": pa.array([len(slopes)], pa.int64()),
                "slope_micro": pa.array([med], pa.int64()),
            }
        )

    def crawl_frontier_funnel(sf_dir: str):
        """SQL-CHECKED composed frontier hygiene funnel: robots (RFC
        9309) -> FineWeb URL filter -> spam-feature gate, stage survivor
        counts from ONE streaming pass; each gate's kernel is the
        certified component and the oracle nests their CTEs."""
        from fscrawler_ray.pipelines.crawl_report import frontier_funnel

        return frontier_funnel(_shared_written_run(sf_dir))

    def crawl_url_features(sf_dir: str):
        """SQL-CHECKED per-URL spam/quality features (the FineWeb URL
        rule's measurable core): path char length, depth (segment
        count), digit chars, query-param count, longest path segment —
        all integer, one RE2 streaming pass — plus the composite
        spam flag (depth > 6 or digits > 12 or longest segment > 40)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        import ray as _ray

        out = _shared_written_run(sf_dir)
        ds = _ray.data.read_parquet(out.rstrip("/") + "_trace", columns=["seq", "url"])

        def kern(b: pa.Table) -> pa.Table:
            import numpy as np

            u = b.column("url")
            if isinstance(u, pa.ChunkedArray):
                u = u.combine_chunks()
            parts = pc.extract_regex(u, r"^[a-z]+://[^/?#]*(?P<p>[^?#]*)(?P<q>\??[^#]*)")
            path = pc.struct_field(parts, "p")
            q = pc.struct_field(parts, "q")
            plen = pc.utf8_length(path).cast(pa.int64())
            depth = pc.count_substring(path, "/").cast(pa.int64())
            digits = pc.count_substring_regex(path, "[0-9]").cast(pa.int64())
            nparams = pc.if_else(
                pc.equal(q, ""),
                pa.scalar(0, pa.int64()),
                pc.add(pc.count_substring(q, "&").cast(pa.int64()), pa.scalar(1, pa.int64())),
            )
            segs = pc.split_pattern(path, "/")
            flat = pc.list_flatten(segs)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            lens = pc.fill_null(pc.list_value_length(segs), 0).to_numpy(zero_copy_only=False)
            sl = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
            row = np.repeat(np.arange(b.num_rows), lens)
            longest = np.zeros(b.num_rows, dtype=np.int64)
            np.maximum.at(longest, row, sl)
            dn = depth.to_numpy(zero_copy_only=False)
            dg = digits.to_numpy(zero_copy_only=False)
            spam = ((dn > 6) | (dg > 12) | (longest > 40)).astype(np.int64)
            return pa.table(
                {
                    "seq": b.column("seq").cast(pa.int64()),
                    "path_len": plen,
                    "depth": depth,
                    "digit_chars": digits,
                    "n_params": nparams,
                    "longest_segment": pa.array(longest),
                    "spam_flag": pa.array(spam),
                }
            )

        return ds.map_batches(kern, batch_format="pyarrow")

    def crawl_size_integrity(sf_dir: str):
        """SQL-CHECKED declared-vs-fetched size integrity audit: per
        host, payload rows whose discovery-time ``size`` disagrees with
        the actual fetched byte count (the stale-metadata signal that
        drives recrawl tiering and bandwidth planning).  One streaming
        pass, host-bounded grouped sums."""
        import pyarrow as pa
        import pyarrow.compute as pc

        import ray as _ray

        out = _shared_written_run(sf_dir)
        ds = _ray.data.read_parquet(out, columns=["host", "size", "bytes"])

        def kern(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_valid(b.column("bytes")))
            actual = pc.binary_length(b.column("bytes")).cast(pa.int64())
            declared = b.column("size").cast(pa.int64())
            return pa.table(
                {
                    "host": b.column("host"),
                    "one": pa.array([1] * b.num_rows, pa.int64()),
                    "mm": pc.cast(pc.not_equal(declared, actual), pa.int64()),
                    "declared": declared,
                    "actual": actual,
                }
            )

        from fscrawler_ray.pipelines.analytics import grouped_sum

        return grouped_sum(
            ds.map_batches(kern, batch_format="pyarrow"),
            ["host"],
            {"one": "n_payloads", "mm": "n_mismatch", "declared": "bytes_declared", "actual": "bytes_actual"},
        )

    def crawl_bloom_audit(sf_dir: str):
        """SQL-CHECKED Bloom false-positive audit: the md5-twin bloom
        over the crawl trace (k=4 chunk hashes mod 2^21), probed with
        guaranteed non-members — DuckDB replays bit set, membership and
        FP tally exactly (the HLL/CMS pattern for the seen-set's bloom
        tier; state/bloom.py's xxh64 filter is the scale path)."""
        from fscrawler_ray.pipelines.crawl_report import bloom_fpr_audit

        out = _shared_written_run(sf_dir)
        return bloom_fpr_audit(out.rstrip("/") + "_trace")

    def crawl_host_scorecard(sf_dir: str):
        """SQL-CHECKED composed per-host scorecard: quality pass rate ×
        adaptive budget ÷ cap as the integer recrawl priority, joined
        with the politeness audit — three certified reports composed
        end-to-end (the funnel-certification pattern on the host
        axis)."""
        from fscrawler_ray.pipelines.crawl_report import host_scorecard

        return host_scorecard(_shared_written_run(sf_dir))

    def crawl_rendezvous(sf_dir: str):
        """SQL-CHECKED rendezvous (HRW) frontier shard assignment per
        host at 8 shards plus the 10-shard grow audit (moved flag) — the
        elastic version of the SeenService's key sharding: adding
        workers relocates only an expected 2/10 of hosts, no global
        re-shuffle.  Weights are the md5 twin so DuckDB replays the
        argmax bit-for-bit."""
        from fscrawler_ray.pipelines.crawl_report import rendezvous_shards

        return rendezvous_shards(_shared_written_run(sf_dir))

    def crawl_url_templates(sf_dir: str):
        """SQL-CHECKED per-host URL template mining: digit runs in the
        URL path collapse to N and URLs are counted per (host, template)
        with depth sum/sq-sum moments — the crawler-trap / URL-space
        diagnostic (discovers the patterns the reference's PatternFilter
        takes as config).  One streaming RE2 pass into a template-bounded
        grouped sum."""
        from fscrawler_ray.pipelines.crawl_report import url_templates

        return url_templates(_shared_written_run(sf_dir))

    def crawl_sitemap_export(sf_dir: str):
        """SQL-CHECKED sitemaps.org XML export: every crawled URL lands
        in a per-host urlset file (file index = per-host seq-order rank
        // max_urls via the keyed two-level scan — the protocol's 50k-URL
        cap semantics at check scale), and the summary reports the REAL
        on-disk XML sizes, which the oracle predicts purely from
        escaped-URL length arithmetic + ROW_NUMBER file assignment."""
        import shutil

        import pyarrow as pa

        from fscrawler_ray.pipelines.sinks import write_sitemaps

        out = _shared_written_run(sf_dir)
        shutil.rmtree(SITEMAP_DIR, ignore_errors=True)
        summary = write_sitemaps(out, SITEMAP_DIR).map_batches(
            lambda b: b.select(["host", "file_idx", "n_urls", "xml_bytes"]),
            batch_format="pyarrow",
        )
        return _collect(
            summary,
            {
                "host": pa.string(),
                "file_idx": pa.int64(),
                "n_urls": pa.int64(),
                "xml_bytes": pa.int64(),
            },
        )

    def crawl_sitemap_roundtrip(sf_dir: str):
        """SQL-CHECKED sitemap loader: the XML files written by
        crawl_sitemap_export are parsed back (<loc> entries, escapes
        reversed, one task per file) and every (host, file_idx, url) row
        is certified against the oracle's independent re-derivation of
        the per-host rank assignment from the crawl spool."""
        import os

        from fscrawler_ray.pipelines.sinks import read_sitemaps, write_sitemaps

        out = _shared_written_run(sf_dir)
        if not os.path.isdir(SITEMAP_DIR) or not os.listdir(SITEMAP_DIR):
            for _ in write_sitemaps(out, SITEMAP_DIR).iter_batches(batch_format="pyarrow"):
                pass
        return read_sitemaps(SITEMAP_DIR)

    def crawl_sitemap_incremental(sf_dir: str):
        """SQL-CHECKED incremental sitemap maintenance: after the
        deterministic delete spec (seq % 23 == 0), only affected hosts'
        urlset files re-cut (`.done` markers skip the rest; stale tails
        pruned) — and the resulting on-disk state equals the
        from-scratch export over the edited rows, which is exactly what
        the oracle recomputes (sizes included), plus the rewritten
        flag."""
        import shutil

        from fscrawler_ray.pipelines.sinks import sitemap_incremental

        out = _shared_written_run(sf_dir)
        shutil.rmtree(SITEMAP_INCR_DIR, ignore_errors=True)
        return sitemap_incremental(out, SITEMAP_INCR_DIR)

    def crawl_cdx_index(sf_dir: str):
        """SQL-CHECKED CDX-style archive index: every crawled URL maps to
        (shard, byte offset, record length) in the WARC export, computed
        WITHOUT touching archive bytes — offsets fall out of the same
        two-level distributed prefix scan the writer uses, so a record is
        retrievable with one ranged read.  The oracle replays the entire
        layout arithmetic (record size → running prefix → shard floor →
        within-shard offset) in DuckDB window functions; the pytest
        additionally seeks into the real archive at (shard, off) and
        parses the record back byte-exact."""
        from fscrawler_ray.pipelines.sinks import cdx_index

        return cdx_index(_shared_written_run(sf_dir))

    def crawl_cdx_fetch(sf_dir: str):
        """SQL-CHECKED CDX point-lookup certification: a deterministic
        seq sample fetched via ONE ranged read each at the CDX
        (shard, off, rlen) into the real archives, parsed, and matched
        against the spool-derived oracle rows (payload md5 + URL) — the
        whole index→archive chain certified by content."""
        import os

        from fscrawler_ray.pipelines.sinks import cdx_fetch, write_warc_shards

        out = _shared_written_run(sf_dir)
        if not os.path.isdir(WARC_DIR) or not os.listdir(WARC_DIR):
            for _ in write_warc_shards(out, WARC_DIR).iter_batches(batch_format="pyarrow"):
                pass
        return cdx_fetch(out, WARC_DIR)

    def crawl_url_canonical(sf_dir: str):
        """SQL-CHECKED URL canonicalization (the seen-set key kernel):
        every trace URL is deterministically dirtied (seq-keyed variant:
        upper-case scheme+host, :80 port, fragment, duplicate slashes,
        /./ and /x/../ dot segments, preserved query string) and
        canonicalized by functions.urls.canonicalize; the oracle rebuilds
        the same dirty string and replays the full pipeline in DuckDB."""
        from fscrawler_ray.pipelines.crawl_report import url_canonical_map

        out = _shared_written_run(sf_dir)
        return url_canonical_map(out.rstrip("/") + "_trace")

    def crawl_warc_revisit(sf_dir: str):
        """SQL-CHECKED WARC export with REVISIT records (ISO 28500
        identical-payload-digest profile): later fetches of an
        already-archived payload write body-less records pointing at
        the original — the dedup-in-archive mechanism real crawls use.
        The oracle predicts the REAL on-disk archive sizes from DUAL
        header arithmetic (response vs revisit) over the same window-min
        + prefix-scan layout."""
        import shutil

        import pyarrow as pa

        from fscrawler_ray.pipelines.sinks import write_warc_revisit_shards

        out = _shared_written_run(sf_dir)
        shutil.rmtree(WARCR_DIR, ignore_errors=True)
        summary = write_warc_revisit_shards(out, WARCR_DIR).map_batches(
            lambda b: b.select(
                ["shard", "n_records", "n_revisits", "payload_bytes", "warc_bytes"]
            ),
            batch_format="pyarrow",
        )
        return _collect(
            summary,
            {
                "shard": pa.int64(),
                "n_records": pa.int64(),
                "n_revisits": pa.int64(),
                "payload_bytes": pa.int64(),
                "warc_bytes": pa.int64(),
            },
        )

    def crawl_warc_export(sf_dir: str):
        """SQL-CHECKED WARC/1.0 export (ISO 28500) of the written crawl:
        payload rows pack seq-ordered into cap-byte archives via the same
        two-level distributed prefix scan as the tar export, and the
        summary reports the REAL on-disk archive sizes — which the oracle
        predicts purely from header-length arithmetic over the same
        prefix-sum shard assignment (a one-byte writer drift breaks the
        hash).  Reference analog: persisting crawl results for replay
        (app/index_files.py); web-scale crawlers ship WARC."""
        import shutil

        import pyarrow as pa

        from fscrawler_ray.pipelines.sinks import write_warc_shards

        out = _shared_written_run(sf_dir)
        shutil.rmtree(WARC_DIR, ignore_errors=True)
        summary = write_warc_shards(out, WARC_DIR).map_batches(
            lambda b: b.select(["shard", "n_records", "payload_bytes", "warc_bytes"]),
            batch_format="pyarrow",
        )
        return _collect(
            summary,
            {
                "shard": pa.int64(),
                "n_records": pa.int64(),
                "payload_bytes": pa.int64(),
                "warc_bytes": pa.int64(),
            },
        )

    def crawl_warc_roundtrip(sf_dir: str):
        """SQL-CHECKED WARC loader roundtrip: the archives written by
        crawl_warc_export are parsed back record-by-record (one task per
        archive) and every payload + URL is certified byte-exact against
        the written crawl spool (md5-of-hex, which DuckDB recomputes from
        the spooled bytes)."""
        import hashlib
        import os

        import pyarrow as pa

        from fscrawler_ray.pipelines.sinks import read_warc_shards, write_warc_shards

        out = _shared_written_run(sf_dir)
        if not os.path.isdir(WARC_DIR) or not os.listdir(WARC_DIR):
            for _ in write_warc_shards(out, WARC_DIR).iter_batches(batch_format="pyarrow"):
                pass

        def cert(b: pa.Table) -> pa.Table:
            payloads = b.column("bytes").to_pylist()
            return pa.table(
                {
                    "seq": b.column("seq"),
                    "url": b.column("url"),
                    "nbytes": pa.array([len(p) for p in payloads], pa.int64()),
                    "payload_md5": pa.array(
                        [hashlib.md5(p.hex().upper().encode()).hexdigest() for p in payloads],
                        pa.string(),
                    ),
                }
            )

        return _collect(
            read_warc_shards(WARC_DIR).map_batches(cert, batch_format="pyarrow"),
            {
                "seq": pa.int64(),
                "url": pa.string(),
                "nbytes": pa.int64(),
                "payload_md5": pa.string(),
            },
        )

    def host_hits(sf_dir: str):
        """SQL-CHECKED HITS hubs/authorities (Kleinberg 1999) over the
        spooled host-edge table: HITS_EXACT_ITERS integer mutual-
        reinforcement rounds with trunc-div max normalization — every
        half-step exact int64, replayed by DuckDB in HUGEINT from the
        same spooled edges (no floats, no rtol)."""
        import shutil

        import pyarrow as pa

        import ray as _ray

        from fscrawler_ray.pipelines.graph import hits

        shutil.rmtree(HOST_HITS_EDGES_DIR, ignore_errors=True)
        _host_edges(sf_dir).write_parquet(HOST_HITS_EDGES_DIR)
        e = _ray.data.read_parquet(HOST_HITS_EDGES_DIR)
        t = hits(e, src_col="src_host", dst_col="dst_host", iters=HITS_EXACT_ITERS)
        return pa.table(
            {"host": t.column("node"), "hub": t.column("hub"), "authority": t.column("authority")}
        )

    def host_reciprocity(sf_dir: str):
        """SQL-CHECKED directed-graph reciprocity of the crawled host
        graph (mutual-link fraction, self-loops tallied separately):
        distinct composite-key edges + a flipped-key self-join through
        the size-aware front door; oracle replays with one DuckDB
        self-join over the same spooled edges."""
        import shutil

        import ray as _ray

        from fscrawler_ray.pipelines.graph import reciprocity

        shutil.rmtree(HOST_REC_EDGES_DIR, ignore_errors=True)
        _host_edges(sf_dir).write_parquet(HOST_REC_EDGES_DIR)
        e = _ray.data.read_parquet(HOST_REC_EDGES_DIR)
        return reciprocity(e, src_col="src_host", dst_col="dst_host")

    def host_ppr(sf_dir: str):
        """SQL-CHECKED personalized PageRank (Haveliwala 2002) over the
        spooled host-edge table: restart mass concentrates on the top-4
        out-degree hosts (the trusted-hub seed rule), PPR_EXACT_ITERS
        integer rounds with trunc-div damping — every intermediate an
        exact int64 DuckDB replays in HUGEINT from the same spooled
        edges (no floats, no rtol).  The focused-crawl priority signal
        beside host_hits."""
        import shutil

        import pyarrow as pa

        import ray as _ray

        from fscrawler_ray.pipelines.graph import personalized_pagerank

        shutil.rmtree(HOST_PPR_EDGES_DIR, ignore_errors=True)
        _host_edges(sf_dir).write_parquet(HOST_PPR_EDGES_DIR)
        e = _ray.data.read_parquet(HOST_PPR_EDGES_DIR)
        t = personalized_pagerank(
            e, src_col="src_host", dst_col="dst_host", iters=PPR_EXACT_ITERS
        )
        return pa.table(
            {
                "host": t.column("node"),
                "score": t.column("score"),
                "is_seed": t.column("is_seed"),
            }
        )

    def host_opic(sf_dir: str):
        """SQL-CHECKED OPIC adaptive page importance (Abiteboul et al.
        WWW 2003) over the spooled host-edge table: every node starts
        with ``scale`` cash; each of OPIC_EXACT_ITERS synchronous rounds
        banks the held cash into history and trunc-div-shares it across
        out-links — every intermediate an exact int64 DuckDB replays in
        HUGEINT from the same spooled edges (no floats, no rtol).  The
        importance signal that can drive frontier ordering MID-crawl
        (it converges online), beside the offline host_pagerank_exact /
        host_ppr / host_hits family."""
        import shutil

        import pyarrow as pa

        import ray as _ray

        from fscrawler_ray.pipelines.graph import opic

        shutil.rmtree(HOST_OPIC_EDGES_DIR, ignore_errors=True)
        _host_edges(sf_dir).write_parquet(HOST_OPIC_EDGES_DIR)
        e = _ray.data.read_parquet(HOST_OPIC_EDGES_DIR)
        t = opic(e, src_col="src_host", dst_col="dst_host", iters=OPIC_EXACT_ITERS)
        return pa.table(
            {
                "host": t.column("node"),
                "cash": t.column("cash"),
                "history": t.column("history"),
                "score": t.column("score"),
            }
        )

    def host_communities(sf_dir: str):
        """SQL-CHECKED deterministic label-propagation communities
        (Raghavan et al. 2007, exact variant) over the spooled host
        graph: symmetrized integer edge weights, LP_EXACT_ITERS
        synchronous rounds, (weight DESC, label ASC) argmax — DuckDB
        replays every round with a window-function argmax over the same
        spooled edges.  Finer-grained than connected components: the
        mirror-farm / link-clique signal for the spam gate."""
        import shutil

        import pyarrow as pa

        import ray as _ray

        from fscrawler_ray.pipelines.graph import label_propagation

        shutil.rmtree(HOST_LP_EDGES_DIR, ignore_errors=True)
        _host_edges(sf_dir).write_parquet(HOST_LP_EDGES_DIR)
        e = _ray.data.read_parquet(HOST_LP_EDGES_DIR)
        t = label_propagation(
            e, src_col="src_host", dst_col="dst_host", iters=LP_EXACT_ITERS
        )
        return pa.table({"host": t.column("node"), "label": t.column("label")})

    def host_modularity(sf_dir: str):
        """SQL-CHECKED Newman modularity of the label-propagation host
        partition — the quality certificate for host_communities: every
        intermediate exact integer (Q_micro = 1e6·Σ(4m·e_c − d_c²) //
        4m², one trunc division at the end), replayed by DuckDB over
        the same spooled edges with the LP rounds nested."""
        import shutil

        import ray as _ray

        from fscrawler_ray.pipelines.graph import label_propagation, modularity

        shutil.rmtree(HOST_MOD_EDGES_DIR, ignore_errors=True)
        _host_edges(sf_dir).write_parquet(HOST_MOD_EDGES_DIR)
        e = _ray.data.read_parquet(HOST_MOD_EDGES_DIR)
        lab = label_propagation(
            e, src_col="src_host", dst_col="dst_host", iters=LP_EXACT_ITERS
        )
        return modularity(e, lab, src_col="src_host", dst_col="dst_host")

    def crawl_opic_budget(sf_dir: str):
        """SQL-CHECKED importance-proportional budget apportionment:
        OPIC scores over the spooled host graph → largest-remainder
        (Hamilton) integer split of a global crawl budget, Σ quota ==
        budget EXACTLY.  The composition that makes host_opic drive the
        crawl; DuckDB nests the unrolled OPIC replay and re-ranks the
        remainders with one window function."""
        import shutil

        import ray as _ray

        from fscrawler_ray.pipelines.crawl_report import opic_budget
        from fscrawler_ray.pipelines.graph import opic

        shutil.rmtree(HOST_OPICB_EDGES_DIR, ignore_errors=True)
        _host_edges(sf_dir).write_parquet(HOST_OPICB_EDGES_DIR)
        e = _ray.data.read_parquet(HOST_OPICB_EDGES_DIR)
        t = opic(e, src_col="src_host", dst_col="dst_host", iters=OPIC_EXACT_ITERS)
        import pyarrow as pa

        scores = pa.table({"host": t.column("node"), "score": t.column("score")})
        return opic_budget(scores)

    def crawl_checkpoint_audit(sf_dir: str):
        """SQL-CHECKED checkpoint-manifest consistency audit: run a
        dedicated checkpointed crawl, then certify the manifest's resume
        metadata against the REAL on-disk artifacts — seq_offset ==
        trace rows == max(seq)+1 == checkpoint trace-snapshot rows,
        result_rows == spooled output rows, lineage covers every shard
        at the manifest round.  DuckDB replays the audit from
        manifest.json (read_json_auto) + the same parquet spools; the
        engine computes it with streaming ray.data counts.  The W2
        resume contract proven against lineage, not assumed."""
        import json
        import shutil

        import pyarrow as pa
        import pyarrow.compute as pc

        import ray as _ray

        from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine

        cfg = _scale(sf_dir)
        for d in (CKPT_RUN_DIR, CKPT_RUN_DIR + "_trace", CKPT_DIR):
            shutil.rmtree(d, ignore_errors=True)
        eng = CrawlEngine(
            CrawlConfig(
                web=cfg,
                n_shards=4,
                politeness_budget=4,
                max_rounds=40,
                out_dir=CKPT_RUN_DIR,
                checkpoint_dir=CKPT_DIR,
            )
        )
        eng.run(SynthWeb(cfg).seeds())
        eng.checkpoint()
        eng.shutdown()

        with open(CKPT_DIR + "/manifest.json") as f:
            m = json.load(f)
        trace = _ray.data.read_parquet(CKPT_RUN_DIR + "_trace", columns=["seq"])
        trace_rows = trace.count()
        mx = trace.aggregate(_ray.data.aggregate.Max("seq"))["max(seq)"]
        snap_rows = _ray.data.read_parquet(CKPT_DIR + "/trace", columns=["seq"]).count()
        spool_rows = _ray.data.read_parquet(CKPT_RUN_DIR, columns=["seq"]).count()
        lin_rounds = [r["round"] for r in m["lineage"]]
        enq = sum(r["enqueued"] for r in m["lineage"])
        ok = int(
            m["seq_offset"] == trace_rows == int(mx) + 1 == snap_rows
            and m["result_rows"] == spool_rows
            and len(m["lineage"]) == m["n_shards"]
            and min(lin_rounds) == max(lin_rounds) == m["round"]
        )
        one = lambda v: pa.array([int(v)], pa.int64())  # noqa: E731
        return pa.table(
            {
                "manifest_round": one(m["round"]),
                "lin_min": one(min(lin_rounds)),
                "lin_max": one(max(lin_rounds)),
                "lineage_len": one(len(m["lineage"])),
                "n_shards": one(m["n_shards"]),
                "seq_offset": one(m["seq_offset"]),
                "trace_rows": one(trace_rows),
                "max_seq": one(mx),
                "snap_rows": one(snap_rows),
                "result_rows": one(m["result_rows"]),
                "spool_rows": one(spool_rows),
                "enqueued_total": one(enq),
                "ok": one(ok),
            }
        )

    def crawl_delay_audit(sf_dir: str):
        """SQL-CHECKED Crawl-delay compliance audit: per-host de-facto
        robots Crawl-delay derived from md5(host) (DuckDB replays it
        with md5_number_upper — no spool), capped rate = round_seconds
        // delay, audited against the observed max per-round landing
        rate from the written run."""
        from fscrawler_ray.pipelines.crawl_report import crawl_delay_audit as _cda

        return _cda(_shared_written_run(sf_dir))

    def _spool_cdc_snapshots(sf_dir: str) -> None:
        """Spool the (url, size) current snapshot and its deterministic
        'previous' twin to CDC_CUR_DIR / CDC_PREV_DIR (shared by
        crawl_cdc_replay and crawl_merkle_diff; identical content every
        call, so query order never matters)."""
        import shutil

        import pyarrow as pa
        import pyarrow.compute as pc

        import ray as _ray

        out = _shared_written_run(sf_dir)
        raw = _ray.data.read_parquet(out, columns=["url", "seq", "size"])

        def mk_cur(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "url": b.column("url").combine_chunks().cast(pa.string()),
                    "size": pc.fill_null(b.column("size").cast(pa.int64()), -1),
                }
            )

        def mk_prev(b: pa.Table) -> pa.Table:
            seq = b.column("seq")
            keep = b.filter(
                pc.not_equal(pc.subtract(seq, pc.multiply(pc.divide(seq, 3), 3)), 0)
            )
            kseq = keep.column("seq")
            bump = pc.equal(pc.subtract(kseq, pc.multiply(pc.divide(kseq, 5), 5)), 0)
            size = pc.add(
                pc.fill_null(keep.column("size").cast(pa.int64()), -1),
                pc.if_else(bump, pa.scalar(7, pa.int64()), pa.scalar(0, pa.int64())),
            )
            ghosts = b.filter(pc.equal(pc.subtract(seq, pc.multiply(pc.divide(seq, 7), 7)), 0))
            return pa.table(
                {
                    "url": pa.concat_arrays(
                        [
                            keep.column("url").combine_chunks().cast(pa.string()),
                            pc.binary_join_element_wise(
                                ghosts.column("url").combine_chunks().cast(pa.string()),
                                "#gone",
                                "",
                            ),
                        ]
                    ),
                    "size": pa.concat_arrays(
                        [
                            size.combine_chunks()
                            if isinstance(size, pa.ChunkedArray)
                            else size,
                            pc.fill_null(
                                ghosts.column("size").cast(pa.int64()), -1
                            ).combine_chunks(),
                        ]
                    ),
                }
            )

        shutil.rmtree(CDC_CUR_DIR, ignore_errors=True)
        shutil.rmtree(CDC_PREV_DIR, ignore_errors=True)
        raw.map_batches(mk_cur, batch_format="pyarrow").write_parquet(CDC_CUR_DIR)
        raw.map_batches(mk_prev, batch_format="pyarrow").write_parquet(CDC_PREV_DIR)

    def crawl_cdc_replay(sf_dir: str):
        """SQL-CHECKED CDC op-log round-trip: spool the current snapshot
        and a deterministically-derived previous one (same rules as
        crawl_snapshot_diff, sizes coalesced to -1 so value compare is
        null-free), derive the UPSERT/DELETE op log, apply it to prev,
        and certify the replay equals cur by count AND keyed md5
        checksum.  DuckDB replays the whole round-trip (outer-join diff
        → anti-join apply → md5_number_upper checksum) over the same
        two spooled relations."""
        import ray as _ray

        from fscrawler_ray.pipelines.crawl_report import cdc_replay

        _spool_cdc_snapshots(sf_dir)
        cur = _ray.data.read_parquet(CDC_CUR_DIR)
        prev = _ray.data.read_parquet(CDC_PREV_DIR)
        return cdc_replay(cur, prev)

    def crawl_opic_cycle(sf_dir: str):
        """SQL-CHECKED OPIC-driven two-cycle crawl — the importance loop
        closed end-to-end: cycle-1 crawl → host graph from its trace →
        OPIC scores → Hamilton budget quotas → hosts below fair share
        throttle to 0.25 → prioritized cycle-2 re-crawl.  ONE integer
        row certifies coverage is priority-INVARIANT (all three URL
        counts equal), Σ quota == budget EXACTLY, and the throttle map
        actually fed to cycle 2 equals the quota rule's count.  DuckDB
        replays OPIC + apportionment over the spooled edges and the
        coverage counts over both written traces."""
        import shutil

        import pyarrow as pa

        import ray as _ray

        from fscrawler_ray.crawl.engine import CrawlConfig, CrawlEngine
        from fscrawler_ray.pipelines.crawl_report import OPIC_BUDGET, opic_budget
        from fscrawler_ray.pipelines.graph import opic

        cfg = _scale(sf_dir)
        seeds = SynthWeb(cfg).seeds()
        for out in (OPIC_C1_DIR, OPIC_C2_DIR):
            shutil.rmtree(out, ignore_errors=True)
            shutil.rmtree(out + "_trace", ignore_errors=True)
            shutil.rmtree(out + "_deadletter", ignore_errors=True)
        e1 = CrawlEngine(
            CrawlConfig(web=cfg, n_shards=4, politeness_budget=4, max_rounds=40, out_dir=OPIC_C1_DIR)
        )
        e1.run(seeds)
        e1.shutdown()

        # host graph from cycle-1's trace (batched Source expansion)
        trace1 = _ray.data.read_parquet(OPIC_C1_DIR + "_trace", columns=["url"])

        def edges(b: pa.Table) -> pa.Table:
            web = SynthWeb(cfg)
            urls = b.column("url").to_pylist()
            kids = web.children_batch(urls)
            src = [u.split("://", 1)[1].split("/", 1)[0] for u, k in zip(urls, kids) for _ in k]
            dst = [c.split("://", 1)[1].split("/", 1)[0] for k in kids for c in k]
            return pa.table(
                {
                    "src_host": pa.array(src, pa.string()),
                    "dst_host": pa.array(dst, pa.string()),
                }
            )

        shutil.rmtree(HOST_OPICC_EDGES_DIR, ignore_errors=True)
        trace1.map_batches(edges, batch_format="pyarrow").write_parquet(HOST_OPICC_EDGES_DIR)
        e = _ray.data.read_parquet(HOST_OPICC_EDGES_DIR)
        sc = opic(e, src_col="src_host", dst_col="dst_host", iters=OPIC_EXACT_ITERS)
        quotas = opic_budget(
            pa.table({"host": sc.column("node"), "score": sc.column("score")})
        )
        hosts = quotas.column("host").to_pylist()
        q = quotas.column("quota").to_pylist()
        fair = OPIC_BUDGET // max(len(hosts), 1)
        prios = {h: 0.25 for h, qq in zip(hosts, q) if qq < fair}

        e2 = CrawlEngine(
            CrawlConfig(
                web=cfg,
                n_shards=4,
                politeness_budget=4,
                max_rounds=256,
                out_dir=OPIC_C2_DIR,
                host_priorities=prios,
            )
        )
        e2.run(seeds)
        e2.shutdown()

        t1 = _ray.data.read_parquet(OPIC_C1_DIR + "_trace", columns=["url"])
        t2 = _ray.data.read_parquet(OPIC_C2_DIR + "_trace", columns=["url"])
        n1, n2 = t1.count(), t2.count()
        import pyarrow.compute as pc

        shared = (
            t1.union(t2)
            .groupby("url")
            .count()
            .map_batches(
                lambda b: b.filter(pc.equal(b.column("count()"), 2)),
                batch_format="pyarrow",
            )
            .count()
        )
        sum_q = sum(q)
        one = lambda v: pa.array([int(v)], pa.int64())  # noqa: E731
        return pa.table(
            {
                "urls_cycle1": one(n1),
                "urls_cycle2": one(n2),
                "urls_shared": one(shared),
                "sum_quota": one(sum_q),
                "quota_budget": one(OPIC_BUDGET),
                "quota_exact": one(1 if sum_q == OPIC_BUDGET else 0),
                "hosts_total": one(len(hosts)),
                "hosts_throttled": one(len(prios)),
            }
        )

    def crawl_robots_diff(sf_dir: str):
        """SQL-CHECKED retroactive robots-compliance diff: evaluate the
        OLD (seed 42) and NEW (seed 43) RFC rulesets over the written
        snapshot in one streaming pass; per host, the purge list size
        (newly denied) and recrawl candidates (newly allowed).  Both
        rulesets spool so DuckDB replays both precedence evaluations
        and the per-URL verdict join."""
        import shutil

        import ray as _ray

        from fscrawler_ray.pipelines.crawl_report import robots_diff, robots_ruleset

        out = _shared_written_run(sf_dir)
        shutil.rmtree(ROBOTS_DIFF_OLD_DIR, ignore_errors=True)
        shutil.rmtree(ROBOTS_DIFF_NEW_DIR, ignore_errors=True)
        robots_ruleset(out, seed=42).write_parquet(ROBOTS_DIFF_OLD_DIR)
        robots_ruleset(out, seed=43).write_parquet(ROBOTS_DIFF_NEW_DIR)
        return robots_diff(out, old_seed=42, new_seed=43)

    def crawl_starvation_audit(sf_dir: str):
        """SQL-CHECKED temporal-fairness audit over the written run:
        per host, active-round count and the longest gap between
        consecutive active rounds — catches a priority scheme silently
        starving low-priority hosts.  DuckDB replays with lag() over
        the distinct (host, round) set."""
        import pyarrow as pa

        from fscrawler_ray.pipelines.crawl_report import starvation_audit

        return starvation_audit(_shared_written_run(sf_dir))

    def crawl_merkle_diff(sf_dir: str):
        """SQL-CHECKED Merkle-bucket snapshot comparison over the same
        spooled CDC snapshot pair: 16 content buckets, each reduced to
        one md5 over key-sorted row leaves; replicas exchange 16 hashes
        to locate divergent partitions (compose with crawl_cdc_replay
        for the op-log to ship).  DuckDB replays leaf + bucket digests
        with md5(string_agg(... ORDER BY url))."""
        import ray as _ray

        from fscrawler_ray.pipelines.crawl_report import merkle_diff

        _spool_cdc_snapshots(sf_dir)
        cur = _ray.data.read_parquet(CDC_CUR_DIR)
        prev = _ray.data.read_parquet(CDC_PREV_DIR)
        return merkle_diff(cur, prev)

    def crawl_merkle_sync(sf_dir: str):
        """SQL-CHECKED bucket-scoped incremental sync: ship ONLY the
        divergent Merkle buckets' current rows, keep previous rows
        elsewhere, certify the synced relation equals the current
        snapshot (count + keyed md5 checksum).  The merkle_diff
        bandwidth claim demonstrated end-to-end; DuckDB replays bucket
        predicates + both checksums over the same spooled pair."""
        import ray as _ray

        from fscrawler_ray.pipelines.crawl_report import merkle_sync_cert

        _spool_cdc_snapshots(sf_dir)
        cur = _ray.data.read_parquet(CDC_CUR_DIR)
        prev = _ray.data.read_parquet(CDC_PREV_DIR)
        return merkle_sync_cert(cur, prev)

    def crawl_anchor_text(sf_dir: str):
        """SQL-CHECKED per-host anchor-term aggregation over the spooled
        URL-level link graph: each in-link contributes the alphanumeric
        terms of its target's trailing path segment (the deterministic
        stand-in for `<a>` text); top-3 terms per host by (count DESC,
        term ASC).  DuckDB replays extract → split → unnest → grouped
        count → window rank over the same spooled edges."""
        import shutil

        import pyarrow as pa

        import ray as _ray

        from fscrawler_ray.pipelines.crawl_report import anchor_text

        shutil.rmtree(ANCHOR_EDGES_DIR, ignore_errors=True)
        _url_edges(sf_dir).write_parquet(ANCHOR_EDGES_DIR)
        e = _ray.data.read_parquet(ANCHOR_EDGES_DIR, columns=["dst"])
        return _collect(
            anchor_text(e),
            {
                "host": pa.string(),
                "term": pa.string(),
                "cnt": pa.int64(),
                "rnk": pa.int64(),
            },
        )

    def host_pagerank_exact(sf_dir: str):
        """SQL-CHECKED PageRank: the derived host-edge table is spooled to
        a fixed parquet dir and the power iteration runs a FIXED 20 rounds
        (tol=0 disables early convergence), so DuckDB replays the exact
        same 20 unrolled iterations over the same spooled edges — an
        iterative distributed algorithm inside the oracle net."""
        import shutil

        import ray as _ray

        shutil.rmtree(HOST_EDGES_DIR, ignore_errors=True)
        _host_edges(sf_dir).write_parquet(HOST_EDGES_DIR)
        e = _ray.data.read_parquet(HOST_EDGES_DIR).materialize()
        return _pagerank_over_hosts(e, max_iter=PAGERANK_EXACT_ITERS, tol=0.0)

    return {
        "crawl_trace": crawl_trace,
        "crawl_counters": crawl_counters,
        "crawl_counters_audit": crawl_counters_audit,
        "crawl_host_degree": crawl_host_degree,
        "crawl_host_degree_exact": crawl_host_degree_exact,
        "crawl_mirrors_approx": crawl_mirrors_approx,
        "crawl_scan": crawl_scan,
        "crawl_host_report": crawl_host_report,
        "crawl_rollup": crawl_rollup,
        "crawl_mirrors": crawl_mirrors,
        "crawl_exif_report": crawl_exif_report,
        "crawl_iptc_report": crawl_iptc_report,
        "crawl_snapshot_diff": crawl_snapshot_diff,
        "crawl_prefix_rollup": crawl_prefix_rollup,
        "crawl_content_groups": crawl_content_groups,
        "crawl_compact": crawl_compact,
        "crawl_compact_audit": crawl_compact_audit,
        "crawl_politeness_audit": crawl_politeness_audit,
        "crawl_depth_funnel": crawl_depth_funnel,
        "crawl_tier_plan": crawl_tier_plan,
        "crawl_recrawl_cycle": crawl_recrawl_cycle,
        "crawl_host_quality": crawl_host_quality,
        "crawl_url_filter": crawl_url_filter,
        "crawl_robots_eval": crawl_robots_eval,
        "crawl_robots_audit": crawl_robots_audit,
        "crawl_split_leakage": crawl_split_leakage,
        "crawl_deadletters": crawl_deadletters,
        "crawl_tier_plan_robots": crawl_tier_plan_robots,
        "crawl_fairness_gini": crawl_fairness_gini,
        "crawl_lorenz_deciles": crawl_lorenz_deciles,
        "crawl_curation_funnel": crawl_curation_funnel,
        "crawl_host_bfs": crawl_host_bfs,
        "crawl_host_url_quality": crawl_host_url_quality,
        "crawl_round_profile": crawl_round_profile,
        "crawl_exif_normalized": crawl_exif_normalized,
        "crawl_host_overlap": crawl_host_overlap,
        "host_pagerank": host_pagerank,
        "host_pagerank_exact": host_pagerank_exact,
        "host_hits": host_hits,
        "host_ppr": host_ppr,
        "host_opic": host_opic,
        "host_communities": host_communities,
        "crawl_opic_budget": crawl_opic_budget,
        "crawl_anchor_text": crawl_anchor_text,
        "crawl_cdc_replay": crawl_cdc_replay,
        "crawl_delay_audit": crawl_delay_audit,
        "crawl_checkpoint_audit": crawl_checkpoint_audit,
        "crawl_merkle_diff": crawl_merkle_diff,
        "crawl_starvation_audit": crawl_starvation_audit,
        "crawl_robots_diff": crawl_robots_diff,
        "crawl_opic_cycle": crawl_opic_cycle,
        "host_modularity": host_modularity,
        "crawl_merkle_sync": crawl_merkle_sync,
        "host_reciprocity": host_reciprocity,
        "crawl_adaptive_budget": crawl_adaptive_budget,
        "crawl_warc_export": crawl_warc_export,
        "crawl_warc_revisit": crawl_warc_revisit,
        "crawl_warc_roundtrip": crawl_warc_roundtrip,
        "crawl_url_canonical": crawl_url_canonical,
        "crawl_cdx_index": crawl_cdx_index,
        "crawl_cdx_fetch": crawl_cdx_fetch,
        "crawl_url_templates": crawl_url_templates,
        "crawl_rendezvous": crawl_rendezvous,
        "crawl_host_scorecard": crawl_host_scorecard,
        "crawl_bloom_audit": crawl_bloom_audit,
        "crawl_size_integrity": crawl_size_integrity,
        "crawl_url_features": crawl_url_features,
        "crawl_frontier_funnel": crawl_frontier_funnel,
        "crawl_growth_trend": crawl_growth_trend,
        "crawl_sitemap_export": crawl_sitemap_export,
        "crawl_sitemap_roundtrip": crawl_sitemap_roundtrip,
        "crawl_sitemap_incremental": crawl_sitemap_incremental,
    }


def _image_queries() -> dict[str, Callable[[str], Any]]:
    from fscrawler_ray.pipelines.flagship import flagship
    from fscrawler_ray.sources.images import images_dataset, rows_for_sf

    def images_enrich(sf_dir: str):
        return flagship(sf_dir)

    # the attrs/caption-feature stages get REAL DuckDB oracles by spooling
    # the synthetic input table (bytes included) to a fixed parquet dir:
    # the engine runs its kernels over a read-back of the spool while the
    # oracle independently re-derives the same columns from the raw bytes /
    # caption strings (octet_length, magic-byte hex CASE, RE2 counts)
    _spool_cache: dict[str, str] = {}

    def _images_spool(sf_dir: str) -> str:
        if sf_dir not in _spool_cache:
            import shutil

            out = IMAGES_SPOOL_DIR
            shutil.rmtree(out, ignore_errors=True)
            n = min(rows_for_sf(sf_dir), 4096)
            images_dataset(n).write_parquet(out)
            _spool_cache.clear()  # the fixed dir holds ONE sf at a time
            _spool_cache[sf_dir] = out
        return _spool_cache[sf_dir]

    def images_column_footprint(sf_dir: str):
        """SQL-CHECKED parquet storage audit over the image spool: per
        column, compressed/uncompressed bytes + chunk counts read from
        file FOOTERS only (one task per file, row data never touched)
        vs DuckDB's independent parquet_metadata() parser."""
        from fscrawler_ray.pipelines.sinks import parquet_column_footprint

        return parquet_column_footprint(_images_spool(sf_dir))

    def images_release(sf_dir: str):
        """SQL-CHECKED composed image release chain: metadata quality
        gate -> exact phash dedup (keep-min) -> salted-md5 split ->
        per-(split, fmt) release datacard; every stage replayed by the
        nested oracle."""
        from fscrawler_ray.pipelines.image_corpus import images_release as _rel

        return _rel(_images_spool(sf_dir))

    def images_caption_size_rankcorr(sf_dir: str):
        """SQL-CHECKED integer-exact Spearman rank correlation between
        caption token count and payload bytes (ROW_NUMBER rank twins,
        two-level distributed rank, bigint rho arithmetic)."""
        from fscrawler_ray.pipelines.image_corpus import caption_size_rankcorr

        return caption_size_rankcorr(_images_spool(sf_dir))

    def images_phash_bitstats(sf_dir: str):
        """SQL-CHECKED pHash bit-balance audit: per bit position 0..63,
        how many images have the bit set and the micro-fraction — a
        well-distributed perceptual hash sits near 500000 everywhere;
        biased positions mean degenerate banding (the LSH quality
        pre-check before trusting banded dedup).  One streaming pass of
        per-block 64-int partials."""
        import numpy as np
        import pyarrow as pa

        import ray as _ray

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["phash"])
        n_total = ds.count()

        def partial(b: pa.Table) -> pa.Table:
            u = (
                b.column("phash")
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
                .view(np.uint64)
            )
            bits = (u[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
            cnt = bits.sum(axis=0).astype(np.int64)
            return pa.table(
                {
                    "bit": pa.array(np.arange(64, dtype=np.int64)),
                    "n_set": pa.array(cnt),
                }
            )

        agg = np.zeros(64, dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            np.add.at(
                agg,
                b.column("bit").to_numpy(zero_copy_only=False),
                b.column("n_set").to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "bit": pa.array(np.arange(64, dtype=np.int64)),
                "n_set": pa.array(agg),
                "set_micro": pa.array(agg * 1_000_000 // max(n_total, 1), pa.int64()),
            }
        )

    def images_datacard(sf_dir: str):
        """SQL-CHECKED per-format image-corpus data card (the image-side
        sibling of corpus_datacard): counts, payload bytes, total pixels,
        distinct phash tally (exact-dup signal) and caption token totals
        — one streaming pass of per-block fmt partials folded by a
        fmt-keyed grouped sum, plus a (fmt, phash)-dedup pass for the
        distinct count; driver state is fmt-bounded."""
        import pyarrow as pa
        import pyarrow.compute as pc

        import ray as _ray
        from ray.data.aggregate import Sum

        ds = _ray.data.read_parquet(
            _images_spool(sf_dir), columns=["fmt", "bytes", "w", "h", "phash", "caption"]
        )

        def partial(b: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "fmt": b.column("fmt"),
                    "nb": pc.binary_length(b.column("bytes")).cast(pa.int64()),
                    "px": pc.multiply(
                        b.column("w").cast(pa.int64()), b.column("h").cast(pa.int64())
                    ),
                    "tk": pc.count_substring_regex(b.column("caption"), r"\S+").cast(
                        pa.int64()
                    ),
                }
            )
            g = pa.TableGroupBy(t, ["fmt"]).aggregate(
                [("nb", "sum"), ("px", "sum"), ("tk", "sum"), ([], "count_all")]
            )
            return pa.table(
                {
                    "fmt": g.column("fmt"),
                    "nb_p": g.column("nb_sum"),
                    "px_p": g.column("px_sum"),
                    "tk_p": g.column("tk_sum"),
                    "n_p": g.column("count_all"),
                }
            )

        sums = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("fmt")
            .aggregate(Sum("nb_p"), Sum("px_p"), Sum("tk_p"), Sum("n_p"))
            .to_pandas()
            .set_index("fmt")
        )

        def ph(b: pa.Table) -> pa.Table:
            return pa.table({"fmt": b.column("fmt"), "phash": b.column("phash")})

        dist = (
            ds.map_batches(ph, batch_format="pyarrow")
            .groupby(["fmt", "phash"])
            .count()
            .groupby("fmt")
            .count()
            .to_pandas()
            .set_index("fmt")
        )

        fmts = sorted(sums.index)
        return pa.table(
            {
                "fmt": pa.array(fmts, pa.string()),
                "n_images": pa.array([int(sums.loc[f, "sum(n_p)"]) for f in fmts], pa.int64()),
                "total_bytes": pa.array(
                    [int(sums.loc[f, "sum(nb_p)"]) for f in fmts], pa.int64()
                ),
                "total_pixels": pa.array(
                    [int(sums.loc[f, "sum(px_p)"]) for f in fmts], pa.int64()
                ),
                "distinct_phash": pa.array(
                    [int(dist.loc[f, "count()"]) for f in fmts], pa.int64()
                ),
                "caption_tokens": pa.array(
                    [int(sums.loc[f, "sum(tk_p)"]) for f in fmts], pa.int64()
                ),
            }
        )

    def images_attrs(sf_dir: str):
        """SQL-CHECKED magic-byte sniff + size + family ladder: attrs_batch
        over the spooled bytes vs DuckDB's independent hex-prefix CASE."""
        import ray as _ray

        from fscrawler_ray.stages.image_stages import attrs_batch

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["image_id", "bytes"])

        def f(b):
            import pyarrow as pa

            out = attrs_batch(b)
            return pa.table(
                {
                    "image_id": out.column("image_id"),
                    "size": out.column("size"),
                    "sniffed_fmt": out.column("sniffed_fmt"),
                    "content_family": out.column("content_family").cast(pa.string()),
                    "content_category": out.column("content_category").cast(pa.string()),
                    "content_min_age": out.column("content_min_age").cast(pa.int64()),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow")

    def images_caption_features(sf_dir: str):
        """SQL-CHECKED caption feature kernels (token count, '+'-run rating
        cap-at-5, quality ratios, langid) over the spooled captions."""
        import ray as _ray

        from fscrawler_ray.functions.text import langid_batch, quality_features, rating_batch

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["image_id", "caption"])

        def f(b):
            import pyarrow as pa

            cap = b.column("caption")
            if isinstance(cap, pa.ChunkedArray):
                cap = cap.combine_chunks()
            q = quality_features(cap)
            return pa.table(
                {
                    "image_id": b.column("image_id"),
                    "caption_tokens": q.column("n_tokens"),
                    "rating": rating_batch(cap).cast(pa.int64()),
                    "mean_token_len": q.column("mean_token_len"),
                    "punct_ratio": q.column("punct_ratio"),
                    "caption_lang": langid_batch(cap),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow")

    def images_phash_dedup(sf_dir: str):
        from fscrawler_ray.pipelines.dedup import phash_dedup

        ds = images_dataset(rows_for_sf(sf_dir))
        return phash_dedup(ds)

    def images_dedup_keep_best(sf_dir: str):
        from fscrawler_ray.pipelines.dedup import phash_dedup_keep_best

        return phash_dedup_keep_best(images_dataset(rows_for_sf(sf_dir)))

    def images_phash_dedup_spool(sf_dir: str):
        """SQL-CHECKED twin of images_phash_dedup: the SAME groupby-dedup
        kernel (group by phash → min keeper → copies>1) over the SPOOLED
        phash column, so DuckDB can replay the group/keeper/copies logic
        exactly.  The decode-side phash (pixels → hash) stays pytest-
        verified; this certifies the distributed dedup shape."""
        import ray as _ray

        from fscrawler_ray.pipelines.dedup import phash_dedup

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["image_id", "phash"])
        return phash_dedup(ds)

    def images_caption_conflict(sf_dir: str):
        """SQL-CHECKED label-noise audit over pixel-duplicate groups (same
        phash, ≥2 members): distinct-caption count per group plus a
        conflict flag — the LAION-style 'same image, conflicting text'
        check that near-dup removal must resolve before captions become
        training targets (the synthetic spool's dup groups agree, so the
        flag certifies agreement here; the conflict branch is covered by
        a planted pytest).  One phash-keyed groupby; output is
        dup-group-sized."""
        import pyarrow as pa
        import ray as _ray

        from fscrawler_ray.pipelines.dedup import caption_conflict

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["image_id", "phash", "caption"])
        out = caption_conflict(ds)
        return _collect(
            out,
            {
                "phash": pa.int64(),
                "n_images": pa.int64(),
                "n_captions": pa.int64(),
                "has_conflict": pa.int64(),
                "keeper_image_id": pa.string(),
            },
        )

    def images_dedup_keep_best_spool(sf_dir: str):
        """SQL-CHECKED twin of images_dedup_keep_best: the argmax-join
        keep-best-resolution keeper policy over the spooled metadata vs
        DuckDB's max-px + equality-join replay."""
        import ray as _ray

        from fscrawler_ray.pipelines.dedup import phash_dedup_keep_best

        ds = _ray.data.read_parquet(
            _images_spool(sf_dir), columns=["image_id", "phash", "w", "h"]
        )
        return phash_dedup_keep_best(ds)

    def images_phash_neardup(sf_dir: str):
        from fscrawler_ray.pipelines.dedup import phash_neardup_pairs

        ds = images_dataset(rows_for_sf(sf_dir))
        return phash_neardup_pairs(ds)

    def images_phash_neardup_spool(sf_dir: str):
        """SQL-CHECKED twin of images_phash_neardup: the banded candidate
        generation + in-group Hamming verify over the SPOOLED phash
        column vs DuckDB's band self-join + bit_count(xor) replay.
        max_bucket is lifted above the spool size so the oracle sees the
        untruncated band expansion (truncation is the documented scale
        guard, pytest-covered)."""
        import ray as _ray

        from fscrawler_ray.pipelines.dedup import phash_neardup_pairs

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["image_id", "phash"])
        return phash_neardup_pairs(ds, max_bucket=1_000_000)

    def images_neardup_groups_spool(sf_dir: str):
        """SQL-CHECKED twin of images_neardup_groups: transitive closure of
        the banded phash near-dup pairs over the spool — the engine's
        union-find (on the output-sized pair table) vs DuckDB's recursive-
        CTE reachability, canonical = lexicographic-min member."""
        import ray as _ray

        from fscrawler_ray.pipelines.dedup import images_neardup_groups as groups

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["image_id", "phash"])
        return groups(ds, max_bucket=1_000_000)

    def images_split_leakage(sf_dir: str):
        """SQL-CHECKED image-corpus split-leakage audit: phash near-dup
        pairs (banded + Hamming-verified) whose two images land in
        different salted-hash train/val splits — the diffusion-training
        analog of the text corpus's split_leakage_audit (a val image
        whose near-copy sits in train inflates FID/eval)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray as _ray

        from fscrawler_ray.pipelines.dedup import phash_neardup_pairs
        from fscrawler_ray.pipelines.sampling import split_of_ids

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["image_id", "phash"])
        pairs = phash_neardup_pairs(ds, max_bucket=1_000_000)
        t = pa.table(
            {
                "image_a": pairs.column("image_a"),
                "image_b": pairs.column("image_b"),
                "split_a": split_of_ids(pairs.column("image_a")),
                "split_b": split_of_ids(pairs.column("image_b")),
                "hamming": pairs.column("hamming"),
            }
        )
        return t.filter(pc.invert(pc.equal(t.column("split_a"), t.column("split_b"))))

    def images_phash_banded_recall(sf_dir: str):
        """SQL-CHECKED banded-phash recall eval over the spool: the band
        scheme's measured recall vs the brute-force Hamming join (a
        2+2+1+1 bit split defeats all 4 bands, so recall < 1 is expected
        and now measured, not assumed)."""
        import ray as _ray

        from fscrawler_ray.pipelines.dedup import phash_banded_recall

        spool = _images_spool(sf_dir)
        return phash_banded_recall(
            lambda: _ray.data.read_parquet(spool, columns=["image_id", "phash"])
        )

    def images_shard_roundtrip(sf_dir: str):
        """SQL-CHECKED shard sink/source roundtrip: the spool is exported
        through the resumable WebDataset-style blob writer, read back via
        the one-task-per-shard loader, and every payload is certified
        byte-exact against the original table (md5-of-hex, which DuckDB
        recomputes from the spooled bytes)."""
        import hashlib
        import shutil

        import pyarrow as pa

        from fscrawler_ray.pipelines.image_corpus import read_shards, write_shards

        import ray as _ray

        spool = _images_spool(sf_dir)
        out = "/tmp/fscrawler_oracle_shards"
        shutil.rmtree(out, ignore_errors=True)
        src = _ray.data.read_parquet(spool, columns=["image_id", "bytes"])
        for _ in write_shards(src, out).iter_batches(batch_format="pyarrow"):
            pass  # consume the writer summaries (the export itself)

        def cert(b: pa.Table) -> pa.Table:
            payloads = b.column("bytes").to_pylist()
            return pa.table(
                {
                    "image_id": b.column("image_id"),
                    "nbytes": pa.array([len(p) for p in payloads], pa.int64()),
                    "payload_md5": pa.array(
                        [hashlib.md5(p.hex().upper().encode()).hexdigest() for p in payloads],
                        pa.string(),
                    ),
                }
            )

        return read_shards(out).map_batches(cert, batch_format="pyarrow")

    def images_wds_export(sf_dir: str):
        """SQL-CHECKED WebDataset tar export: the spool is packed into
        POSIX ustar training shards (payload + caption member per sample,
        every header field pinned) and the summary reports the REAL
        on-disk archive sizes — which the oracle predicts purely from
        512-block tar arithmetic over the same prefix-sum shard
        assignment.  A one-byte drift in the writer breaks the hash."""
        import shutil

        import pyarrow as pa
        import ray as _ray

        from fscrawler_ray.pipelines.image_corpus import write_tar_shards

        spool = _images_spool(sf_dir)
        shutil.rmtree(WDS_TAR_DIR, ignore_errors=True)
        src = _ray.data.read_parquet(spool, columns=["image_id", "bytes", "fmt", "caption"])
        summary = write_tar_shards(src, WDS_TAR_DIR).map_batches(
            lambda b: b.select(["shard", "n_samples", "img_bytes", "cap_bytes", "tar_bytes"]),
            batch_format="pyarrow",
        )
        return _collect(
            summary,
            {
                "shard": pa.int64(),
                "n_samples": pa.int64(),
                "img_bytes": pa.int64(),
                "cap_bytes": pa.int64(),
                "tar_bytes": pa.int64(),
            },
        )

    def images_wds_roundtrip(sf_dir: str):
        """SQL-CHECKED tar loader roundtrip: the archives written by
        images_wds_export are read back member-by-member and every
        payload AND caption is certified byte-exact against the original
        spool (md5-of-hex, which DuckDB recomputes from the spooled
        table)."""
        import hashlib
        import os
        import shutil

        import pyarrow as pa
        import ray as _ray

        from fscrawler_ray.pipelines.image_corpus import read_tar_shards, write_tar_shards

        spool = _images_spool(sf_dir)
        if not os.path.isdir(WDS_TAR_DIR) or not os.listdir(WDS_TAR_DIR):
            shutil.rmtree(WDS_TAR_DIR, ignore_errors=True)
            src = _ray.data.read_parquet(spool, columns=["image_id", "bytes", "fmt", "caption"])
            for _ in write_tar_shards(src, WDS_TAR_DIR).iter_batches(batch_format="pyarrow"):
                pass

        def cert(b: pa.Table) -> pa.Table:
            payloads = b.column("bytes").to_pylist()
            return pa.table(
                {
                    "image_id": b.column("image_id"),
                    "nbytes": pa.array([len(p) for p in payloads], pa.int64()),
                    "payload_md5": pa.array(
                        [hashlib.md5(p.hex().upper().encode()).hexdigest() for p in payloads],
                        pa.string(),
                    ),
                    "caption": b.column("caption"),
                }
            )

        return _collect(
            read_tar_shards(WDS_TAR_DIR).map_batches(cert, batch_format="pyarrow"),
            {
                "image_id": pa.string(),
                "nbytes": pa.int64(),
                "payload_md5": pa.string(),
                "caption": pa.string(),
            },
        )

    def images_bucketed_shards(sf_dir: str):
        """SQL-CHECKED aspect-bucketed shard plan over the spool: per
        ladder bucket, the byte-budget two-level scan vs DuckDB's
        bucket-partitioned window cumsum."""
        import ray as _ray

        from fscrawler_ray.pipelines.image_corpus import bucketed_shard_manifest

        ds = _ray.data.read_parquet(
            _images_spool(sf_dir), columns=["image_id", "bytes", "w", "h"]
        )
        return bucketed_shard_manifest(ds)

    def images_codec_efficiency(sf_dir: str):
        """SQL-CHECKED per-format compression diagnostic over the spool:
        images, payload bytes, pixels, and integer micro bytes-per-pixel
        — the codec-mix report that decides re-encode policy for a
        100-TB image corpus."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray as _ray
        from ray.data.aggregate import Sum

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["fmt", "bytes", "w", "h"])

        def partial(b):
            t = pa.table(
                {
                    "fmt": b.column("fmt"),
                    "n": pa.array([1] * b.num_rows, pa.int64()),
                    "nbytes": pc.binary_length(b.column("bytes")).cast(pa.int64()),
                    "px": pc.multiply(b.column("w").cast(pa.int64()), b.column("h").cast(pa.int64())),
                }
            )
            g = pa.TableGroupBy(t, ["fmt"]).aggregate([("n", "sum"), ("nbytes", "sum"), ("px", "sum")])
            return g.rename_columns(["fmt", "n", "nbytes", "px"])

        out = ds.map_batches(partial, batch_format="pyarrow").groupby("fmt").aggregate(
            Sum("n"), Sum("nbytes"), Sum("px")
        )
        return out.map_batches(
            lambda b: pa.table(
                {
                    "fmt": b.column("fmt"),
                    "n_images": b.column("sum(n)").cast(pa.int64()),
                    "total_bytes": b.column("sum(nbytes)").cast(pa.int64()),
                    "total_px": b.column("sum(px)").cast(pa.int64()),
                    "bytes_per_px_micro": pc.divide(
                        pc.multiply(b.column("sum(nbytes)").cast(pa.int64()), 1_000_000),
                        b.column("sum(px)").cast(pa.int64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        )

    def images_caption_dedup(sf_dir: str):
        """SQL-CHECKED caption-level exact dedup over the spool — the
        text-side counterpart of phash dedup (duplicate captions across
        images are the classic spam signal in web image corpora): caption
        groups with >1 image, keeper = min image_id."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray as _ray
        from ray.data.aggregate import Count, Min

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["image_id", "caption"])
        out = ds.groupby("caption").aggregate(Min("image_id"), Count())

        def f(b):
            b = b.rename_columns(["caption", "keeper_image_id", "n_images"])
            return b.filter(pc.greater(b.column("n_images"), 1))

        return out.map_batches(f, batch_format="pyarrow")

    def images_neardup_groups(sf_dir: str):
        from fscrawler_ray.pipelines.dedup import images_neardup_groups as groups

        ds = images_dataset(rows_for_sf(sf_dir))
        return groups(ds)

    def images_phash_search(sf_dir: str):
        """Query-time Hamming retrieval over the spooled phash table,
        SQL-CHECKED: the engine broadcast-probes (XOR + SWAR popcount);
        the oracle brute-forces bit_count(xor(...)) over the same spool."""
        import ray as _ray

        from fscrawler_ray.pipelines.similarity import phash_search

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["image_id", "phash"])
        return phash_search(ds)

    def images_shard_manifest(sf_dir: str):
        """WebDataset-style byte-budget shard assignment over the spooled
        image table, SQL-CHECKED: the engine runs the two-level distributed
        prefix scan; the oracle replays it as one window cumsum."""
        import ray as _ray

        from fscrawler_ray.pipelines.image_corpus import shard_manifest

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["image_id", "bytes"])
        return shard_manifest(ds)

    def images_thumbnails(sf_dir: str):
        """SQL-CHECKED: the actor-pool thumbnailer decodes the REAL payload
        bytes and downscales; the oracle re-derives the thumb dims from the
        spooled w/h metadata — certifying decoded dims ≡ metadata dims plus
        the downscale arithmetic, end-to-end through the actor pool."""
        import pyarrow as pa
        import ray as _ray

        from fscrawler_ray.stages.image_stages import ThumbnailStage

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["image_id", "bytes"])
        out = ds.map_batches(ThumbnailStage, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))

        def shape(b):
            return pa.table(
                {
                    "image_id": b.column("image_id"),
                    "thumb_w": b.column("thumb_w").cast(pa.int64()),
                    "thumb_h": b.column("thumb_h").cast(pa.int64()),
                }
            )

        return out.map_batches(shape, batch_format="pyarrow")

    def images_caption_extract(sf_dir: str):
        from fscrawler_ray.stages.multimodal import CaptionExtractStage

        ds = images_dataset(min(rows_for_sf(sf_dir), 512))
        out = ds.map_batches(CaptionExtractStage, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))
        return out.select_columns(["image_id", "extracted_caption", "brightness", "dominant_hue"])

    def audio_features(sf_dir: str):
        # REAL decode path: RIFF/WAVE PCM parsed with the stdlib wave
        # module, features from numpy FFT (no external codec needed)
        import ray as _ray

        from fscrawler_ray.stages.multimodal import AudioFeatureStage, synth_wav_table

        t = synth_wav_table(min(rows_for_sf(sf_dir), 512))
        # from_arrow yields ONE block; repartition so the actor pool parallelizes
        return _ray.data.from_arrow(t).repartition(8).map_batches(
            AudioFeatureStage, batch_format="pyarrow", batch_size=64, concurrency=(1, 4),
            fn_constructor_kwargs={"backend": "wav"},
        )

    def audio_id3_report(sf_dir: str):
        """SQL-CHECKED ID3 metadata extraction (the reference's draft
        id3tag_extractor analog): the engine walks the RIFF chunk list and
        parses the embedded ID3v2.3 frames out of each WAV payload; the
        oracle re-derives (title, artist, year) from the clip index in
        media_id — the same generator-contract pattern as crawl_exif_report."""
        import os
        import shutil

        import pyarrow.parquet as pq
        import ray as _ray

        from fscrawler_ray.stages.multimodal import id3_batch, synth_wav_table

        t = synth_wav_table(min(rows_for_sf(sf_dir), 512))
        shutil.rmtree(AUDIO_SPOOL_DIR, ignore_errors=True)
        os.makedirs(AUDIO_SPOOL_DIR, exist_ok=True)
        pq.write_table(t.select(["media_id", "bytes"]), os.path.join(AUDIO_SPOOL_DIR, "part-0.parquet"))
        ds = _ray.data.read_parquet(AUDIO_SPOOL_DIR).repartition(8)
        out = ds.map_batches(id3_batch, batch_format="pyarrow", batch_size=64)
        return out.select_columns(["media_id", "id3_title", "id3_artist", "id3_year"])

    def video_frames(sf_dir: str):
        """REAL demux+decode, now SQL-CHECKED: the sampler parses the FSV1
        TOC (total frames + fps from the container header) and decodes only
        the evenly-spaced picks; the oracle replays the pick arithmetic
        ((f+0.5)*total/eff truncated, ts = idx/fps*1000) from the spooled
        fps metadata and the generator's frames_per_clip contract (8)."""
        import os
        import shutil

        import pyarrow.parquet as pq
        import ray as _ray

        from fscrawler_ray.stages.multimodal import VideoFrameSampleStage, synth_video_table

        t = synth_video_table(min(rows_for_sf(sf_dir), 256))
        shutil.rmtree(VIDEO_SPOOL_DIR, ignore_errors=True)
        os.makedirs(VIDEO_SPOOL_DIR, exist_ok=True)
        pq.write_table(t.select(["media_id", "bytes", "fps"]), os.path.join(VIDEO_SPOOL_DIR, "part-0.parquet"))
        ds = _ray.data.read_parquet(VIDEO_SPOOL_DIR, columns=["media_id", "bytes"]).repartition(8)
        out = ds.map_batches(
            VideoFrameSampleStage, batch_format="pyarrow", batch_size=32, concurrency=(1, 4),
            fn_constructor_kwargs={"backend": "fsv"},
        )
        return out.select_columns(["media_id", "frame_no", "ts_ms"])

    def images_quality_filter(sf_dir: str):
        from fscrawler_ray.pipelines.image_corpus import clean_image_corpus

        kept, tally = clean_image_corpus(images_dataset(min(rows_for_sf(sf_dir), 1024)))
        import pyarrow as pa

        return pa.table({k: [int(v)] for k, v in tally.items()})

    def images_caption_consistency(sf_dir: str):
        from fscrawler_ray.pipelines.image_corpus import caption_consistency

        out = caption_consistency(images_dataset(min(rows_for_sf(sf_dir), 1024)))
        return out

    def images_aspect_buckets(sf_dir: str):
        """SQL-CHECKED: the two-level bucket-pack scan over the spooled
        metadata vs DuckDB's window replay (nearest-log-ratio argmin with
        first-min tie-break, then per-bucket image_id-rank // batch_size)."""
        import ray as _ray

        from fscrawler_ray.pipelines.image_corpus import aspect_buckets

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["image_id", "w", "h"])
        return aspect_buckets(ds)

    def images_augment(sf_dir: str):
        """SQL-CHECKED: the augment actor pool decodes REAL payloads,
        applies the md5-selected geometric op and re-encodes; the oracle
        re-derives (op, output dims) from the spooled metadata via
        md5_number_upper — certifying op selection, decoded dims ≡
        metadata dims, and the rot/flip dimension algebra."""
        import pyarrow as pa
        import ray as _ray

        from fscrawler_ray.stages.image_stages import AugmentStage

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["image_id", "bytes"])
        out = ds.map_batches(
            AugmentStage,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=4,
            fn_constructor_kwargs={"op_hash": "md5"},
        )

        def shape(b):
            return pa.table(
                {
                    "image_id": b.column("image_id"),
                    "aug_op": b.column("aug_op"),
                    "aug_w": b.column("aug_w").cast(pa.int64()),
                    "aug_h": b.column("aug_h").cast(pa.int64()),
                }
            )

        return out.map_batches(shape, batch_format="pyarrow")

    def images_caption_selfrank(sf_dir: str):
        """SQL-CHECKED cross-modal retrieval self-eval: rank of each query
        image under distinct-token caption overlap (pure integer scores,
        id tie-break) — text→image retrieval recall's oracle-replayable
        core."""
        import ray as _ray

        from fscrawler_ray.pipelines.image_corpus import caption_selfrank

        ds = _ray.data.read_parquet(_images_spool(sf_dir), columns=["image_id", "caption"])
        return caption_selfrank(ds)

    return {
        "images_enrich": images_enrich,
        "images_attrs": images_attrs,
        "images_datacard": images_datacard,
        "images_phash_bitstats": images_phash_bitstats,
        "images_caption_size_rankcorr": images_caption_size_rankcorr,
        "images_release": images_release,
        "images_column_footprint": images_column_footprint,
        "images_caption_features": images_caption_features,
        "images_caption_selfrank": images_caption_selfrank,
        "images_phash_dedup": images_phash_dedup,
        "images_phash_dedup_spool": images_phash_dedup_spool,
        "images_caption_conflict": images_caption_conflict,
        "images_dedup_keep_best": images_dedup_keep_best,
        "images_dedup_keep_best_spool": images_dedup_keep_best_spool,
        "images_phash_neardup": images_phash_neardup,
        "images_phash_neardup_spool": images_phash_neardup_spool,
        "images_split_leakage": images_split_leakage,
        "images_caption_dedup": images_caption_dedup,
        "images_neardup_groups_spool": images_neardup_groups_spool,
        "images_shard_roundtrip": images_shard_roundtrip,
        "images_wds_export": images_wds_export,
        "images_wds_roundtrip": images_wds_roundtrip,
        "images_phash_banded_recall": images_phash_banded_recall,
        "images_bucketed_shards": images_bucketed_shards,
        "images_codec_efficiency": images_codec_efficiency,
        "images_neardup_groups": images_neardup_groups,
        "images_thumbnails": images_thumbnails,
        "images_phash_search": images_phash_search,
        "images_shard_manifest": images_shard_manifest,
        "images_caption_extract": images_caption_extract,
        "images_augment": images_augment,
        "images_aspect_buckets": images_aspect_buckets,
        "images_quality_filter": images_quality_filter,
        "images_caption_consistency": images_caption_consistency,
        "audio_features": audio_features,
        "audio_id3_report": audio_id3_report,
        "video_frames": video_frames,
    }


def _cluster_sizes(labels):
    """(cluster size → #clusters) distribution over a (node, label)
    component table — label-table-sized, pure integer groupbys."""
    import pyarrow as pa

    df = labels.to_pandas() if hasattr(labels, "to_pandas") else labels
    per = df.groupby("label")["node"].count()
    dist = per.groupby(per).count().sort_index()
    return pa.table(
        {
            "cluster_size": pa.array(dist.index.astype("int64")),
            "n_clusters": pa.array(dist.to_numpy().astype("int64")),
        }
    )


def _ray_data_from(table):
    import ray as _ray

    return _ray.data.from_arrow(table)


def _corpus_prep(sf_dir: str):
    from fscrawler_ray.pipelines.prep import q_corpus_prep

    return q_corpus_prep(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from fscrawler_ray.pipelines import (
        analytics,
        bpe as _bpe,
        corpus,
        decontam,
        dedup,
        dsir,
        editdist,
        formats,
        graph,
        index_sink,
        sampling,
        similarity,
        textops,
    )

    out: dict[str, Callable[[str], Any]] = {}
    out.update(analytics.QUERIES)
    # SQL front door: each certified query compiles the SQL string below
    # onto Ray Data primitives; its oracle is the SAME string in DuckDB
    from fscrawler_ray.pipelines.sqlfront import FRONT_QUERIES, sql_query

    for _fname, _fsql in FRONT_QUERIES.items():
        out[_fname] = lambda sf, _s=_fsql: sql_query(sf, _s)
    out.update(
        {
            "docs_jsonl_roundtrip": formats.q_docs_jsonl_roundtrip,
            "docs_csv_roundtrip": formats.q_docs_csv_roundtrip,
            "docs_hive_roundtrip": formats.q_docs_hive_roundtrip,
            "docs_jsonl_gz_roundtrip": formats.q_docs_jsonl_gz_roundtrip,
        }
    )
    out.update(
        {
            "knn_bruteforce": lambda sf: similarity.knn_bruteforce(sf),
            # check scale probes ALL centroids → exhaustive ≡ brute force,
            # certifying the IVF index build (no lost/duplicated vectors),
            # the partitioned read path and the scoring kernel against the
            # SQL oracle; nprobe<n pruning + recall are pytest-asserted
            "knn_ivf": lambda sf: similarity.knn_ivf(sf, nprobe=16),
            "knn_int8": lambda sf: similarity.knn_int8(sf),
            # check scale: shortlist covers the whole table, so the exact
            # re-rank IS brute force — certifies the ADC plumbing, the
            # vec_id-pushdown fetch and the re-rank kernel against the SQL
            # oracle; the pruned-shortlist recall is pytest-asserted
            "knn_pq": lambda sf: similarity.knn_pq(sf, oversample=1_000_000),
            "embedding_clusters": lambda sf: similarity.embedding_clusters(sf),
            # contrastive hard-negative mining: cosine rank window (10, 30]
            "hard_negatives": lambda sf: similarity.hard_negatives(sf),
            # MMR diverse retrieval (relevance vs redundancy greedy)
            "mmr_topk": lambda sf: similarity.mmr_topk(sf),
            # random-hyperplane LSH ANN: unlike knn_ivf's exhaustive-probe
            # certification this answer DEPENDS on the buckets — signatures
            # are integer-exact (floor(v·1e6) × ±1 mask signs) so the
            # oracle replays bucket assignment bit-for-bit
            "knn_lsh": lambda sf: similarity.knn_lsh(sf),
            # multiprobe variant: probe Hamming-1 neighbor buckets too
            "knn_lsh_probe": lambda sf: similarity.knn_lsh_probe(sf),
            # recall of the LSH path vs brute-force ground truth, per query
            "lsh_ann_recall": lambda sf: similarity.lsh_ann_recall(sf),
            # ranking-quality eval: integer-weighted nDCG@10 of the LSH
            # path vs the same brute-force truth (recall can't see order)
            "knn_ndcg_eval": lambda sf: similarity.knn_ndcg_eval(sf),
            # first-relevant-rank eval: MRR@10, exact integer reciprocals
            "knn_mrr_eval": lambda sf: similarity.knn_mrr_eval(sf),
            # embedding-cosine near-dup over the LSH buckets — the
            # SQL-checked twin of SemDeDup's pytest-only k-means variant;
            # the τ verify is exact integer math on micro vectors
            "embedding_neardup_lsh": lambda sf: similarity.embedding_neardup_lsh(sf),
            # transitive closure of those pairs via pointer-jumping CC
            "embedding_neardup_groups": lambda sf: similarity.embedding_neardup_groups(sf),
            # SemDeDup-style pruning: keep min vec_id per component, stream the rest
            "embedding_dedup_clean": lambda sf: similarity.embedding_dedup_clean(sf),
            # incremental IVF maintenance: delete + insert against the
            # persisted coarse quantizer, then exhaustive-probe kNN read
            # back FROM THE ON-DISK PARTITIONS ≡ brute force over the
            # edited corpus (oracle reconstructs the edit in SQL)
            "knn_ivf_incremental": lambda sf: similarity.knn_ivf_incremental(sf),
            # integer-exact distributed k-means: micro-quantized components,
            # exact int argmin assignment, trunc-div centroid updates — the
            # SQL-checked twin of embedding_clusters (whose float means
            # drift across engines); the oracle unrolls both iterations
            "kmeans_exact": lambda sf: similarity.kmeans_exact(sf),
            # per-dimension moment pass (n, sum, sumsq, min, max in micros):
            # normalization/whitening prep, one streaming pass
            "embedding_moments": lambda sf: similarity.embedding_moments(sf),
            # distributed Gram (second-moment) matrix — PCA prep; per-block
            # m^T m partials, driver folds dim×dim ints
            "embedding_gram": lambda sf: similarity.embedding_gram(sf),
            # power-iteration top principal direction in exact bigint math
            # (rescaled trunc-div each step) — the oracle unrolls the steps
            "pca_component": lambda sf: similarity.pca_power_component(sf),
            # projection of every embedding onto that direction (int64
            # matvec against the broadcast component)
            "pca_scores": lambda sf: similarity.pca_scores(sf),
            # per-cluster farthest members of the integer k-means — the
            # mislabeled/junk-embedding review queue
            "kmeans_outliers": lambda sf: similarity.kmeans_outliers(sf),
            # diversity-preserving subsample: smallest hash(vec_id) per
            # cluster — RNG-free, partition-invariant
            "cluster_balanced_sample": lambda sf: similarity.cluster_balanced_sample(sf),
            "minhash_neardup": lambda sf: dedup.minhash_lsh_pairs(sf),
            # winnowing (MOSS) fingerprints: sliding-window min over char
            # k-gram hashes, rightmost ties — the (w+k-1)-guarantee
            # substring fingerprint beside dup_spans' fixed stride
            "winnow_fingerprints": lambda sf: dedup.q_winnow_fingerprints(sf),
            # MOSS match step: pairs sharing >= 2 winnow fingerprints,
            # hot-fp buckets killed at 32 (mirrored in the oracle)
            "winnow_match_pairs": lambda sf: dedup.winnow_match_pairs(sf),
            # asymmetric containment: the quote/subset-duplicate signal
            "winnow_containment": lambda sf: dedup.winnow_containment(sf),
            # MOSS cluster step: CC families over the match-pair graph
            "winnow_groups": lambda sf: dedup.winnow_groups(sf),
            # fingerprint-level dedup sweep: families -> keeper anti-filter
            "winnow_dedup_clean": lambda sf: dedup.winnow_dedup_clean(sf),
            # n-gram Jaccard with a permissive threshold: the exact-verify
            # kernel exposed as its own op (LSH candidates → exact J ≥ 0.2)
            "ngram_jaccard_pairs": lambda sf: dedup.minhash_lsh_pairs(sf, jaccard_threshold=0.2),
            # the SQL-checkable exact twin: shared-shingle inverted-index
            # candidates (recall 1.0 at this threshold) + the same verify
            "ngram_jaccard_exact": lambda sf: dedup.ngram_jaccard_exact(sf),
            # the SQL-checkable LSH twin: md5/mod-P hashes end-to-end, so
            # the oracle replays candidate GENERATION (bands → buckets →
            # pairs), not just the exact-Jaccard verify
            "minhash_md5_neardup": lambda sf: dedup.minhash_md5_pairs(sf),
            # sketch-accuracy eval: matching-component count vs exact J
            # for every overlapping LSH candidate pair
            "minhash_accuracy": lambda sf: dedup.minhash_md5_accuracy(sf),
            # LSH config eval: measured recall vs the exact-join truth
            "lsh_recall": lambda sf: dedup.lsh_recall(sf),
            "simhash_neardup": lambda sf: dedup.simhash_pairs(sf),
            # banded-simhash recall vs brute-force Hamming ground truth
            "simhash_banded_recall": lambda sf: dedup.simhash_banded_recall(sf),
            "embedding_neardup": lambda sf: dedup.embedding_neardup_pairs(sf),
            "semantic_neardup": lambda sf: dedup.semantic_neardup_pairs(sf),
            # distributed CC over the near-dup pair graph (label = min doc
            # id per component — the scale path for corpus dedup's
            # union-find; approximate upstream pairs → rows-only check)
            "neardup_components": lambda sf: graph.connected_components(
                _ray_data_from(dedup.minhash_lsh_pairs(sf))
            ),
            # same distributed pointer-jumping CC, but over the md5 LSH
            # pair graph — SQL-CHECKED end-to-end (recursive-CTE closure)
            "neardup_components_exact": lambda sf: graph.connected_components(
                _ray_data_from(dedup.minhash_md5_pairs(sf))
            ),
            # the dedup report everyone asks for: how big are the dup
            # clusters?  size distribution over the CC labels (cluster
            # size -> #clusters), SQL-checked through the same closure
            "neardup_cluster_sizes": lambda sf: _cluster_sizes(
                graph.connected_components(_ray_data_from(dedup.minhash_md5_pairs(sf)))
            ),
            "term_df": index_sink.q_term_df,
            # delta+varint postings sizing (Lucene storage model); the
            # per-term gap scan is two-level bucketed, never df-sized
            "postings_varint": index_sink.q_postings_varint,
            # front-coded term dictionary: the other half of the
            # Lucene-style index storage cost model
            "term_dict_frontcode": index_sink.q_term_dict_frontcode,
            # incremental index maintenance: delete + re-insert a
            # deterministic delta through the on-disk postings, df read
            # back from the updated index vs the edited-corpus oracle
            "index_incremental_df": lambda sf: index_sink.q_index_incremental_df(
                sf, "/tmp/fscrawler_oracle_incr_index"
            ),
            "phrase_hits": index_sink.q_phrase_hits,
            "tfidf_topk": lambda sf: index_sink.q_tfidf_topk(sf),
            "bm25_scores": lambda sf: index_sink.q_bm25_scores(sf),
            "bm25_topk": lambda sf: index_sink.q_bm25_topk(sf),
            "hybrid_search": lambda sf: index_sink.q_hybrid_search(sf),
            # per-doc top-3 tf-idf keywords (micro-quantized integer
            # ranking; one vocab-bounded df groupby + one streaming pass)
            "doc_keywords": lambda sf: index_sink.q_doc_keywords(sf),
            "corpus_dedup": corpus.dedup_corpus,
            "corpus_prep": _corpus_prep,
            "corpus_clean": lambda sf: corpus.clean_text_corpus(sf)[0],
            # exact-only composed clean (no LSH) — every rule deterministic,
            # so the whole C4-style pipeline is SQL-checked end-to-end
            "corpus_clean_exact": lambda sf: corpus.clean_text_corpus(sf, neardup=False)[0],
            # dedup audit trail: every removed doc with keeper + reason
            "dedup_provenance": dedup.dedup_provenance,
            # which sources produce the dups: per-source removal rates
            "dedup_rate_by_source": dedup.dedup_rate_by_source,
            "corpus_funnel": corpus.corpus_funnel,
            # the full release chain: clean -> gopher -> decontam ->
            # split -> per-(split, lang) datacard, composition-certified
            "corpus_release": corpus.q_corpus_release,
            # cross-document exact span dedup REMOVAL (C4 duplicated-span
            # rule / Lee et al. ExactSubstr shape on non-overlapping
            # 8-token tiles): first global occurrence survives, cleaned
            # text reassembled per doc; SQL-checked end-to-end
            "span_dedup_clean": corpus.q_span_dedup_clean,
            # distributed BPE tokenizer training: one corpus pass collapses
            # to a vocab-bounded word table, K merge rounds over it; the
            # oracle replays the rounds as unrolled CTEs (pipelines/bpe.py)
            "bpe_merges": _bpe.q_bpe_merges,
            "bpe_merges_distributed": _bpe.q_bpe_merges_distributed,
            "bpe_vocab": _bpe.q_bpe_vocab,
            "bpe_encode_docs": _bpe.q_bpe_encode_docs,
            "bpe_fertility_by_lang": _bpe.q_bpe_fertility_by_lang,
            "quality_counts": textops.q_quality_counts,
            "langid_docs": textops.q_langid_docs,
            # lang² confusion matrix: certified langid vs labeled lang
            "langid_confusion": textops.q_langid_confusion,
            # Good-Turing unseen-mass: hapax fraction in integer micros
            "vocab_good_turing": textops.q_vocab_good_turing,
            # Zipf exponent: integer least squares on micro-nat log-log
            "zipf_slope": textops.q_zipf_slope,
            # order-0 char entropy per lang, integer micro-nats
            "char_entropy_by_lang": textops.q_char_entropy_by_lang,
            "quality_docs": textops.q_quality_docs,
            "quality_ratios": textops.q_quality_ratios,
            # Flesch-Kincaid grade in integer micros, RE2-count inputs
            "readability_docs": textops.q_readability_docs,
            "gopher_rules": textops.q_gopher_rules,
            "gopher_pass_by_source": textops.q_gopher_pass_by_source,
            "vocab_growth": textops.q_vocab_growth,
            "corpus_datacard": textops.q_corpus_datacard,
            "fingerprint_canon": textops.q_fingerprint_canon,
            "simhash_docs": textops.q_simhash_docs,
            "fingerprint_docs": textops.q_fingerprint_docs,
            "corpus_mixture": sampling.q_corpus_mixture,
            "stratified_sample": sampling.q_stratified_sample,
            "weighted_sample": sampling.q_weighted_sample,
            "uniform_sample": sampling.q_uniform_sample,
            # deterministic epoch shuffle: md5 permutation → shard + global
            # rank within shard via a two-pass distributed rank (SQL-checked
            # against one ROW_NUMBER window)
            "epoch_shuffle": sampling.q_epoch_shuffle,
            # shuffle-quality: Spearman between two epoch permutations
            "epoch_decorrelation": sampling.q_epoch_decorrelation,
            # deterministic salted train/val split + the pre-release
            # cross-split near-dup leakage audit (exact-Jaccard pairs
            # straddling the split boundary)
            "split_assign": sampling.q_split_assign,
            "split_leakage_audit": sampling.q_split_leakage_audit,
            "split_repair": sampling.q_split_repair,
            "mixture_token_budget": sampling.q_mixture_token_budget,
            # equal-representation mixture: exact integer water-filling
            "mixture_waterfill": sampling.q_mixture_waterfill,
            # split representativeness: PSI of doclen train-vs-val
            "split_psi_drift": sampling.q_split_psi_drift,
            "curriculum_order": sampling.curriculum_order,
            # temperature-scaled multilingual rebalancing (alpha = 0.7)
            "temperature_mixture": sampling.q_temperature_mixture,
            "top_tokens_approx": lambda sf: textops.q_top_tokens_approx(sf),
            "cms_token_estimates": lambda sf: textops.q_cms_token_estimates(sf),
            "simhash_md5_docs": textops.q_simhash_md5_docs,
            "fingerprint_md5_docs": textops.q_fingerprint_md5_docs,
            "top_tokens_by_lang": lambda sf: textops.q_top_tokens_by_lang(sf),
            "props_extract": textops.q_props_extract,
            "props_redact": textops.q_props_redact,
            # DSIR importance resampling (Xie et al. 2023): hashed-ngram
            # importance weights target-vs-raw, int64 micro-nats — both the
            # per-doc weights and the top-k selection are SQL-checked
            "dsir_weights": dsir.q_dsir_weights,
            "dsir_select": lambda sf: dsir.q_dsir_select(sf),
            "chunk_docs": textops.q_chunk_docs,
            "vocab_coverage": textops.q_vocab_coverage,
            "pack_sequences": textops.q_pack_sequences,
            "lm_score_docs": textops.q_lm_score_docs,
            # CCNet head/middle/tail terciles over the LM score (NTILE
            # replay; distributed rank)
            "lm_buckets": textops.q_lm_buckets,
            # per-source KL divergence vs the corpus token distribution
            "source_kl": textops.q_source_kl,
            # docs per power-of-two token-count bucket (integer log2)
            "doclen_histogram": textops.q_doclen_histogram,
            # per-language type/token/hapax counts (lexical diversity)
            "lang_ttr": textops.q_lang_ttr,
            "approx_median_chars_by_lang": textops.q_approx_median_chars_by_lang,
            "similar_part_names": editdist.q_similar_part_names,
            "name_triangles": editdist.q_name_triangles,
            # k-core of the name-similarity graph: distributed peel with a
            # fixed round count, SQL-checked via unrolled filter+degree CTEs
            "name_kcore": editdist.q_name_kcore,
            # composed entity resolution: fuzzy pairs -> distributed CC ->
            # canonical min-id (recursive-CTE closure oracle)
            "part_entities": editdist.q_part_entities,
            # unicode canonicalization (lower -> NFC -> whitespace collapse)
            "normalize_docs": textops.q_normalize_docs,
            # PMI bigram collocations (micro-quantized, min-count floor)
            "collocations": lambda sf: textops.q_collocations(sf),
            "decontam_hits": decontam.q_decontam_hits,
            "repetition_docs": decontam.q_repetition_docs,
            "pii_scrub": decontam.q_pii_scrub,
            # scrub idempotence: re-detect over scrubbed text == 0
            "pii_scrub_audit": decontam.q_pii_scrub_audit,
            # per-doc W-gram novelty (df==1 fraction): memorization metric
            "doc_novelty": decontam.q_doc_novelty,
            "dup_spans_docs": decontam.q_dup_spans_docs,
            "boilerplate_docs": decontam.q_boilerplate_docs,
        }
    )
    out.update(_crawl_queries())
    out.update(_image_queries())
    return out


def _host_pagerank_oracle(iters: int = PAGERANK_EXACT_ITERS) -> str:
    """DuckDB replay of host_pagerank_exact: ``iters`` power iterations
    unrolled as CTEs over the spooled host-edge parquet, mirroring
    graph.pagerank's update rank' = (1-d)/N + d·(Σ_in rank/outdeg +
    dangling_mass/N) term by term (same float64 expression tree; the
    checker's rtol absorbs sum-order drift)."""
    parts = [
        # every CTE is MATERIALIZED: DuckDB otherwise INLINES the chain,
        # and 20 iterations of inlining is exponential planning blowup
        f"WITH e AS MATERIALIZED (SELECT src_host AS s, dst_host AS t FROM read_parquet('{HOST_EDGES_DIR}/*.parquet')), "
        "deg AS MATERIALIZED (SELECT s, count(*) AS od FROM e GROUP BY s), "
        "nodes AS MATERIALIZED (SELECT s AS node FROM e UNION SELECT t FROM e), "
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes), "
        "r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes), "
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT e.t AS node, sum(p.pr / dg.od) AS contrib "
            f"FROM e JOIN r{k - 1} p ON p.node = e.s JOIN deg dg ON dg.s = e.s GROUP BY e.t), "
            f"d{k} AS MATERIALIZED (SELECT coalesce(sum(p.pr), 0.0) AS dm FROM r{k - 1} p "
            "LEFT JOIN deg dg ON dg.s = p.node WHERE dg.s IS NULL), "
            f"r{k} AS MATERIALIZED (SELECT nd.node, (1.0 - 0.85) / nn.n + 0.85 * (coalesce(c.contrib, 0.0) + dk.dm / nn.n) AS pr "
            f"FROM nodes nd CROSS JOIN nn CROSS JOIN d{k} dk LEFT JOIN c{k} c ON c.node = nd.node), "
        )
    parts.append(f'SELECT node AS host, pr AS "rank" FROM r{iters}')
    return "".join(parts[:-1]).rstrip(", ") + " " + parts[-1]


def _host_hits_oracle(iters: int = HITS_EXACT_ITERS) -> str:
    """DuckDB replay of host_hits: ``iters`` integer HITS rounds unrolled
    as MATERIALIZED CTEs over the spooled host-edge parquet — each half
    step is the same join + grouped HUGEINT sum + trunc-div max
    normalization the engine runs (bit-exact, no rtol)."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT src_host AS s, dst_host AS t FROM read_parquet('{HOST_HITS_EDGES_DIR}/*.parquet')), "
        "nodes AS MATERIALIZED (SELECT s AS node FROM e UNION SELECT t FROM e), "
        "h0 AS MATERIALIZED (SELECT node, CAST(1000000 AS HUGEINT) AS h FROM nodes), "
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"ar{k} AS MATERIALIZED (SELECT e.t AS node, sum(p.h) AS raw "
            f"FROM e JOIN h{k - 1} p ON p.node = e.s GROUP BY e.t), "
            f"am{k} AS (SELECT max(raw) AS m FROM ar{k}), "
            f"a{k} AS MATERIALIZED (SELECT nd.node, "
            f"CAST(coalesce(r.raw, 0) * 1000000 // am.m AS HUGEINT) AS a "
            f"FROM nodes nd CROSS JOIN am{k} am LEFT JOIN ar{k} r ON r.node = nd.node), "
            f"hr{k} AS MATERIALIZED (SELECT e.s AS node, sum(p.a) AS raw "
            f"FROM e JOIN a{k} p ON p.node = e.t GROUP BY e.s), "
            f"hm{k} AS (SELECT max(raw) AS m FROM hr{k}), "
            f"h{k} AS MATERIALIZED (SELECT nd.node, "
            f"CAST(coalesce(r.raw, 0) * 1000000 // hm.m AS HUGEINT) AS h "
            f"FROM nodes nd CROSS JOIN hm{k} hm LEFT JOIN hr{k} r ON r.node = nd.node), "
        )
    parts.append(
        f"SELECT h.node AS host, CAST(h.h AS BIGINT) AS hub, CAST(a.a AS BIGINT) AS authority "
        f"FROM h{iters} h JOIN a{iters} a ON a.node = h.node"
    )
    return "".join(parts[:-1]).rstrip(", ") + " " + parts[-1]


def _host_ppr_oracle(iters: int = PPR_EXACT_ITERS, n_seeds: int = 4) -> str:
    """DuckDB replay of host_ppr: seeds = top-n by (outdeg DESC, node),
    bonus = 15·scale // (100·n_seeds), then ``iters`` unrolled rounds of
    w[u] = r[u]·85 // (100·outdeg[u]) → grouped HUGEINT in-sum →
    r' = bonus·is_seed + raw.  Bit-exact, no rtol."""
    parts = [
        "WITH e AS MATERIALIZED (SELECT src_host AS s, dst_host AS t "
        f"FROM read_parquet('{HOST_PPR_EDGES_DIR}/*.parquet')), "
        "nodes AS MATERIALIZED (SELECT s AS node FROM e UNION SELECT t FROM e), "
        "deg AS MATERIALIZED (SELECT s AS node, CAST(count(*) AS HUGEINT) AS od "
        "FROM e GROUP BY s), "
        f"seeds AS MATERIALIZED (SELECT node FROM deg ORDER BY od DESC, node LIMIT {n_seeds}), "
        "b AS MATERIALIZED (SELECT nd.node, "
        f"CAST(CASE WHEN sd.node IS NULL THEN 0 ELSE 15 * 1000000 // (100 * {n_seeds}) END "
        "AS HUGEINT) AS bonus FROM nodes nd LEFT JOIN seeds sd ON sd.node = nd.node), "
        "r0 AS MATERIALIZED (SELECT node, bonus AS r FROM b), ",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT d.node, CAST(p.r * 85 // (100 * d.od) AS HUGEINT) "
            f"AS w FROM deg d JOIN r{k - 1} p ON p.node = d.node WHERE p.r > 0), "
            f"raw{k} AS MATERIALIZED (SELECT e.t AS node, sum(w.w) AS raw "
            f"FROM e JOIN w{k} w ON w.node = e.s GROUP BY e.t), "
            f"r{k} AS MATERIALIZED (SELECT b.node, "
            f"CAST(b.bonus + coalesce(r.raw, 0) AS HUGEINT) AS r "
            f"FROM b LEFT JOIN raw{k} r ON r.node = b.node), "
        )
    parts.append(
        f"SELECT b.node AS host, CAST(r{iters}.r AS BIGINT) AS score, "
        "CAST(CASE WHEN b.bonus > 0 THEN 1 ELSE 0 END AS BIGINT) AS is_seed "
        f"FROM b JOIN r{iters} ON r{iters}.node = b.node"
    )
    return "".join(parts[:-1]).rstrip(", ") + " " + parts[-1]


def _host_opic_oracle(
    iters: int = OPIC_EXACT_ITERS,
    scale: int = 1_000_000,
    edges_dir: str = HOST_OPIC_EDGES_DIR,
) -> str:
    """DuckDB replay of host_opic: every node starts with ``scale``
    cash; each unrolled round banks cash into history (h' = h + c) and
    shares w[u] = c[u] // outdeg[u] to each out-neighbor (grouped
    HUGEINT in-sum → next cash; dangling cash and trunc remainders
    dropped by contract).  Bit-exact, no rtol."""
    parts = [
        "WITH e AS MATERIALIZED (SELECT src_host AS s, dst_host AS t "
        f"FROM read_parquet('{edges_dir}/*.parquet')), "
        "nodes AS MATERIALIZED (SELECT s AS node FROM e UNION SELECT t FROM e), "
        "deg AS MATERIALIZED (SELECT s AS node, CAST(count(*) AS HUGEINT) AS od "
        "FROM e GROUP BY s), "
        f"st0 AS MATERIALIZED (SELECT node, CAST({scale} AS HUGEINT) AS c, "
        "CAST(0 AS HUGEINT) AS h FROM nodes), ",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT d.node, CAST(p.c // d.od AS HUGEINT) AS w "
            f"FROM deg d JOIN st{k - 1} p ON p.node = d.node WHERE p.c > 0), "
            f"raw{k} AS MATERIALIZED (SELECT e.t AS node, sum(w.w) AS raw "
            f"FROM e JOIN w{k} w ON w.node = e.s GROUP BY e.t), "
            f"st{k} AS MATERIALIZED (SELECT p.node, "
            f"CAST(coalesce(r.raw, 0) AS HUGEINT) AS c, "
            f"CAST(p.h + p.c AS HUGEINT) AS h "
            f"FROM st{k - 1} p LEFT JOIN raw{k} r ON r.node = p.node), "
        )
    parts.append(
        f"SELECT node AS host, CAST(c AS BIGINT) AS cash, CAST(h AS BIGINT) AS history, "
        f"CAST(h + c AS BIGINT) AS score FROM st{iters}"
    )
    return "".join(parts[:-1]).rstrip(", ") + " " + parts[-1]


def _host_lp_oracle(iters: int = LP_EXACT_ITERS, edges_dir: str = HOST_LP_EDGES_DIR) -> str:
    """DuckDB replay of host_communities: symmetrize (self-loops
    dropped), weight = parallel-edge multiplicity, then ``iters``
    unrolled rounds of per-node (weight DESC, label ASC) argmax via a
    row_number window.  Bit-exact, no rtol."""
    parts = [
        "WITH raw AS MATERIALIZED (SELECT src_host AS s, dst_host AS t "
        f"FROM read_parquet('{edges_dir}/*.parquet') WHERE src_host <> dst_host), "
        "e AS MATERIALIZED (SELECT u, v, CAST(count(*) AS HUGEINT) AS w FROM "
        "(SELECT s AS u, t AS v FROM raw UNION ALL SELECT t AS u, s AS v FROM raw) "
        "GROUP BY u, v), "
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lab FROM e), ",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT e.v AS node, l.lab AS lab, sum(e.w) AS wt "
            f"FROM e JOIN l{k - 1} l ON l.node = e.u GROUP BY e.v, l.lab), "
            f"l{k} AS MATERIALIZED (SELECT node, lab FROM (SELECT node, lab, "
            "row_number() OVER (PARTITION BY node ORDER BY wt DESC, lab ASC) AS rn "
            f"FROM c{k}) WHERE rn = 1), "
        )
    parts.append(f"SELECT node AS host, lab AS label FROM l{iters}")
    return "".join(parts[:-1]).rstrip(", ") + " " + parts[-1]


def oracle_sql() -> dict[str, str]:
    from fscrawler_ray.pipelines.analytics import ORACLE_SQL

    sql = dict(ORACLE_SQL)
    # SQL front door: the oracle IS the compiled query itself
    from fscrawler_ray.pipelines.sqlfront import FRONT_QUERIES as _FRONT

    sql.update(_FRONT)
    from fscrawler_ray.pipelines.corpus import ORACLE_SQL as CORPUS_SQL
    from fscrawler_ray.pipelines.decontam import ORACLE_SQL as DECONTAM_SQL
    from fscrawler_ray.pipelines.dedup import ORACLE_SQL as DEDUP_SQL
    from fscrawler_ray.pipelines.dsir import ORACLE_SQL as DSIR_SQL
    from fscrawler_ray.pipelines.editdist import ORACLE_SQL as EDITDIST_SQL
    from fscrawler_ray.pipelines.formats import ORACLE_SQL as FORMATS_SQL
    from fscrawler_ray.pipelines.index_sink import ORACLE_SQL as INDEX_SQL
    from fscrawler_ray.pipelines.sampling import ORACLE_SQL as SAMPLING_SQL
    from fscrawler_ray.pipelines.textops import ORACLE_SQL as TEXT_SQL

    sql.update(INDEX_SQL)
    sql.update(TEXT_SQL)
    sql.update(SAMPLING_SQL)
    sql.update(DECONTAM_SQL)
    sql.update(EDITDIST_SQL)
    sql.update(FORMATS_SQL)
    sql.update(CORPUS_SQL)
    sql.update(DEDUP_SQL)
    sql.update(DSIR_SQL)
    from fscrawler_ray.pipelines.bpe import ORACLE_SQL as BPE_SQL

    sql.update(BPE_SQL)
    sql["neardup_cluster_sizes"] = (
        "SELECT CAST(sz AS BIGINT) AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters "
        "FROM (SELECT label, count(*) AS sz FROM ("
        + sql["neardup_components_exact"]
        + ") comp GROUP BY label) GROUP BY sz"
    )
    from fscrawler_ray.pipelines.sampling import SPLIT_CASE_SQL as _SPLIT_CASE
    from fscrawler_ray.pipelines.sampling import split_case_sql as _split_case

    sql["dedup_provenance"] = (
        "WITH RECURSIVE pr AS ("
        + sql["ngram_jaccard_exact"]
        + "), "
        "g AS (SELECT text, min(doc_id) AS keeper FROM documents GROUP BY text), "
        "exrem AS (SELECT CAST(d.doc_id AS BIGINT) AS doc_id, CAST(g.keeper AS BIGINT) AS keeper, "
        "'exact' AS reason FROM documents d JOIN g ON g.text = d.text WHERE d.doc_id <> g.keeper), "
        "e AS (SELECT doc_a AS a, doc_b AS b FROM pr UNION SELECT doc_b, doc_a FROM pr), "
        "reach(a, b) AS ((SELECT a, a FROM e UNION SELECT a, b FROM e) "
        "UNION SELECT r.a, e.b FROM reach r JOIN e ON e.a = r.b), "
        "cc AS (SELECT a AS node, min(b) AS label FROM reach GROUP BY a), "
        "nearrem AS (SELECT CAST(node AS BIGINT) AS doc_id, CAST(label AS BIGINT) AS keeper, "
        "'near' AS reason FROM cc WHERE node <> label "
        "AND node NOT IN (SELECT doc_id FROM exrem)) "
        "SELECT * FROM exrem UNION ALL SELECT * FROM nearrem"
    )
    sql["dedup_rate_by_source"] = (
        "WITH prov AS ("
        + sql["dedup_provenance"]
        + "), tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs "
        "FROM documents GROUP BY source), "
        "dec AS (SELECT d.source, p.reason FROM prov p JOIN documents d USING (doc_id)), "
        "agg AS (SELECT source, "
        "CAST(sum(CASE WHEN reason = 'exact' THEN 1 ELSE 0 END) AS BIGINT) AS exact_removed, "
        "CAST(sum(CASE WHEN reason = 'near' THEN 1 ELSE 0 END) AS BIGINT) AS near_removed "
        "FROM dec GROUP BY source) "
        "SELECT tot.source, tot.n_docs, coalesce(agg.exact_removed, 0) AS exact_removed, "
        "coalesce(agg.near_removed, 0) AS near_removed, "
        "CAST((coalesce(agg.exact_removed, 0) + coalesce(agg.near_removed, 0)) * 1000000 "
        "// tot.n_docs AS BIGINT) AS removal_rate_micro "
        "FROM tot LEFT JOIN agg ON agg.source = tot.source"
    )
    sql["split_leakage_audit"] = (
        "WITH p AS ("
        + sql["ngram_jaccard_exact"]
        + f"), s AS (SELECT doc_id, {_SPLIT_CASE} AS split FROM documents) "
        "SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b, p.jaccard "
        "FROM p JOIN s sa ON sa.doc_id = p.doc_a JOIN s sb ON sb.doc_id = p.doc_b "
        "WHERE sa.split <> sb.split"
    )
    sql["split_repair"] = (
        "WITH p AS ("
        + sql["ngram_jaccard_exact"]
        + f"), s AS (SELECT doc_id, {_SPLIT_CASE} AS split FROM documents), "
        "leakv AS (SELECT sa.doc_id FROM p JOIN s sa ON sa.doc_id = p.doc_a "
        "JOIN s sb ON sb.doc_id = p.doc_b WHERE sa.split = 'val' AND sb.split = 'train' "
        "UNION SELECT sb.doc_id FROM p JOIN s sa ON sa.doc_id = p.doc_a "
        "JOIN s sb ON sb.doc_id = p.doc_b WHERE sb.split = 'val' AND sa.split = 'train') "
        "SELECT s.doc_id, CASE WHEN s.doc_id IN (SELECT doc_id FROM leakv) THEN 'train' "
        "ELSE s.split END AS split, "
        "CAST(CASE WHEN s.doc_id IN (SELECT doc_id FROM leakv) THEN 1 ELSE 0 END AS BIGINT) "
        "AS moved FROM s"
    )
    sql["crawl_scan"] = (
        "SELECT CAST(seq AS BIGINT) AS seq, url, host, depth, is_dir "
        f"FROM read_parquet('{CRAWL_SCAN_DIR}_trace/part-*.parquet')"
    )
    sql["crawl_host_report"] = (
        "SELECT host, CAST(count(*) AS BIGINT) AS files, CAST(sum(size) AS BIGINT) AS total_bytes, "
        "CAST(max(depth) AS BIGINT) AS max_depth "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') GROUP BY host"
    )
    from fscrawler_ray.pipelines.crawl_report import (
        ADAPT_MAX_BUDGET,
        ADAPT_MIN_BUDGET,
        ADAPT_TARGET_BYTES,
    )

    sql["crawl_adaptive_budget"] = (
        "SELECT host, CAST(count(size) AS BIGINT) AS n_urls, "
        "CAST(quantile_disc(size, 0.875) AS BIGINT) AS p87_size, "
        f"CAST(LEAST(GREATEST({ADAPT_TARGET_BYTES} // "
        "GREATEST(CAST(quantile_disc(size, 0.875) AS BIGINT), 1), "
        f"{ADAPT_MIN_BUDGET}), {ADAPT_MAX_BUDGET}) AS BIGINT) AS budget "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') GROUP BY host"
    )
    # WARC export: the oracle PREDICTS each archive's on-disk size from
    # pure header-length arithmetic (fixed WARC/1.0 response skeleton +
    # the three variable fields rendered as decimal/UTF-8 strings +
    # payload + record terminator) over the same seq-ordered prefix-sum
    # shard assignment — while the engine reports os.path.getsize of the
    # real .warc files it wrote.  A one-byte writer drift breaks the hash.
    from fscrawler_ray.pipelines.sinks import WARC_CAP_BYTES, WARC_FIXED_BYTES

    _warc_rec = (
        "WITH t AS (SELECT CAST(seq AS BIGINT) AS seq, "
        "CAST(octet_length(bytes) AS BIGINT) AS nb, "
        "CAST(octet_length(encode(url)) AS BIGINT) AS ul "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') "
        "WHERE bytes IS NOT NULL), "
        "r AS (SELECT seq, nb, "
        "CAST(length(CAST(seq AS VARCHAR)) + ul + length(CAST(nb AS VARCHAR)) "
        f"+ nb + {WARC_FIXED_BYTES} AS BIGINT) AS rec FROM t), "
        "s AS (SELECT seq, nb, rec, "
        "CAST(COALESCE(sum(rec) OVER (ORDER BY seq "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        f"// {WARC_CAP_BYTES} AS BIGINT) AS shard FROM r) "
    )
    sql["crawl_warc_export"] = (
        _warc_rec
        + "SELECT shard, CAST(count(*) AS BIGINT) AS n_records, "
        "CAST(sum(nb) AS BIGINT) AS payload_bytes, "
        "CAST(sum(rec) AS BIGINT) AS warc_bytes FROM s GROUP BY shard"
    )
    from fscrawler_ray.pipelines.sinks import (
        WARC_REVISIT_FIXED_BYTES as _WARC_REV_FIXED,
    )

    sql["crawl_warc_revisit"] = (
        "WITH t AS (SELECT CAST(seq AS BIGINT) AS seq, "
        "CAST(octet_length(bytes) AS BIGINT) AS nb, "
        "CAST(octet_length(encode(url)) AS BIGINT) AS ul, image_id "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') "
        "WHERE bytes IS NOT NULL), "
        "o AS (SELECT *, min(seq) OVER (PARTITION BY image_id) AS orig FROM t), "
        "r AS (SELECT seq, nb, CAST(seq <> orig AS INT) AS rv, "
        "CASE WHEN seq = orig THEN "
        "CAST(length(CAST(seq AS VARCHAR)) + ul + length(CAST(nb AS VARCHAR)) "
        f"+ nb + {WARC_FIXED_BYTES} AS BIGINT) ELSE "
        "CAST(length(CAST(seq AS VARCHAR)) + ul + length(CAST(orig AS VARCHAR)) "
        f"+ {_WARC_REV_FIXED} AS BIGINT) END AS rec FROM o), "
        "s AS (SELECT seq, nb, rv, rec, "
        "CAST(COALESCE(sum(rec) OVER (ORDER BY seq "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        f"// {WARC_CAP_BYTES} AS BIGINT) AS shard FROM r) "
        "SELECT shard, CAST(count(*) AS BIGINT) AS n_records, "
        "CAST(sum(rv) AS BIGINT) AS n_revisits, "
        "CAST(sum(CASE WHEN rv = 0 THEN nb ELSE 0 END) AS BIGINT) AS payload_bytes, "
        "CAST(sum(rec) AS BIGINT) AS warc_bytes FROM s GROUP BY shard"
    )
    sql["crawl_url_features"] = (
        "WITH t AS (SELECT CAST(seq AS BIGINT) AS seq, "
        r"regexp_extract(url, '^[a-z]+://[^/?#]*([^?#]*)(\??[^#]*)', 1) AS p, "
        r"regexp_extract(url, '^[a-z]+://[^/?#]*([^?#]*)(\??[^#]*)', 2) AS q "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}_trace/part-*.parquet')), "
        "s AS (SELECT seq, CAST(length(p) AS BIGINT) AS path_len, "
        "CAST(len(regexp_extract_all(p, '/')) AS BIGINT) AS depth, "
        "CAST(len(regexp_extract_all(p, '[0-9]')) AS BIGINT) AS digit_chars, "
        "CAST(CASE WHEN q = '' THEN 0 ELSE len(regexp_extract_all(q, '&')) + 1 END "
        "AS BIGINT) AS n_params, "
        "CAST((SELECT coalesce(max(length(x.s)), 0) FROM "
        "unnest(string_split(p, '/')) AS x(s)) AS BIGINT) AS longest_segment FROM t) "
        "SELECT seq, path_len, depth, digit_chars, n_params, longest_segment, "
        "CAST(CASE WHEN depth > 6 OR digit_chars > 12 OR longest_segment > 40 "
        "THEN 1 ELSE 0 END AS BIGINT) AS spam_flag FROM s"
    )
    sql["crawl_growth_trend"] = (
        "WITH r AS (SELECT CAST(round AS BIGINT) AS rd, CAST(count(*) AS BIGINT) AS n "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') GROUP BY round), "
        "p AS (SELECT (b.n - a.n + 10000000 * (b.rd - a.rd)) * 1000000 // (b.rd - a.rd) AS s "
        "FROM r a JOIN r b ON b.rd > a.rd) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM r) AS n_rounds, "
        "CAST(count(*) AS BIGINT) AS n_pairs, "
        "CAST(coalesce(CAST(quantile_disc(s, 0.5) AS BIGINT) - 10000000000000, 0) AS BIGINT) "
        "AS slope_micro FROM p"
    )
    sql["crawl_size_integrity"] = (
        "SELECT host, CAST(count(*) AS BIGINT) AS n_payloads, "
        "CAST(sum(CASE WHEN size <> octet_length(bytes) THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_mismatch, CAST(sum(size) AS BIGINT) AS bytes_declared, "
        "CAST(sum(octet_length(bytes)) AS BIGINT) AS bytes_actual "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') "
        "WHERE bytes IS NOT NULL GROUP BY host"
    )
    # Bloom audit: replay bit positions (md5 hex chunks mod m), the
    # k-of-k membership test, and the FP tally.
    from fscrawler_ray.pipelines.crawl_report import BLOOM_AUDIT_M as _BLM

    sql["crawl_bloom_audit"] = (
        "WITH mem AS (SELECT url FROM read_parquet('"
        + CRAWL_ROLLUP_DIR
        + "_trace/part-*.parquet')), "
        "ds AS (SELECT unnest(generate_series(0, 3)) AS d), "
        "pos AS (SELECT DISTINCT CAST('0x' || substring(md5(url), 1 + 8 * d, 8) AS UBIGINT) "
        f"% {_BLM} AS p FROM mem CROSS JOIN ds), "
        "ph AS (SELECT url, d, CAST('0x' || substring(md5(url || '#probe'), 1 + 8 * d, 8) "
        f"AS UBIGINT) % {_BLM} AS p FROM mem CROSS JOIN ds), "
        "hit AS (SELECT url, count(*) AS c FROM ph JOIN pos USING (p) GROUP BY url), "
        "f AS (SELECT count(*) AS fp FROM hit WHERE c = 4), "
        "m AS (SELECT count(*) AS n FROM mem) "
        "SELECT CAST(m.n AS BIGINT) AS n_members, CAST(m.n AS BIGINT) AS n_probes, "
        "CAST(f.fp AS BIGINT) AS false_positives, "
        "CAST(f.fp * 1000000 // greatest(m.n, 1) AS BIGINT) AS fpr_micro FROM m, f"
    )
    # Host scorecard: three-way join of the quality / adaptive-budget /
    # politeness oracles + integer composite.
    from fscrawler_ray.pipelines.crawl_report import (
        ADAPT_MAX_BUDGET as _AMAX,
        ADAPT_MIN_BUDGET as _AMIN,
        ADAPT_TARGET_BYTES as _ATGT,
    )

    sql["crawl_host_scorecard"] = (
        "WITH q AS (SELECT host, CAST(count(*) AS BIGINT) AS n_images, "
        "CAST(sum(CASE WHEN w >= 48 AND h >= 48 AND 2 * greatest(w, h) <= 5 * least(w, h) "
        "AND len(regexp_extract_all(coalesce(caption, ''), '\\S+')) >= 3 "
        "THEN 1 ELSE 0 END) * 1000000 // greatest(count(*), 1) AS BIGINT) AS pass_rate_micro "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') GROUP BY host), "
        "b AS (SELECT host, "
        f"CAST(LEAST(GREATEST({_ATGT} // "
        "GREATEST(CAST(quantile_disc(size, 0.875) AS BIGINT), 1), "
        f"{_AMIN}), {_AMAX}) AS BIGINT) AS budget "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') GROUP BY host), "
        "p AS (SELECT host, CAST(max(n) AS BIGINT) AS max_per_round FROM "
        "(SELECT host, round, count(*) AS n "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') "
        "GROUP BY host, round) GROUP BY host) "
        "SELECT q.host, q.n_images, q.pass_rate_micro, b.budget, p.max_per_round, "
        f"CAST(q.pass_rate_micro * b.budget // {_AMAX} AS BIGINT) AS score_micro "
        "FROM q JOIN b USING (host) JOIN p USING (host)"
    )
    # Rendezvous sharding: replay the HRW argmax (md5 weights, ties →
    # smallest shard) at 8 and 10 shards with row_number windows.
    sql["crawl_rendezvous"] = (
        "WITH h AS (SELECT DISTINCT host "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')), "
        "e AS (SELECT host, s, md5_number_upper(host || '|' || CAST(s AS VARCHAR)) AS w "
        "FROM h CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS s)), "
        "r8 AS (SELECT host, s, row_number() OVER (PARTITION BY host "
        "ORDER BY w DESC, s) AS rk FROM e WHERE s < 8), "
        "r10 AS (SELECT host, s, row_number() OVER (PARTITION BY host "
        "ORDER BY w DESC, s) AS rk FROM e) "
        "SELECT a.host, CAST(a.s AS BIGINT) AS shard, CAST(b.s AS BIGINT) AS shard_grown, "
        "CAST(CASE WHEN a.s <> b.s THEN 1 ELSE 0 END AS BIGINT) AS moved "
        "FROM r8 a JOIN r10 b ON b.host = a.host AND b.rk = 1 WHERE a.rk = 1"
    )
    # URL template mining: replay path extraction + digit-run collapse +
    # grouped moments in DuckDB RE2.
    sql["crawl_url_templates"] = (
        "WITH t AS (SELECT host, CAST(depth AS BIGINT) AS depth, "
        r"regexp_extract(url, '^[a-z]+://[^/?#]*([^?#]*)', 1) AS p0 "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')), "
        "r AS (SELECT host, depth, regexp_replace("
        "CASE WHEN p0 = '' THEN '/' ELSE p0 END, '[0-9]+', 'N', 'g') AS template FROM t) "
        "SELECT host, template, CAST(count(*) AS BIGINT) AS n_urls, "
        "CAST(sum(depth) AS BIGINT) AS depth_sum, "
        "CAST(sum(depth * depth) AS BIGINT) AS depth_sq_sum "
        "FROM r GROUP BY host, template HAVING count(*) >= 3"
    )
    # Sitemap export: predict the REAL on-disk XML sizes from escaped-URL
    # byte-length arithmetic and replay the per-host rank→file assignment
    # with ROW_NUMBER; the roundtrip certifies the parsed-back rows
    # against the same independent assignment.
    from fscrawler_ray.pipelines.sinks import (
        SITEMAP_FOOTER,
        SITEMAP_HEADER,
        SITEMAP_ROW_FIXED,
    )

    _sm_fixed = len(SITEMAP_HEADER) + len(SITEMAP_FOOTER)
    _sm_esc = "replace(replace(replace(url,'&','&amp;'),'<','&lt;'),'>','&gt;')"
    _sm_src = (
        "WITH t AS (SELECT CAST(seq AS BIGINT) AS seq, host, url "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')), "
        "r AS (SELECT host, seq, url, "
        f"CAST(octet_length(encode({_sm_esc})) + {SITEMAP_ROW_FIXED} AS BIGINT) AS row_bytes, "
        "CAST((ROW_NUMBER() OVER (PARTITION BY host ORDER BY seq) - 1) "
        "// 100 AS BIGINT) AS f FROM t) "
    )
    sql["crawl_sitemap_export"] = (
        _sm_src
        + "SELECT host, f AS file_idx, CAST(count(*) AS BIGINT) AS n_urls, "
        f"CAST(sum(row_bytes) + {_sm_fixed} AS BIGINT) AS xml_bytes "
        "FROM r GROUP BY host, f"
    )
    sql["crawl_sitemap_roundtrip"] = _sm_src + "SELECT host, f AS file_idx, url FROM r"
    # incremental maintenance: recompute the post-edit assignment and
    # sizes; rewritten = host had a deleted row
    sql["crawl_sitemap_incremental"] = (
        "WITH t AS (SELECT CAST(seq AS BIGINT) AS seq, host, url "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')), "
        "aff AS (SELECT DISTINCT host FROM t WHERE seq % 23 = 0), "
        "e AS (SELECT * FROM t WHERE seq % 23 <> 0), "
        "r AS (SELECT host, seq, "
        f"CAST(octet_length(encode({_sm_esc})) + {SITEMAP_ROW_FIXED} AS BIGINT) AS row_bytes, "
        "CAST((ROW_NUMBER() OVER (PARTITION BY host ORDER BY seq) - 1) "
        "// 100 AS BIGINT) AS f FROM e) "
        "SELECT r.host, r.f AS file_idx, CAST(count(*) AS BIGINT) AS n_urls, "
        f"CAST(sum(row_bytes) + {_sm_fixed} AS BIGINT) AS xml_bytes, "
        "CAST(CASE WHEN r.host IN (SELECT host FROM aff) THEN 1 ELSE 0 END AS BIGINT) "
        "AS rewritten FROM r GROUP BY r.host, r.f"
    )
    # CDX index: replay the full archive-layout arithmetic — exact record
    # size, global running byte prefix, shard = floor(prefix/cap), offset
    # = prefix − the shard's first prefix — in DuckDB window functions.
    sql["crawl_cdx_index"] = (
        "WITH t AS (SELECT CAST(seq AS BIGINT) AS seq, url, "
        "CAST(octet_length(bytes) AS BIGINT) AS nb, "
        "CAST(octet_length(encode(url)) AS BIGINT) AS ul "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') "
        "WHERE bytes IS NOT NULL), "
        "r AS (SELECT seq, url, "
        "CAST(length(CAST(seq AS VARCHAR)) + ul + length(CAST(nb AS VARCHAR)) "
        f"+ nb + {WARC_FIXED_BYTES} AS BIGINT) AS rec FROM t), "
        "s AS (SELECT seq, url, rec, "
        "CAST(COALESCE(sum(rec) OVER (ORDER BY seq "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pfx FROM r) "
        "SELECT seq, url, "
        f"CAST(pfx // {WARC_CAP_BYTES} AS BIGINT) AS shard, "
        "CAST(pfx - min(pfx) OVER "
        f"(PARTITION BY pfx // {WARC_CAP_BYTES}) AS BIGINT) AS off, "
        "rec AS rlen FROM s"
    )
    sql["crawl_cdx_fetch"] = (
        "SELECT CAST(seq AS BIGINT) AS seq, url, "
        "CAST(octet_length(bytes) AS BIGINT) AS nbytes, "
        "md5(hex(bytes)) AS payload_md5 "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') "
        "WHERE bytes IS NOT NULL AND seq % 13 = 0"
    )
    # URL canonicalization: the oracle rebuilds the SAME seq-keyed dirty
    # variant the engine builds, then replays the entire canonicalization
    # pipeline (lowercase scheme+host, scheme-aware :80 strip, fragment
    # drop, path/query split, //+ collapse, dot-segment resolution,
    # trailing-slash strip) with DuckDB string/RE2 kernels.  The injected
    # dirt is bounded (one dot segment per row), so one unrolled pass per
    # rule reaches the engine loop's fixpoint.
    _head_re = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
    sql["crawl_url_canonical"] = (
        "WITH t AS (SELECT CAST(seq AS BIGINT) AS seq, url, "
        f"regexp_extract(url, '{_head_re[1:]}', 1) AS head, "
        f"regexp_extract(url, '{_head_re[1:]}([^#]*)', 2) AS rest "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}_trace/part-*.parquet')), "
        "d AS (SELECT seq, CASE CAST(seq % 7 AS INT) "
        "WHEN 0 THEN url "
        "WHEN 1 THEN upper(head) || rest "
        "WHEN 2 THEN url || '#sec' || CAST(seq AS VARCHAR) "
        "WHEN 3 THEN head || ':80' || rest "
        "WHEN 4 THEN head || '//./' || ltrim(rest, '/') "
        "WHEN 5 THEN head || '/zz/..' || CASE WHEN rest = '' THEN '/' ELSE rest END "
        "ELSE url || '?b=2&a=1' END AS dirty FROM t), "
        "c AS (SELECT seq, dirty, "
        f"lower(regexp_extract(dirty, '{_head_re[1:]}', 1)) AS h0, "
        f"regexp_extract(dirty, '{_head_re[1:]}([^#]*)', 2) AS r0 FROM d), "
        "c1 AS (SELECT seq, dirty, "
        r"regexp_replace(regexp_replace(h0, '^(http://.*):80$', '\1'), "
        r"'^(https://.*):443$', '\1') AS h1, "
        r"regexp_extract(r0, '^([^?]*)', 1) AS path0, "
        r"regexp_extract(r0, '(\?.*)$', 1) AS q0 FROM c), "
        "c2 AS (SELECT seq, dirty, h1, q0, "
        r"regexp_replace(CASE WHEN path0 = '' THEN '/' ELSE path0 END, '//+', '/', 'g') "
        "AS p2 FROM c1), "
        "c3 AS (SELECT seq, dirty, h1, q0, "
        r"regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        r"regexp_replace(regexp_replace("
        r"p2, '/\./', '/', 'g'), '/[^/]+/\.\./', '/', 'g'), '^/\.\./', '/'), "
        r"'^/\.\.$', '/'), '/\.$', '/'), '/[^/]+/\.\.$', '/'), '(.)/$', '\1') AS p9 "
        "FROM c2) "
        "SELECT seq, dirty AS url_dirty, h1 || p9 || q0 AS url_canonical FROM c3"
    )
    sql["crawl_warc_roundtrip"] = (
        "SELECT CAST(seq AS BIGINT) AS seq, url, "
        "CAST(octet_length(bytes) AS BIGINT) AS nbytes, "
        "md5(hex(bytes)) AS payload_md5 "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') "
        "WHERE bytes IS NOT NULL"
    )
    sql["crawl_depth_funnel"] = (
        "SELECT CAST(depth AS BIGINT) AS depth, CAST(count(*) AS BIGINT) AS files, "
        "CAST(sum(COALESCE(size, 0)) AS BIGINT) AS total_bytes "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') GROUP BY depth"
    )
    from fscrawler_ray.pipelines.crawl_report import (
        TIER_BANDS,
        TIER_BUDGET,
        TIER_FLOOR,
        TIER_PRIMES,
    )

    _k = len(TIER_PRIMES)
    _ch = " + ".join(
        f"CASE WHEN (seq + {t}) % {p} = 0 THEN 1 ELSE 0 END"
        for t, p in enumerate(TIER_PRIMES, 1)
    )
    _tier_case = (
        "CASE "
        + " ".join(f"WHEN rate_micro >= {lo} THEN '{nm}'" for nm, lo, _ in TIER_BANDS)
        + f" ELSE '{TIER_FLOOR[0]}' END"
    )
    _w_case = (
        "CASE tier "
        + " ".join(f"WHEN '{nm}' THEN {w}" for nm, _, w in TIER_BANDS)
        + f" ELSE {TIER_FLOOR[1]} END"
    )
    sql["crawl_tier_plan"] = (
        f"WITH c AS (SELECT host, {_ch} AS ch "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')), "
        "h AS (SELECT host, CAST(count(*) AS BIGINT) AS n_urls, "
        "CAST(sum(ch) AS BIGINT) AS changes FROM c GROUP BY host), "
        f"hr AS (SELECT *, changes * 1000000 // (n_urls * {_k}) AS rate_micro FROM h), "
        f"ht AS (SELECT *, {_tier_case} AS tier FROM hr), "
        f"hw AS (SELECT *, {_w_case} AS w FROM ht), "
        "tt AS (SELECT tier, SUM(n_urls) AS tier_urls, SUM(w * n_urls) AS tier_mass "
        "FROM hw GROUP BY tier), "
        f"tq AS (SELECT tier, tier_urls, {TIER_BUDGET} * tier_mass "
        "// (SELECT SUM(tier_mass) FROM tt) AS tier_quota FROM tt) "
        "SELECT hw.host, hw.n_urls, hw.changes, CAST(hw.rate_micro AS BIGINT) AS rate_micro, "
        "hw.tier, CAST(tq.tier_quota * hw.n_urls // tq.tier_urls AS BIGINT) AS budget "
        "FROM hw JOIN tq USING (tier)"
    )
    # two-cycle tier-crawl cert: replay the plan over cycle 1's written
    # snapshot, then check budget conservation + coverage over both traces
    _recrawl_plan = (
        f"c AS (SELECT host, {_ch} AS ch "
        f"FROM read_parquet('{RECRAWL_C1_DIR}/round=*/table-*/*.parquet')), "
        "h AS (SELECT host, CAST(count(*) AS BIGINT) AS n_urls, "
        "CAST(sum(ch) AS BIGINT) AS changes FROM c GROUP BY host), "
        f"hr AS (SELECT *, changes * 1000000 // (n_urls * {_k}) AS rate_micro FROM h), "
        f"ht AS (SELECT *, {_tier_case} AS tier FROM hr), "
        f"hw AS (SELECT *, {_w_case} AS w FROM ht), "
        "tt AS (SELECT tier, SUM(n_urls) AS tier_urls, SUM(w * n_urls) AS tier_mass "
        "FROM hw GROUP BY tier), "
        f"tq AS (SELECT tier, tier_urls, {TIER_BUDGET} * tier_mass "
        "// (SELECT SUM(tier_mass) FROM tt) AS tier_quota FROM tt), "
        "hb AS (SELECT hw.host, CAST(tq.tier_quota * hw.n_urls // tq.tier_urls AS BIGINT) AS budget "
        "FROM hw JOIN tq USING (tier)), "
        f"t1 AS (SELECT DISTINCT url FROM read_parquet('{RECRAWL_C1_DIR}_trace/part-*.parquet')), "
        f"t2 AS (SELECT DISTINCT url FROM read_parquet('{RECRAWL_C2_DIR}_trace/part-*.parquet'))"
    )
    sql["crawl_recrawl_cycle"] = (
        "WITH " + _recrawl_plan + " "
        "SELECT CAST((SELECT count(*) FROM t1) AS BIGINT) AS urls_cycle1, "
        "CAST((SELECT count(*) FROM t2) AS BIGINT) AS urls_cycle2, "
        "CAST((SELECT count(*) FROM t1 JOIN t2 USING (url)) AS BIGINT) AS urls_shared, "
        "CAST((SELECT sum(budget) FROM hb) AS BIGINT) AS total_alloc, "
        f"CAST({TIER_BUDGET} AS BIGINT) AS budget_cap, "
        f"CAST((SELECT sum(budget) FROM hb) <= {TIER_BUDGET} AS BIGINT) AS alloc_within_cap, "
        "CAST((SELECT count(*) FROM hb) AS BIGINT) AS hosts_total, "
        "CAST((SELECT count(*) FROM hb WHERE budget < (SELECT max(budget) FROM hb)) AS BIGINT) AS hosts_throttled"
    )
    sql["crawl_host_quality"] = (
        "WITH f AS (SELECT host, "
        "CASE WHEN w >= 48 AND h >= 48 AND 2 * greatest(w, h) <= 5 * least(w, h) "
        "AND len(regexp_extract_all(coalesce(caption, ''), '\\S+')) >= 3 "
        "THEN 1 ELSE 0 END AS ok "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')) "
        "SELECT host, CAST(count(*) AS BIGINT) AS n_images, "
        "CAST(sum(ok) AS BIGINT) AS n_pass, "
        "CAST(sum(ok) * 1000000 // greatest(count(*), 1) AS BIGINT) AS pass_rate_micro "
        "FROM f GROUP BY host"
    )
    sql["crawl_politeness_audit"] = (
        "WITH pr AS (SELECT host, round, CAST(count(*) AS BIGINT) AS n "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') GROUP BY host, round) "
        "SELECT host, CAST(max(n) AS BIGINT) AS max_per_round FROM pr GROUP BY host"
    )
    sql["crawl_content_groups"] = (
        "SELECT image_id, CAST(count(*) AS BIGINT) AS copies, min(url) AS first_url, "
        "CAST(min(size) AS BIGINT) AS size "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') GROUP BY image_id"
    )
    sql["crawl_prefix_rollup"] = (
        "WITH rows_ AS (SELECT url, COALESCE(CAST(size AS BIGINT), 0) AS size, "
        "string_split(url, '/') AS segs "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')), "
        "pref AS (SELECT array_to_string(list_slice(segs, 1, i), '/') AS prefix, size "
        "FROM rows_, unnest(generate_series(3, len(segs) - 1)) t(i)) "
        "SELECT prefix, CAST(count(*) AS BIGINT) AS files, CAST(sum(size) AS BIGINT) AS total_bytes "
        "FROM pref GROUP BY prefix"
    )
    sql["host_pagerank_exact"] = _host_pagerank_oracle()
    sql["host_hits"] = _host_hits_oracle()
    sql["host_ppr"] = _host_ppr_oracle()
    sql["host_opic"] = _host_opic_oracle()
    sql["host_communities"] = _host_lp_oracle()
    from fscrawler_ray.pipelines.crawl_report import OPIC_BUDGET as _OPIC_B

    from fscrawler_ray.pipelines.crawl_report import (
        CRAWLDELAY_ROUND_SECONDS as _CD_SECS,
    )

    sql["crawl_opic_cycle"] = (
        "WITH sc AS MATERIALIZED (SELECT host, CAST(score AS HUGEINT) AS s FROM ("
        + _host_opic_oracle(edges_dir=HOST_OPICC_EDGES_DIR)
        + ") opic_t), "
        "tot AS (SELECT sum(s) AS tot FROM sc), "
        f"a AS (SELECT host, s, ({_OPIC_B} * s) // tot.tot AS a0, "
        f"({_OPIC_B} * s) % tot.tot AS rem FROM sc, tot), "
        f"xs AS (SELECT CAST({_OPIC_B} AS HUGEINT) - sum(a0) AS extra FROM a), "
        "r AS (SELECT host, a0, rem, row_number() OVER (ORDER BY rem DESC, host ASC) AS rn FROM a), "
        "qd AS (SELECT r.host, r.a0 + CASE WHEN r.rn <= xs.extra THEN 1 ELSE 0 END AS quota "
        "FROM r, xs), "
        "agg AS (SELECT CAST(sum(quota) AS BIGINT) AS sum_q, CAST(count(*) AS BIGINT) AS nh, "
        f"CAST(sum(CASE WHEN quota < {_OPIC_B} // (SELECT count(*) FROM qd) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS thr FROM qd), "
        f"t1 AS (SELECT DISTINCT url FROM read_parquet('{OPIC_C1_DIR}_trace/part-*.parquet')), "
        f"t2 AS (SELECT DISTINCT url FROM read_parquet('{OPIC_C2_DIR}_trace/part-*.parquet')) "
        "SELECT CAST((SELECT count(*) FROM t1) AS BIGINT) AS urls_cycle1, "
        "CAST((SELECT count(*) FROM t2) AS BIGINT) AS urls_cycle2, "
        "CAST((SELECT count(*) FROM (SELECT url FROM t1 INTERSECT SELECT url FROM t2)) AS BIGINT) "
        "AS urls_shared, "
        "agg.sum_q AS sum_quota, "
        f"CAST({_OPIC_B} AS BIGINT) AS quota_budget, "
        f"CAST(CASE WHEN agg.sum_q = {_OPIC_B} THEN 1 ELSE 0 END AS BIGINT) AS quota_exact, "
        "agg.nh AS hosts_total, agg.thr AS hosts_throttled FROM agg"
    )
    sql["crawl_starvation_audit"] = (
        "WITH d AS (SELECT DISTINCT host, CAST(round AS BIGINT) AS round "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')), "
        "g AS (SELECT host, round, round - lag(round) OVER "
        "(PARTITION BY host ORDER BY round) AS gap FROM d) "
        "SELECT host, CAST(count(*) AS BIGINT) AS n_active_rounds, "
        "CAST(min(round) AS BIGINT) AS first_round, CAST(max(round) AS BIGINT) AS last_round, "
        "CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap FROM g GROUP BY host"
    )
    sql["crawl_merkle_diff"] = (
        "WITH spine AS (SELECT unnest(generate_series(0, 15)) AS bucket), "
        "c AS (SELECT CAST(md5_number_upper(url) % 16 AS BIGINT) AS bucket, url, "
        "md5(url || ':' || CAST(size AS VARCHAR)) AS leaf "
        f"FROM read_parquet('{CDC_CUR_DIR}/*.parquet')), "
        "p AS (SELECT CAST(md5_number_upper(url) % 16 AS BIGINT) AS bucket, url, "
        "md5(url || ':' || CAST(size AS VARCHAR)) AS leaf "
        f"FROM read_parquet('{CDC_PREV_DIR}/*.parquet')), "
        "cb AS (SELECT bucket, md5(string_agg(leaf, '' ORDER BY url)) AS h, count(*) AS n "
        "FROM c GROUP BY bucket), "
        "pb AS (SELECT bucket, md5(string_agg(leaf, '' ORDER BY url)) AS h, count(*) AS n "
        "FROM p GROUP BY bucket) "
        "SELECT CAST(spine.bucket AS BIGINT) AS bucket, "
        "coalesce(cb.h, md5('')) AS cur_hash, coalesce(pb.h, md5('')) AS prev_hash, "
        "CAST(coalesce(cb.n, 0) AS BIGINT) AS n_cur, CAST(coalesce(pb.n, 0) AS BIGINT) AS n_prev, "
        "CAST(CASE WHEN coalesce(cb.h, md5('')) <> coalesce(pb.h, md5('')) THEN 1 ELSE 0 END "
        "AS BIGINT) AS differs "
        "FROM spine LEFT JOIN cb ON cb.bucket = spine.bucket "
        "LEFT JOIN pb ON pb.bucket = spine.bucket"
    )
    sql["crawl_merkle_sync"] = (
        "WITH c AS MATERIALIZED (SELECT url, size, "
        "CAST(md5_number_upper(url) % 16 AS BIGINT) AS bucket, "
        "md5(url || ':' || CAST(size AS VARCHAR)) AS leaf "
        f"FROM read_parquet('{CDC_CUR_DIR}/*.parquet')), "
        "p AS MATERIALIZED (SELECT url, size, "
        "CAST(md5_number_upper(url) % 16 AS BIGINT) AS bucket, "
        "md5(url || ':' || CAST(size AS VARCHAR)) AS leaf "
        f"FROM read_parquet('{CDC_PREV_DIR}/*.parquet')), "
        "cb AS (SELECT bucket, md5(string_agg(leaf, '' ORDER BY url)) AS h FROM c GROUP BY bucket), "
        "pb AS (SELECT bucket, md5(string_agg(leaf, '' ORDER BY url)) AS h FROM p GROUP BY bucket), "
        "spine AS (SELECT unnest(generate_series(0, 15)) AS bucket), "
        "dd AS (SELECT CAST(spine.bucket AS BIGINT) AS bucket, "
        "CASE WHEN coalesce(cb.h, md5('')) <> coalesce(pb.h, md5('')) THEN 1 ELSE 0 END AS differs "
        "FROM spine LEFT JOIN cb ON cb.bucket = spine.bucket "
        "LEFT JOIN pb ON pb.bucket = spine.bucket), "
        "syn AS (SELECT url, size FROM p WHERE bucket NOT IN (SELECT bucket FROM dd WHERE differs = 1) "
        "UNION ALL SELECT url, size FROM c WHERE bucket IN (SELECT bucket FROM dd WHERE differs = 1)), "
        "ck AS (SELECT "
        "(SELECT CAST(sum(md5_number_upper(url || ':' || CAST(size AS VARCHAR)) % 1000000000000) "
        "AS HUGEINT) FROM c) AS cur_ck, "
        "(SELECT CAST(sum(md5_number_upper(url || ':' || CAST(size AS VARCHAR)) % 1000000000000) "
        "AS HUGEINT) FROM syn) AS syn_ck, "
        "(SELECT count(*) FROM c) AS n_cur, (SELECT count(*) FROM syn) AS n_syn, "
        "(SELECT CAST(sum(differs) AS BIGINT) FROM dd) AS nd) "
        "SELECT CAST(16 AS BIGINT) AS n_buckets, ck.nd AS n_diff_buckets, "
        "CAST(ck.n_cur AS BIGINT) AS n_cur, CAST(ck.n_syn AS BIGINT) AS n_synced, "
        "CAST(ck.cur_ck AS BIGINT) AS cur_checksum, CAST(ck.syn_ck AS BIGINT) AS synced_checksum, "
        "CAST(CASE WHEN ck.cur_ck = ck.syn_ck AND ck.n_cur = ck.n_syn THEN 1 ELSE 0 END AS BIGINT) "
        "AS sync_ok FROM ck"
    )
    sql["crawl_checkpoint_audit"] = (
        f"WITH m AS (SELECT * FROM read_json_auto('{CKPT_DIR}/manifest.json')), "
        f"tr AS (SELECT count(*) AS n, max(seq) AS mx FROM read_parquet('{CKPT_RUN_DIR}_trace/part-*.parquet')), "
        f"sn AS (SELECT count(*) AS n FROM read_parquet('{CKPT_DIR}/trace/part-*.parquet')), "
        f"sp AS (SELECT count(*) AS n FROM read_parquet('{CKPT_RUN_DIR}/round=*/table-*/*.parquet')), "
        "lin AS (SELECT "
        "list_aggregate(list_transform(m.lineage, x -> x.\"round\"), 'min') AS lmin, "
        "list_aggregate(list_transform(m.lineage, x -> x.\"round\"), 'max') AS lmax, "
        "len(m.lineage) AS llen, "
        "list_aggregate(list_transform(m.lineage, x -> x.enqueued), 'sum') AS enq FROM m) "
        "SELECT CAST(m.round AS BIGINT) AS manifest_round, CAST(lin.lmin AS BIGINT) AS lin_min, "
        "CAST(lin.lmax AS BIGINT) AS lin_max, CAST(lin.llen AS BIGINT) AS lineage_len, "
        "CAST(m.n_shards AS BIGINT) AS n_shards, CAST(m.seq_offset AS BIGINT) AS seq_offset, "
        "CAST(tr.n AS BIGINT) AS trace_rows, CAST(tr.mx AS BIGINT) AS max_seq, "
        "CAST(sn.n AS BIGINT) AS snap_rows, CAST(m.result_rows AS BIGINT) AS result_rows, "
        "CAST(sp.n AS BIGINT) AS spool_rows, CAST(lin.enq AS BIGINT) AS enqueued_total, "
        "CAST(CASE WHEN m.seq_offset = tr.n AND tr.n = tr.mx + 1 AND tr.n = sn.n "
        "AND m.result_rows = sp.n AND lin.llen = m.n_shards "
        "AND lin.lmin = m.round AND lin.lmax = m.round THEN 1 ELSE 0 END AS BIGINT) AS ok "
        "FROM m, tr, sn, sp, lin"
    )
    sql["crawl_delay_audit"] = (
        "WITH pr AS (SELECT host, round, CAST(count(*) AS BIGINT) AS n "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') GROUP BY host, round), "
        "mx AS (SELECT host, max(n) AS mx FROM pr GROUP BY host), "
        "d AS (SELECT host, mx, CASE md5_number_upper(host) % 5 "
        "WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 4 ELSE 8 END AS delay_s FROM mx) "
        "SELECT host, CAST(delay_s AS BIGINT) AS delay_s, CAST(mx AS BIGINT) AS max_per_round, "
        f"CAST(CASE WHEN delay_s > 0 THEN {_CD_SECS} // delay_s ELSE -1 END AS BIGINT) AS cap, "
        f"CAST(CASE WHEN delay_s = 0 OR mx <= {_CD_SECS} // GREATEST(delay_s, 1) "
        "THEN 1 ELSE 0 END AS BIGINT) AS compliant FROM d"
    )
    sql["crawl_cdc_replay"] = (
        f"WITH cur AS MATERIALIZED (SELECT url, size FROM read_parquet('{CDC_CUR_DIR}/*.parquet')), "
        f"prev AS MATERIALIZED (SELECT url, size FROM read_parquet('{CDC_PREV_DIR}/*.parquet')), "
        "d AS MATERIALIZED (SELECT coalesce(c.url, p.url) AS url, c.size AS cs, p.size AS ps, "
        "c.url IS NOT NULL AS hc, p.url IS NOT NULL AS hp "
        "FROM cur c FULL OUTER JOIN prev p ON c.url = p.url), "
        "ups AS MATERIALIZED (SELECT url, cs AS size FROM d WHERE hc AND (NOT hp OR cs <> ps)), "
        "dels AS MATERIALIZED (SELECT url FROM d WHERE hp AND NOT hc), "
        "touched AS (SELECT url FROM ups UNION ALL SELECT url FROM dels), "
        "replay AS MATERIALIZED (SELECT url, size FROM prev "
        "WHERE url NOT IN (SELECT url FROM touched) "
        "UNION ALL SELECT url, size FROM ups), "
        "ck AS (SELECT "
        "(SELECT CAST(sum(md5_number_upper(url || ':' || CAST(size AS VARCHAR)) "
        "% 1000000000000) AS HUGEINT) FROM cur) AS cur_ck, "
        "(SELECT CAST(sum(md5_number_upper(url || ':' || CAST(size AS VARCHAR)) "
        "% 1000000000000) AS HUGEINT) FROM replay) AS rep_ck, "
        "(SELECT count(*) FROM cur) AS n_cur, "
        "(SELECT count(*) FROM replay) AS n_rep, "
        "(SELECT count(*) FROM prev) AS n_prev, "
        "(SELECT count(*) FROM ups) AS n_ups, "
        "(SELECT count(*) FROM dels) AS n_dels) "
        "SELECT CAST(n_ups AS BIGINT) AS n_upserts, CAST(n_dels AS BIGINT) AS n_deletes, "
        "CAST(n_prev AS BIGINT) AS n_prev, CAST(n_cur AS BIGINT) AS n_cur, "
        "CAST(n_rep AS BIGINT) AS n_replayed, "
        "CAST(cur_ck AS BIGINT) AS cur_checksum, CAST(rep_ck AS BIGINT) AS replay_checksum, "
        "CAST(CASE WHEN cur_ck = rep_ck AND n_cur = n_rep THEN 1 ELSE 0 END AS BIGINT) AS replay_ok "
        "FROM ck"
    )
    sql["host_modularity"] = (
        "WITH lp AS (SELECT * FROM ("
        + _host_lp_oracle(edges_dir=HOST_MOD_EDGES_DIR)
        + ") lp_t), "
        "raw2 AS (SELECT src_host AS s, dst_host AS t "
        f"FROM read_parquet('{HOST_MOD_EDGES_DIR}/*.parquet') WHERE src_host <> dst_host), "
        "simple AS (SELECT DISTINCT least(s, t) AS u, greatest(s, t) AS v FROM raw2), "
        "mm AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM simple), "
        "fl AS (SELECT lu.label AS cu, lv.label AS cv FROM simple "
        "JOIN lp lu ON lu.host = simple.u JOIN lp lv ON lv.host = simple.v), "
        "dc AS (SELECT label, CAST(count(*) AS HUGEINT) AS d FROM "
        "(SELECT cu AS label FROM fl UNION ALL SELECT cv FROM fl) GROUP BY label), "
        "ec AS (SELECT cu AS label, CAST(count(*) AS HUGEINT) AS e FROM fl "
        "WHERE cu = cv GROUP BY cu), "
        "acc AS (SELECT CAST(sum(4 * mm.m * coalesce(ec.e, 0) - dc.d * dc.d) AS HUGEINT) AS num, "
        "CAST(count(*) AS BIGINT) AS nc FROM dc LEFT JOIN ec USING (label), mm GROUP BY mm.m) "
        "SELECT CAST(mm.m AS BIGINT) AS m, acc.nc AS n_communities, "
        "CAST(1000000 * acc.num // (4 * mm.m * mm.m) AS BIGINT) AS q_micro FROM mm, acc"
    )
    sql["crawl_anchor_text"] = (
        "WITH e AS (SELECT dst FROM "
        f"read_parquet('{ANCHOR_EDGES_DIR}/*.parquet')), "
        "seg AS (SELECT regexp_extract(dst, '://([^/]+)', 1) AS host, "
        "regexp_extract(dst, '[^/]*$') AS s FROM e), "
        "t AS (SELECT host, unnest(string_split_regex(s, '[^A-Za-z0-9]+')) AS term FROM seg), "
        "c AS (SELECT host, term, count(*) AS cnt FROM t WHERE term <> '' GROUP BY 1, 2), "
        "r AS (SELECT host, term, cnt, "
        "row_number() OVER (PARTITION BY host ORDER BY cnt DESC, term) AS rnk FROM c) "
        "SELECT host, term, CAST(cnt AS BIGINT) AS cnt, CAST(rnk AS BIGINT) AS rnk "
        "FROM r WHERE rnk <= 3"
    )
    sql["crawl_opic_budget"] = (
        "WITH sc AS MATERIALIZED (SELECT host, CAST(score AS HUGEINT) AS s FROM ("
        + _host_opic_oracle(edges_dir=HOST_OPICB_EDGES_DIR)
        + ") opic_t), "
        "tot AS (SELECT sum(s) AS tot FROM sc), "
        f"a AS (SELECT host, s, ({_OPIC_B} * s) // tot.tot AS a0, "
        f"({_OPIC_B} * s) % tot.tot AS rem FROM sc, tot), "
        f"xs AS (SELECT CAST({_OPIC_B} AS HUGEINT) - sum(a0) AS extra FROM a), "
        "r AS (SELECT host, s, a0, rem, "
        "row_number() OVER (ORDER BY rem DESC, host ASC) AS rn FROM a) "
        "SELECT r.host, CAST(r.s AS BIGINT) AS opic_score, "
        "CAST(r.a0 + CASE WHEN r.rn <= xs.extra THEN 1 ELSE 0 END AS BIGINT) AS quota, "
        "CAST(CASE WHEN r.rn <= xs.extra THEN 1 ELSE 0 END AS BIGINT) AS bonus "
        "FROM r, xs"
    )
    sql["host_reciprocity"] = (
        "WITH e AS (SELECT DISTINCT src_host AS s, dst_host AS t "
        f"FROM read_parquet('{HOST_REC_EDGES_DIR}/*.parquet')), "
        "n AS (SELECT count(*) AS ne FROM e WHERE s <> t), "
        "l AS (SELECT count(*) AS nl FROM e WHERE s = t), "
        "r AS (SELECT count(*) AS nr FROM e a JOIN e b ON b.s = a.t AND b.t = a.s "
        "WHERE a.s <> a.t) "
        "SELECT CAST(n.ne AS BIGINT) AS n_edges, CAST(l.nl AS BIGINT) AS n_self_loops, "
        "CAST(r.nr AS BIGINT) AS n_reciprocal, "
        "CAST(r.nr * 1000000 // greatest(n.ne, 1) AS BIGINT) AS reciprocity_micro "
        "FROM n, l, r"
    )
    sql["crawl_host_bfs"] = (
        "WITH RECURSIVE e AS (SELECT DISTINCT src_host AS s, dst_host AS d "
        f"FROM read_parquet('{HOST_EDGES_DIR}/*.parquet')), "
        "seed AS (SELECT min(s) AS h FROM e), "
        # recursive UNION (distinct) — a cyclic host graph under UNION ALL
        # would enumerate paths, not nodes; distinct (host, dist) rows are
        # bounded by |hosts| × 32
        "walk(host, dist) AS (SELECT h, 0 FROM seed WHERE h IS NOT NULL "
        "UNION SELECT e.d, w.dist + 1 FROM walk w JOIN e ON e.s = w.host "
        "WHERE w.dist < 32) "
        "SELECT host, CAST(min(dist) AS BIGINT) AS dist FROM walk GROUP BY host"
    )
    sql["crawl_host_degree_exact"] = (
        "WITH o AS (SELECT src_host AS host, count(*) AS outd "
        f"FROM read_parquet('{HOST_EDGES_DIR}/*.parquet') GROUP BY src_host), "
        "i AS (SELECT dst_host AS host, count(*) AS ind "
        f"FROM read_parquet('{HOST_EDGES_DIR}/*.parquet') GROUP BY dst_host) "
        "SELECT COALESCE(o.host, i.host) AS host, "
        "CAST(COALESCE(o.outd, 0) AS BIGINT) AS out_links, "
        "CAST(COALESCE(i.ind, 0) AS BIGINT) AS in_links "
        "FROM o FULL OUTER JOIN i ON o.host = i.host"
    )
    # EXIF-analog report: the engine PARSES the binary metadata segment out
    # of each payload; the oracle re-derives the same fields from image_id's
    # hex (= low 40 bits of the payload seed, the generator's EXIF source —
    # sources/synthweb.exif_fields_for)
    sql["crawl_exif_report"] = (
        "WITH ps AS (SELECT CAST('0x' || substr(image_id, 5) AS UBIGINT) AS s "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')), "
        "ex AS (SELECT 1 + s % 8 AS exif_orientation, "
        "CASE (s >> 3) % 8 WHEN 0 THEN 'Acme DX-100' WHEN 1 THEN 'Acme DX-200' "
        "WHEN 2 THEN 'Borealis Z5' WHEN 3 THEN 'Borealis Z9' WHEN 4 THEN 'Crater Mini' "
        "WHEN 5 THEN 'Crater Pro' WHEN 6 THEN 'Dune 4K' ELSE 'Dune 8K' END AS exif_camera, "
        "1700000000000000 - ((s >> 6) % 31536000) * 1000000 AS captured_us FROM ps) "
        "SELECT exif_camera, CAST(exif_orientation AS BIGINT) AS exif_orientation, "
        "CAST(count(*) AS BIGINT) AS shots, CAST(max(captured_us) AS BIGINT) AS last_capture_us "
        "FROM ex GROUP BY exif_camera, exif_orientation"
    )
    # IPTC-analog per-row report: oracle re-derives the IIM fields from
    # image_id's hex (= low 40 bits of the payload seed, the generator's
    # IPTC source — sources/synthweb.iptc_fields_for)
    from fscrawler_ray.sources.synthweb import _BYLINES, _IPTC_KW

    _kw_case = lambda shift: (  # noqa: E731 — tiny local SQL builder
        f"CASE (s >> {shift}) % 8 "
        + " ".join(f"WHEN {j} THEN '{k}'" for j, k in enumerate(_IPTC_KW[:-1]))
        + f" ELSE '{_IPTC_KW[-1]}' END"
    )
    _byline_case = (
        "CASE (s >> 10) % 6 "
        + " ".join(f"WHEN {j} THEN '{b}'" for j, b in enumerate(_BYLINES[:-1]))
        + f" ELSE '{_BYLINES[-1]}' END"
    )
    sql["crawl_iptc_report"] = (
        "WITH ps AS (SELECT image_id, CAST('0x' || substr(image_id, 5) AS UBIGINT) AS s "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')) "
        "SELECT image_id, 'Scene ' || CAST(s % 997 AS VARCHAR) AS iptc_caption, "
        f"{_byline_case} AS iptc_byline, "
        f"{_kw_case(13)} || ',' || {_kw_case(16)} AS iptc_keywords FROM ps"
    )
    sql["crawl_compact_audit"] = (
        "SELECT CAST((SELECT count(*) "
        "FROM read_parquet('/tmp/fscrawler_oracle_compact/**/*.parquet')) AS BIGINT) AS rows"
    )
    sql["crawl_snapshot_diff"] = (
        "WITH cur AS (SELECT url, seq, CAST(size AS BIGINT) AS size "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')), "
        "prev AS (SELECT url, CAST(size + CASE WHEN seq % 5 = 0 THEN 7 ELSE 0 END AS BIGINT) AS size "
        "FROM cur WHERE seq % 3 <> 0 "
        "UNION ALL SELECT url || '#gone', size FROM cur WHERE seq % 7 = 0) "
        "SELECT COALESCE(c.url, p.url) AS url, "
        "CASE WHEN p.url IS NULL THEN 'added' WHEN c.url IS NULL THEN 'removed' "
        "WHEN c.size <> p.size THEN 'changed' ELSE 'unchanged' END AS status, "
        "c.size AS cur_size, p.size AS prev_size "
        "FROM cur c FULL OUTER JOIN prev p ON c.url = p.url"
    )
    sql["crawl_mirrors"] = (
        "WITH d AS (SELECT DISTINCT host, image_id "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')) "
        "SELECT a.host AS host_a, b.host AS host_b, CAST(count(*) AS BIGINT) AS shared "
        "FROM d a JOIN d b ON a.image_id = b.image_id AND a.host < b.host "
        "GROUP BY a.host, b.host"
    )
    sql["crawl_deadletters"] = (
        "SELECT url, CAST(seq AS BIGINT) AS seq, 'non_image_payload' AS reason "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}_trace/part-*.parquet') "
        "WHERE is_dir = 0 AND CASE WHEN url LIKE '%.%' THEN "
        "lower(regexp_extract(url, '\\.([^./]+)$', 1)) ELSE '' END "
        "NOT IN ('jpg', 'jpeg', 'png', 'webp')"
    )
    sql["crawl_split_leakage"] = (
        "WITH p AS ("
        + sql["crawl_mirrors"]
        + "), s AS (SELECT DISTINCT host, "
        + _split_case("host")
        + f" AS split FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')) "
        "SELECT p.host_a, p.host_b, sa.split AS split_a, sb.split AS split_b, p.shared "
        "FROM p JOIN s sa ON sa.host = p.host_a JOIN s sb ON sb.host = p.host_b "
        "WHERE sa.split <> sb.split"
    )
    # pairwise HLL intersection replay (p=6: idx = hv >> 58, cap 59,
    # 2^58 = 288230376151711744, 2^59 = 576460752303423488, 2.5·m = 160)
    _est = (
        "SELECT {keys}, CASE WHEN raw <= 160.0 AND zeros > 0 "
        "THEN 64.0 * ln(64.0 / zeros) ELSE raw END AS est FROM ("
        "SELECT {keys}, 64 - COUNT(*) AS zeros, "
        "(0.7213 / (1 + 1.079 / 64)) * 64 * 64 * 576460752303423488 "
        "/ CAST(SUM(576460752303423488::HUGEINT / CAST(1::UBIGINT << r AS HUGEINT)) "
        "+ CAST(64 - COUNT(*) AS HUGEINT) * 576460752303423488::HUGEINT AS DOUBLE) AS raw "
        "FROM {src} GROUP BY {keys})"
    )
    sql["crawl_mirrors_approx"] = (
        "WITH src AS (SELECT host, md5_number_upper(CAST(image_id AS VARCHAR)) AS hv "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') "
        "WHERE image_id IS NOT NULL), "
        "reg AS (SELECT host, hv >> 58 AS idx, "
        "CASE WHEN hv % 288230376151711744::UBIGINT = 0 THEN 59 "
        "ELSE 59 - length(bin(hv % 288230376151711744::UBIGINT)) END AS rnk FROM src), "
        "rmax AS (SELECT host, idx, MAX(rnk) AS r FROM reg GROUP BY host, idx), "
        "hest AS (" + _est.format(keys="host", src="rmax") + "), "
        "hosts AS (SELECT DISTINCT host FROM src), "
        "pairs AS (SELECT a.host AS ha, b.host AS hb FROM hosts a JOIN hosts b ON a.host < b.host), "
        "upool AS (SELECT ha, hb, idx, MAX(r) AS r FROM ("
        "SELECT p.ha, p.hb, r.idx, r.r FROM pairs p JOIN rmax r ON r.host = p.ha "
        "UNION ALL SELECT p.ha, p.hb, r.idx, r.r FROM pairs p JOIN rmax r ON r.host = p.hb"
        ") GROUP BY ha, hb, idx), "
        "uest AS (" + _est.format(keys="ha, hb", src="upool") + ") "
        "SELECT p.ha AS host_a, p.hb AS host_b, "
        "CAST(floor(((ea.est + eb.est) - u.est) * 1000.0 + 0.5) AS BIGINT) AS inter_milli "
        "FROM pairs p JOIN hest ea ON ea.host = p.ha JOIN hest eb ON eb.host = p.hb "
        "JOIN uest u ON u.ha = p.ha AND u.hb = p.hb"
    )
    # exact-integer Gini over per-host URL counts: ranked-cumulative form,
    # HUGEINT intermediates mirror the engine's Python-int arithmetic
    sql["crawl_fairness_gini"] = (
        "WITH h AS (SELECT host, CAST(count(*) AS BIGINT) AS n_urls "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') GROUP BY host), "
        "r AS (SELECT n_urls, row_number() OVER (ORDER BY n_urls, host) AS rk FROM h), "
        "s AS (SELECT CAST(count(*) AS HUGEINT) AS n, SUM(CAST(n_urls AS HUGEINT)) AS s0, "
        "SUM(CAST(rk AS HUGEINT) * n_urls) AS s1 FROM r) "
        "SELECT CAST(n AS BIGINT) AS n_hosts, CAST(s0 AS BIGINT) AS total_urls, "
        "CAST((2 * s1 - (n + 1) * s0) * 1000000 // (n * s0) AS BIGINT) AS gini_micro FROM s"
    )
    sql["crawl_lorenz_deciles"] = (
        "WITH h AS (SELECT host, CAST(count(*) AS BIGINT) AS n_urls "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') GROUP BY host), "
        "r AS (SELECT n_urls, row_number() OVER (ORDER BY n_urls, host) AS rk FROM h), "
        "n AS (SELECT count(*) AS n, SUM(n_urls) AS s0 FROM h), "
        "d AS (SELECT (rk - 1) * 10 // n.n AS decile, n_urls FROM r, n), "
        "g AS (SELECT decile, count(*) AS n_hosts, SUM(n_urls) AS urls FROM d GROUP BY decile) "
        "SELECT CAST(decile AS BIGINT) AS decile, CAST(n_hosts AS BIGINT) AS n_hosts, "
        "CAST(urls AS BIGINT) AS urls, "
        "CAST(urls * 1000000 // n.s0 AS BIGINT) AS share_micro FROM g, n"
    )
    sql["crawl_rollup"] = (
        "SELECT host, fmt, CAST(count(*) AS BIGINT) AS n_images, "
        "CAST(sum(size) AS BIGINT) AS total_size "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') "
        "GROUP BY host, fmt"
    )
    sql["knn_bruteforce"] = (
        "SELECT q.vec_id AS query_id, e.vec_id, "
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id) AS rnk "
        "FROM embeddings q, embeddings e "
        "WHERE q.vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4) AND e.vec_id <> q.vec_id "
        "QUALIFY rnk <= 10"
    )
    # exhaustive-probe IVF ≡ brute force (see the queries() entry): same
    # oracle — a lost or duplicated vector in the hive-partitioned index
    # would break the match
    sql["knn_ivf"] = sql["knn_bruteforce"]
    # exhaustive-shortlist PQ ≡ brute force (see the queries() entry)
    sql["knn_pq"] = sql["knn_bruteforce"]
    # random-hyperplane LSH: replay mask unpacking → micro-quantized sign
    # projection (exact int64 — floor(CAST(e AS DOUBLE)*1e6) matches the
    # engine's floor(f64(v)·1e6) bit-for-bit) → per-table signatures →
    # bucket-match candidates → exact-cosine re-rank.  Only the L×b sign
    # masks are shared with the engine.
    from fscrawler_ray.pipelines.similarity import LSH_BITS, LSH_TABLES, lsh_masks

    _lsh_m = lsh_masks()
    _lsh_vals = ", ".join(
        f"({t}, {b}, {int(_lsh_m[t, b])}::UBIGINT)"
        for t in range(LSH_TABLES)
        for b in range(LSH_BITS)
    )
    _lsh_sig_cte = (
        f"m(tbl, bit, mask) AS (VALUES {_lsh_vals}), "
        "comp AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim, "
        "CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS micro "
        "FROM embeddings), "
        "proj AS (SELECT c.vec_id, m.tbl, m.bit, "
        "SUM(CASE WHEN (m.mask >> (c.dim - 1)) & 1 = 1 THEN c.micro ELSE -c.micro END) AS p "
        "FROM comp c CROSS JOIN m GROUP BY c.vec_id, m.tbl, m.bit), "
        "sig AS (SELECT vec_id, tbl, SUM(CASE WHEN p >= 0 THEN 1 << bit ELSE 0 END) AS sg "
        "FROM proj GROUP BY vec_id, tbl)"
    )
    _lsh_cte = (
        _lsh_sig_cte + ", "
        "qs AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4), "
        "cand AS (SELECT DISTINCT a.vec_id AS query_id, d.vec_id FROM sig a "
        "JOIN sig d ON a.tbl = d.tbl AND a.sg = d.sg "
        "WHERE a.vec_id IN (SELECT vec_id FROM qs) AND d.vec_id <> a.vec_id), "
        "lshtop AS (SELECT c.query_id, c.vec_id, row_number() OVER (PARTITION BY c.query_id "
        "ORDER BY list_cosine_similarity(eq.embedding, ed.embedding) DESC, c.vec_id) AS rnk "
        "FROM cand c JOIN embeddings eq ON eq.vec_id = c.query_id "
        "JOIN embeddings ed ON ed.vec_id = c.vec_id QUALIFY rnk <= 10)"
    )
    sql["knn_lsh"] = "WITH " + _lsh_cte + " SELECT query_id, vec_id, rnk FROM lshtop"
    # embedding-cosine near-dup over the same buckets: candidates share a
    # bucket in ≥1 table; the τ-threshold verify is exact integer math —
    # dot ≥ 0 ∧ dot²·10⁶ ≥ τ_permille²·‖a‖²·‖b‖² in HUGEINT, mirroring the
    # engine's Python-bigint check bit-for-bit
    from fscrawler_ray.pipelines.similarity import EMB_NEARDUP_TAU_PERMILLE as _TAU

    sql["embedding_neardup_lsh"] = (
        "WITH " + _lsh_sig_cte + ", "
        "n2 AS (SELECT vec_id, SUM(CAST(micro AS HUGEINT) * micro) AS n2 FROM comp GROUP BY vec_id), "
        "cp AS (SELECT DISTINCT a.vec_id AS va, d.vec_id AS vb FROM sig a "
        "JOIN sig d ON a.tbl = d.tbl AND a.sg = d.sg AND a.vec_id < d.vec_id), "
        "dt AS (SELECT cp.va, cp.vb, SUM(CAST(ca.micro AS HUGEINT) * cb.micro) AS dot FROM cp "
        "JOIN comp ca ON ca.vec_id = cp.va "
        "JOIN comp cb ON cb.vec_id = cp.vb AND cb.dim = ca.dim GROUP BY cp.va, cp.vb) "
        "SELECT dt.va AS vec_id_a, dt.vb AS vec_id_b, CAST(dt.dot AS BIGINT) AS dot "
        "FROM dt JOIN n2 na ON na.vec_id = dt.va JOIN n2 nb ON nb.vec_id = dt.vb "
        f"WHERE dt.dot >= 0 AND dt.dot * dt.dot * 1000000 >= {_TAU * _TAU} * na.n2 * nb.n2"
    )
    # incremental IVF: brute force over the edited corpus, reconstructed
    # in SQL (deletes by modulus, inserted twins by id offset +
    # list_reverse — a pure permutation, float-exact on both sides)
    from fscrawler_ray.pipelines.similarity import (
        IVF_DEL_MOD as _IDEL,
        IVF_INS_MOD as _IINS,
        IVF_INS_OFFSET as _IOFF,
    )

    sql["knn_ivf_incremental"] = (
        f"WITH ed AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % {_IDEL} != 0 "
        f"UNION ALL SELECT vec_id + {_IOFF}, list_reverse(embedding) FROM embeddings "
        f"WHERE vec_id % {_IDEL} != 0 AND vec_id % {_IINS} = 0) "
        "SELECT q.vec_id AS query_id, e.vec_id, row_number() OVER (PARTITION BY q.vec_id "
        "ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id) AS rnk "
        "FROM ed q, ed e "
        "WHERE q.vec_id IN (SELECT vec_id FROM ed ORDER BY vec_id LIMIT 4) "
        "AND e.vec_id <> q.vec_id QUALIFY rnk <= 10"
    )
    # transitive closure of the embedding near-dup pairs (same recursive-
    # CTE shape as images_neardup_groups_spool, pairs nested inline)
    sql["embedding_neardup_groups"] = (
        "WITH RECURSIVE " + _lsh_sig_cte + ", "
        "n2 AS (SELECT vec_id, SUM(CAST(micro AS HUGEINT) * micro) AS n2 FROM comp GROUP BY vec_id), "
        "cp AS (SELECT DISTINCT a.vec_id AS va, d.vec_id AS vb FROM sig a "
        "JOIN sig d ON a.tbl = d.tbl AND a.sg = d.sg AND a.vec_id < d.vec_id), "
        "dt AS (SELECT cp.va, cp.vb, SUM(CAST(ca.micro AS HUGEINT) * cb.micro) AS dot FROM cp "
        "JOIN comp ca ON ca.vec_id = cp.va "
        "JOIN comp cb ON cb.vec_id = cp.vb AND cb.dim = ca.dim GROUP BY cp.va, cp.vb), "
        "pr AS (SELECT dt.va, dt.vb FROM dt "
        "JOIN n2 na ON na.vec_id = dt.va JOIN n2 nb ON nb.vec_id = dt.vb "
        f"WHERE dt.dot >= 0 AND dt.dot * dt.dot * 1000000 >= {_TAU * _TAU} * na.n2 * nb.n2), "
        "e AS (SELECT va AS a, vb AS b FROM pr UNION SELECT vb, va FROM pr), "
        "reach(a, b) AS ((SELECT a, a FROM e UNION SELECT a, b FROM e) "
        "UNION SELECT r.a, e.b FROM reach r JOIN e ON e.a = r.b) "
        "SELECT a AS vec_id, min(b) AS canonical_id FROM reach GROUP BY a"
    )
    # removal: drop every non-canonical component member, stream the rest
    _emb_groups_body = sql["embedding_neardup_groups"][len("WITH RECURSIVE ") :]
    sql["embedding_dedup_clean"] = (
        "WITH RECURSIVE "
        + _emb_groups_body[: _emb_groups_body.rindex("SELECT a AS vec_id")]
        + ", grp AS (SELECT a AS vec_id, min(b) AS canonical_id FROM reach GROUP BY a) "
        "SELECT emb.vec_id, emb.label FROM embeddings emb "
        "WHERE emb.vec_id NOT IN (SELECT vec_id FROM grp WHERE vec_id <> canonical_id)"
    )
    # multiprobe: the query's signature plus its b single-bit XOR variants
    # per table — candidates are a strict superset of knn_lsh's
    sql["knn_lsh_probe"] = (
        "WITH " + _lsh_cte + ", "
        "qv AS (SELECT s.vec_id, s.tbl, CAST(s.sg AS BIGINT) AS sg FROM sig s "
        "WHERE s.vec_id IN (SELECT vec_id FROM qs) "
        "UNION ALL SELECT s.vec_id, s.tbl, xor(CAST(s.sg AS BIGINT), CAST(1 << g.b AS BIGINT)) "
        f"FROM sig s, generate_series(0, {LSH_BITS - 1}) AS g(b) "
        "WHERE s.vec_id IN (SELECT vec_id FROM qs)), "
        "cand2 AS (SELECT DISTINCT q.vec_id AS query_id, d.vec_id FROM qv q "
        "JOIN sig d ON d.tbl = q.tbl AND CAST(d.sg AS BIGINT) = q.sg "
        "WHERE d.vec_id <> q.vec_id) "
        "SELECT c.query_id, c.vec_id, row_number() OVER (PARTITION BY c.query_id "
        "ORDER BY list_cosine_similarity(eq.embedding, ed.embedding) DESC, c.vec_id) AS rnk "
        "FROM cand2 c JOIN embeddings eq ON eq.vec_id = c.query_id "
        "JOIN embeddings ed ON ed.vec_id = c.vec_id QUALIFY rnk <= 10"
    )
    sql["lsh_ann_recall"] = (
        "WITH " + _lsh_cte + ", "
        "bt AS (SELECT q.vec_id AS query_id, e.vec_id FROM embeddings q, embeddings e "
        "WHERE q.vec_id IN (SELECT vec_id FROM qs) AND e.vec_id <> q.vec_id "
        "QUALIFY row_number() OVER (PARTITION BY q.vec_id "
        "ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id) <= 10), "
        "st AS (SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS n_true, "
        "CAST(COUNT(l.vec_id) AS BIGINT) AS hits "
        "FROM bt b LEFT JOIN lshtop l USING (query_id, vec_id) GROUP BY b.query_id), "
        "lc AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_lsh FROM lshtop GROUP BY query_id) "
        "SELECT q.vec_id AS query_id, st.n_true, COALESCE(lc.n_lsh, 0) AS n_lsh, st.hits, "
        "CAST(st.hits * 1000000 // greatest(st.n_true, 1) AS BIGINT) AS recall_micro "
        "FROM qs q JOIN st ON st.query_id = q.vec_id LEFT JOIN lc ON lc.query_id = q.vec_id"
    )
    from fscrawler_ray.pipelines.similarity import NDCG_WEIGHTS as _NDCG_W

    _w_rows = ", ".join(f"({i + 1}, {w})" for i, w in enumerate(_NDCG_W))
    _idcg = sum((10 + 1 - i) * _NDCG_W[i - 1] for i in range(1, 11))
    sql["knn_ndcg_eval"] = (
        "WITH " + _lsh_cte + ", "
        "bt AS (SELECT q.vec_id AS query_id, e.vec_id, row_number() OVER ("
        "PARTITION BY q.vec_id ORDER BY list_cosine_similarity(q.embedding, e.embedding) "
        "DESC, e.vec_id) AS trnk FROM embeddings q, embeddings e "
        "WHERE q.vec_id IN (SELECT vec_id FROM qs) AND e.vec_id <> q.vec_id "
        "QUALIFY trnk <= 10), "
        f"w AS (SELECT * FROM (VALUES {_w_rows}) AS v(i, wt)), "
        "dcg AS (SELECT l.query_id, sum((11 - bt.trnk) * w.wt) AS dcg FROM lshtop l "
        "JOIN w ON w.i = l.rnk LEFT JOIN bt ON bt.query_id = l.query_id "
        "AND bt.vec_id = l.vec_id WHERE bt.vec_id IS NOT NULL GROUP BY l.query_id) "
        "SELECT q.vec_id AS query_id, CAST(coalesce(d.dcg, 0) AS BIGINT) AS dcg, "
        f"CAST({_idcg} AS BIGINT) AS idcg, "
        f"CAST(coalesce(d.dcg, 0) * 1000000 // {_idcg} AS BIGINT) AS ndcg_micro "
        "FROM qs q LEFT JOIN dcg d ON d.query_id = q.vec_id"
    )
    sql["knn_mrr_eval"] = (
        "WITH " + _lsh_cte + ", "
        "bt AS (SELECT q.vec_id AS query_id, e.vec_id FROM embeddings q, embeddings e "
        "WHERE q.vec_id IN (SELECT vec_id FROM qs) AND e.vec_id <> q.vec_id "
        "QUALIFY row_number() OVER (PARTITION BY q.vec_id "
        "ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id) <= 10), "
        "fh AS (SELECT l.query_id, min(l.rnk) AS first FROM lshtop l "
        "JOIN bt ON bt.query_id = l.query_id AND bt.vec_id = l.vec_id GROUP BY l.query_id) "
        "SELECT q.vec_id AS query_id, CAST(coalesce(fh.first, 0) AS BIGINT) AS first_hit_rank, "
        "CAST(CASE WHEN fh.first IS NULL THEN 0 ELSE 1000000 // fh.first END AS BIGINT) AS rr_micro "
        "FROM qs q LEFT JOIN fh ON fh.query_id = q.vec_id"
    )
    # hard negatives = the same ranking, window (10, 30]
    sql["hard_negatives"] = (
        "SELECT q.vec_id AS query_id, e.vec_id, "
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id) AS rnk "
        "FROM embeddings q, embeddings e "
        "WHERE q.vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4) AND e.vec_id <> q.vec_id "
        "QUALIFY rnk > 10 AND rnk <= 30"
    )
    # int8-quantized kNN replayed exactly: per-vector L2 normalize, the
    # symmetric scale max|u|/127 (1e-12 floor), clipped rounded codes,
    # INTEGER dot products, rescale by both scales, rank.  The engine
    # computes codes with the FLOAT64 scale but rescales with the
    # FLOAT32-cast scale quantize_int8 returns, so the oracle carries
    # both: s (f64, code computation) and s32 (f32-rounded then widened,
    # rescale) — multiplied left-to-right in f64 exactly like numpy's
    # (dots * qs[:,None]) * scales[None,:].  Integer dots + bit-matched
    # scales make ranking drift-proof except on same-(dot, scale) ties,
    # which vec_id breaks identically on both sides.
    # MMR diverse retrieval: unrolled k-step greedy — each step anti-joins
    # the selected set, penalizes by the max pairwise sim into it, and
    # picks the (micro-integer) argmax with vec_id tie-break
    from fscrawler_ray.pipelines.similarity import MMR_K, MMR_LAMBDA10, MMR_SHORTLIST

    _mmr_parts = [
        "WITH emb0 AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings), "
        "q AS (SELECT vec_id FROM emb0 ORDER BY vec_id LIMIT 4), "
        "cand AS MATERIALIZED (SELECT qq.vec_id AS query_id, e.vec_id, "
        "CAST(round(1000000 * list_cosine_similarity(qq.embedding, e.embedding)) AS BIGINT) AS sq, "
        "row_number() OVER (PARTITION BY qq.vec_id "
        "ORDER BY list_cosine_similarity(qq.embedding, e.embedding) DESC, e.vec_id) AS rnk "
        "FROM emb0 qq, emb0 e "
        "WHERE qq.vec_id IN (SELECT vec_id FROM q) AND e.vec_id <> qq.vec_id "
        f"QUALIFY rnk <= {MMR_SHORTLIST}), "
        "pair AS MATERIALIZED (SELECT a.query_id, a.vec_id AS va, b.vec_id AS vb, "
        "CAST(round(1000000 * list_cosine_similarity(ea.embedding, eb.embedding)) AS BIGINT) AS sp "
        "FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.vec_id <> b.vec_id "
        "JOIN emb0 ea ON ea.vec_id = a.vec_id "
        "JOIN emb0 eb ON eb.vec_id = b.vec_id), "
        "sel1 AS MATERIALIZED (SELECT query_id, vec_id, CAST(1 AS BIGINT) AS mmr_rank FROM cand "
        f"QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY {MMR_LAMBDA10} * sq DESC, vec_id) = 1)"
    ]
    for _i in range(2, MMR_K + 1):
        _prev = f"sel{_i - 1}"
        _mmr_parts.append(
            f", pick{_i} AS MATERIALIZED (SELECT c.query_id, c.vec_id, CAST({_i} AS BIGINT) AS mmr_rank "
            f"FROM cand c LEFT JOIN {_prev} dup "
            "ON dup.query_id = c.query_id AND dup.vec_id = c.vec_id "
            "LEFT JOIN (SELECT p.query_id, p.va, max(p.sp) AS mp FROM pair p "
            f"JOIN {_prev} s ON s.query_id = p.query_id AND s.vec_id = p.vb "
            "GROUP BY 1, 2) pen ON pen.query_id = c.query_id AND pen.va = c.vec_id "
            "WHERE dup.vec_id IS NULL "
            "QUALIFY row_number() OVER (PARTITION BY c.query_id "
            f"ORDER BY {MMR_LAMBDA10} * c.sq - {10 - MMR_LAMBDA10} * COALESCE(pen.mp, 0) DESC, c.vec_id) = 1)"
            f", sel{_i} AS MATERIALIZED (SELECT * FROM {_prev} UNION ALL SELECT * FROM pick{_i})"
        )
    _mmr_parts.append(f" SELECT query_id, vec_id, mmr_rank FROM sel{MMR_K}")
    sql["mmr_topk"] = "".join(_mmr_parts)
    sql["knn_int8"] = (
        "WITH ed AS (SELECT vec_id, i, embedding[i] AS x "
        "FROM embeddings, unnest(generate_series(1, len(embedding))) s(i)), "
        "nr AS (SELECT vec_id, sqrt(sum(x * x)) AS nv FROM ed GROUP BY vec_id), "
        "un AS (SELECT e.vec_id, e.i, e.x / n.nv AS u FROM ed e JOIN nr n USING (vec_id)), "
        "sc AS (SELECT vec_id, greatest(max(abs(u)) / 127.0, 1e-12) AS s, "
        "CAST(CAST(greatest(max(abs(u)) / 127.0, 1e-12) AS FLOAT) AS DOUBLE) AS s32 "
        "FROM un GROUP BY vec_id), "
        "cd AS (SELECT u.vec_id, u.i, CAST(least(greatest(round(u.u / s.s), -127.0), 127.0) AS INTEGER) AS c "
        "FROM un u JOIN sc s USING (vec_id)), "
        "qs AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4), "
        "dot AS (SELECT qc.vec_id AS query_id, vc.vec_id, sum(qc.c * vc.c) AS d "
        "FROM cd qc JOIN cd vc ON qc.i = vc.i AND vc.vec_id <> qc.vec_id "
        "WHERE qc.vec_id IN (SELECT vec_id FROM qs) GROUP BY 1, 2), "
        "sims AS (SELECT d.query_id, d.vec_id, CAST(d.d AS DOUBLE) * sq.s32 * sv.s32 AS sim "
        "FROM dot d JOIN sc sq ON sq.vec_id = d.query_id JOIN sc sv ON sv.vec_id = d.vec_id) "
        "SELECT query_id, vec_id, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rnk "
        "FROM sims QUALIFY rnk <= 10"
    )
    # integer-exact k-means replayed end-to-end: micro-quantize, seed from
    # the K smallest vec_ids (cluster index = vec_id rank), then unroll
    # every iteration — exact int argmin assignment (ties → min cluster),
    # truncate-toward-zero centroid division (CASE-signed abs-// so the
    # semantics are explicit), empty clusters keep their previous centroid
    from fscrawler_ray.pipelines.similarity import KMEANS_ITERS as _KMI
    from fscrawler_ray.pipelines.similarity import KMEANS_K as _KMK

    _km_parts = [
        "WITH comp AS MATERIALIZED (SELECT vec_id, generate_subscripts(embedding, 1) AS dim, "
        "CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS micro "
        "FROM embeddings), "
        "seeds AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster "
        f"FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_KMK})), "
        "c0 AS MATERIALIZED (SELECT s.cluster, c.dim, c.micro AS cent "
        "FROM seeds s JOIN comp c USING (vec_id))"
    ]
    for _it in range(1, _KMI + 1):
        _km_parts.append(
            f", d{_it} AS (SELECT c.vec_id, k.cluster, "
            "SUM((c.micro - k.cent) * (c.micro - k.cent)) AS d2 "
            f"FROM comp c JOIN c{_it - 1} k ON k.dim = c.dim GROUP BY 1, 2)"
            f", a{_it} AS MATERIALIZED (SELECT vec_id, cluster FROM d{_it} "
            "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1)"
            f", u{_it} AS (SELECT a.cluster, c.dim, SUM(c.micro) AS s, COUNT(*) AS n "
            f"FROM a{_it} a JOIN comp c USING (vec_id) GROUP BY 1, 2)"
            f", c{_it} AS MATERIALIZED (SELECT k.cluster, k.dim, "
            "CAST(COALESCE(CASE WHEN u.s < 0 THEN -((-u.s) // u.n) ELSE u.s // u.n END, "
            "k.cent) AS BIGINT) AS cent "
            f"FROM c{_it - 1} k LEFT JOIN u{_it} u ON u.cluster = k.cluster AND u.dim = k.dim)"
        )
    _km_parts.append(
        ", dfin AS (SELECT c.vec_id, k.cluster, "
        "SUM((c.micro - k.cent) * (c.micro - k.cent)) AS d2 "
        f"FROM comp c JOIN c{_KMI} k ON k.dim = c.dim GROUP BY 1, 2) "
        "SELECT vec_id, cluster, CAST(d2 AS BIGINT) AS dist_sq FROM dfin "
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1"
    )
    sql["kmeans_exact"] = "".join(_km_parts)
    _comp_cte = (
        "WITH comp AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim, "
        "CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS micro "
        "FROM embeddings) "
    )
    sql["embedding_moments"] = _comp_cte + (
        "SELECT CAST(dim AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(micro) AS BIGINT) AS sum_micro, "
        "CAST(SUM(micro * micro) AS BIGINT) AS sumsq_micro, "
        "CAST(MIN(micro) AS BIGINT) AS min_micro, CAST(MAX(micro) AS BIGINT) AS max_micro "
        "FROM comp GROUP BY dim"
    )
    sql["embedding_gram"] = _comp_cte + (
        "SELECT CAST(a.dim AS BIGINT) AS i, CAST(b.dim AS BIGINT) AS j, "
        "CAST(SUM(CAST(a.micro AS HUGEINT) * b.micro) AS BIGINT) AS sum_prod "
        "FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND a.dim <= b.dim "
        "GROUP BY 1, 2"
    )
    # power iteration unrolled: full Gram in HUGEINT, v0 = all-ones, each
    # step a matvec + rescale to max|v|=SCALE with trunc-div (CASE-signed)
    from fscrawler_ray.pipelines.similarity import POWER_ITERS as _PIT
    from fscrawler_ray.pipelines.similarity import POWER_SCALE as _PSC

    _pw_parts = [
        _comp_cte.replace("WITH comp AS ", "WITH comp AS MATERIALIZED ").rstrip() + ", "
        "gm AS MATERIALIZED (SELECT a.dim AS i, b.dim AS j, "
        "SUM(CAST(a.micro AS HUGEINT) * b.micro) AS g "
        "FROM comp a JOIN comp b ON a.vec_id = b.vec_id GROUP BY 1, 2), "
        "v0 AS (SELECT DISTINCT dim, CAST(1 AS HUGEINT) AS val FROM comp)"
    ]
    for _it in range(1, _PIT + 1):
        _pw_parts.append(
            f", w{_it} AS (SELECT g.i AS dim, SUM(g.g * v.val) AS w "
            f"FROM gm g JOIN v{_it - 1} v ON v.dim = g.j GROUP BY 1)"
            f", m{_it} AS (SELECT greatest(MAX(ABS(w)), 1) AS mx FROM w{_it})"
            f", v{_it} AS (SELECT w.dim, CASE WHEN w.w < 0 "
            f"THEN -((-w.w * {_PSC}) // m.mx) ELSE (w.w * {_PSC}) // m.mx END AS val "
            f"FROM w{_it} w, m{_it} m)"
        )
    _pw_cte = "".join(_pw_parts)
    sql["pca_component"] = _pw_cte + (
        f" SELECT CAST(dim AS BIGINT) AS dim, CAST(val AS BIGINT) AS v FROM v{_PIT}"
    )
    sql["pca_scores"] = _pw_cte + (
        " SELECT c.vec_id, CAST(SUM(c.micro * v.val) AS BIGINT) AS score "
        f"FROM comp c JOIN v{_PIT} v USING (dim) GROUP BY 1"
    )
    from fscrawler_ray.pipelines.similarity import KMEANS_OUTLIER_TOPK as _KOT

    sql["kmeans_outliers"] = (
        "SELECT cluster, vec_id, dist_sq, "
        "CAST(row_number() OVER (PARTITION BY cluster ORDER BY dist_sq DESC, vec_id) "
        "AS BIGINT) AS rnk "
        f"FROM ({sql['kmeans_exact']}) base QUALIFY rnk <= {_KOT}"
    )
    from fscrawler_ray.pipelines.sampling import KNUTH32 as _KN32
    from fscrawler_ray.pipelines.similarity import CLUSTER_SAMPLE_K as _CSK

    sql["cluster_balanced_sample"] = (
        "SELECT cluster, vec_id, "
        "CAST(row_number() OVER (PARTITION BY cluster "
        f"ORDER BY (vec_id * {_KN32}) % 4294967296, vec_id) AS BIGINT) AS rnk "
        f"FROM ({sql['kmeans_exact']}) base QUALIFY rnk <= {_CSK}"
    )
    sql["crawl_trace"] = (
        "SELECT CAST(seq AS BIGINT) AS seq, url, host, depth, is_dir "
        f"FROM read_parquet('{CRAWL_SHARED_DIR}_trace/part-*.parquet')"
    )
    sql["crawl_counters_audit"] = (
        "SELECT CAST((SELECT count(*) "
        f"FROM read_parquet('{CRAWL_SHARED_DIR}_trace/part-*.parquet')) AS BIGINT) AS emitted, "
        "CAST((SELECT count(*) "
        f"FROM read_parquet('{CRAWL_SHARED_DIR}/round=*/table-*/*.parquet')) AS BIGINT) AS result_rows"
    )
    # attrs over the spooled input bytes: DuckDB independently re-derives
    # size (octet_length) and the magic-byte sniff (hex-prefix CASE over the
    # container headers: PNG 89504E470D0A1A0A / JPEG FFD8FFE0 / RIFF....WEBP)
    from fscrawler_ray.pipelines.image_corpus import SHARD_CAP_BYTES

    sql["images_shard_manifest"] = (
        "SELECT image_id, CAST(octet_length(bytes) AS BIGINT) AS nbytes, "
        "CAST(floor(coalesce(sum(octet_length(bytes)) OVER "
        "(ORDER BY image_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        f"/ {SHARD_CAP_BYTES}) AS BIGINT) AS shard "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')"
    )
    sql["images_phash_search"] = (
        "WITH t AS (SELECT image_id, CAST(phash AS BIGINT) AS ph "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')), "
        "q AS (SELECT image_id AS query_id, ph AS qph FROM t ORDER BY image_id LIMIT 8) "
        "SELECT q.query_id, t.image_id, CAST(bit_count(xor(q.qph, t.ph)) AS BIGINT) AS dist "
        "FROM q CROSS JOIN t WHERE bit_count(xor(q.qph, t.ph)) <= 10"
    )
    sql["images_column_footprint"] = (
        "SELECT path_in_schema AS \"column\", "
        "CAST(sum(total_compressed_size) AS BIGINT) AS compressed_bytes, "
        "CAST(sum(total_uncompressed_size) AS BIGINT) AS uncompressed_bytes, "
        "CAST(count(*) AS BIGINT) AS n_chunks "
        f"FROM parquet_metadata('{IMAGES_SPOOL_DIR}/*.parquet') GROUP BY path_in_schema"
    )
    sql["images_release"] = (
        "WITH g AS (SELECT * FROM read_parquet('" + IMAGES_SPOOL_DIR + "/*.parquet') "
        "WHERE w >= 48 AND h >= 48 AND 2 * greatest(w, h) <= 5 * least(w, h) "
        "AND len(regexp_extract_all(coalesce(caption, ''), '\\S+')) >= 3), "
        "k AS (SELECT phash, min(image_id) AS keeper FROM g GROUP BY phash), "
        "r AS (SELECT g.* FROM g JOIN k ON k.phash = g.phash AND k.keeper = g.image_id), "
        "s AS (SELECT CASE WHEN md5_number_upper(image_id) % 10 < 8 "
        "THEN 'train' ELSE 'val' END AS split, fmt, octet_length(bytes) AS nb, "
        "len(regexp_extract_all(coalesce(caption, ''), '\\S+')) AS tk FROM r) "
        "SELECT split, fmt, CAST(count(*) AS BIGINT) AS n_images, "
        "CAST(sum(nb) AS BIGINT) AS payload_bytes, "
        "CAST(sum(tk) AS BIGINT) AS caption_tokens FROM s GROUP BY split, fmt"
    )
    sql["images_caption_size_rankcorr"] = (
        "WITH x AS (SELECT image_id, "
        "len(regexp_extract_all(coalesce(caption, ''), '\\S+')) AS tk, "
        "octet_length(bytes) AS nb "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')), "
        "a AS (SELECT image_id, ROW_NUMBER() OVER (ORDER BY tk, image_id) AS ra FROM x), "
        "b AS (SELECT image_id, ROW_NUMBER() OVER (ORDER BY nb, image_id) AS rb FROM x), "
        "d AS (SELECT CAST(a.ra AS BIGINT) - b.rb AS d FROM a JOIN b USING (image_id)), "
        "s AS (SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(d * d) AS HUGEINT) AS s2 FROM d) "
        "SELECT CAST(n AS BIGINT) AS n, CAST(s2 AS BIGINT) AS sum_d2, "
        "CAST(CASE WHEN n * (n * n - 1) = 0 THEN 1000000 ELSE "
        "(2 * n * (n * n - 1) - 6 * s2) * 1000000 // (n * (n * n - 1)) END AS BIGINT) "
        "AS rho_plus1_micro FROM s"
    )
    sql["images_phash_bitstats"] = (
        "WITH b AS (SELECT unnest(generate_series(0, 63)) AS bit), "
        f"p AS (SELECT phash FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')), "
        "t AS (SELECT count(*) AS n FROM p) "
        "SELECT CAST(b.bit AS BIGINT) AS bit, "
        "CAST(sum((phash >> b.bit) & 1) AS BIGINT) AS n_set, "
        "CAST(sum((phash >> b.bit) & 1) * 1000000 // greatest(t.n, 1) AS BIGINT) "
        "AS set_micro FROM p CROSS JOIN b CROSS JOIN t GROUP BY b.bit, t.n"
    )
    sql["images_datacard"] = (
        "WITH s AS (SELECT fmt, octet_length(bytes) AS nb, "
        "CAST(w AS BIGINT) * h AS px, phash, "
        "len(regexp_extract_all(caption, '\\S+')) AS tk "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')) "
        "SELECT fmt, CAST(count(*) AS BIGINT) AS n_images, "
        "CAST(sum(nb) AS BIGINT) AS total_bytes, "
        "CAST(sum(px) AS BIGINT) AS total_pixels, "
        "CAST(count(DISTINCT phash) AS BIGINT) AS distinct_phash, "
        "CAST(sum(tk) AS BIGINT) AS caption_tokens FROM s GROUP BY fmt"
    )
    sql["images_attrs"] = (
        "WITH b AS (SELECT image_id, octet_length(bytes) AS size, hex(bytes) AS h "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')), "
        "s AS (SELECT image_id, size, "
        "CASE WHEN substring(h, 1, 16) = '89504E470D0A1A0A' THEN 'png' "
        "WHEN substring(h, 1, 8) = 'FFD8FFE0' THEN 'jpeg' "
        "WHEN substring(h, 1, 8) = '52494646' AND substring(h, 17, 8) = '57454250' THEN 'webp' "
        "ELSE NULL END AS sniffed_fmt FROM b) "
        "SELECT image_id, CAST(size AS BIGINT) AS size, sniffed_fmt, "
        "CASE WHEN sniffed_fmt IS NULL THEN 'APPLICATION' ELSE 'PICTURE' END AS content_family, "
        "CASE WHEN sniffed_fmt IS NULL THEN 'APP' ELSE 'PHOTO' END AS content_category, "
        "CAST(CASE WHEN sniffed_fmt IS NULL THEN 12 ELSE 3 END AS BIGINT) AS content_min_age "
        "FROM s"
    )
    # ID3-analog report: the engine PARSES the real ID3v2.3 frames out of
    # the RIFF 'id3 ' chunk; the oracle re-derives the fields from the clip
    # index in media_id (stages/multimodal.id3_fields_for, the generator
    # contract — same pattern as crawl_exif_report)
    from fscrawler_ray.stages.multimodal import _ID3_ARTISTS

    _artist_whens = " ".join(f"WHEN {j} THEN '{a}'" for j, a in enumerate(_ID3_ARTISTS))
    sql["audio_id3_report"] = (
        "WITH m AS (SELECT media_id, CAST(substr(media_id, 5) AS BIGINT) AS i "
        f"FROM read_parquet('{AUDIO_SPOOL_DIR}/part-0.parquet')) "
        "SELECT media_id, 'Track ' || lpad(CAST(i AS VARCHAR), 5, '0') AS id3_title, "
        f"CASE i % 8 {_artist_whens} END AS id3_artist, "
        "CAST(1990 + (i * 7) % 30 AS BIGINT) AS id3_year FROM m"
    )
    # augment replay: op = md5_number_upper(image_id) % 4; rot90/rot270
    # swap the output dims, flip/rot180 keep them
    sql["images_augment"] = (
        "WITH m AS (SELECT image_id, w, h, md5_number_upper(image_id) % 4 AS o "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')) "
        "SELECT image_id, "
        "CASE o WHEN 0 THEN 'flip_h' WHEN 1 THEN 'rot90' WHEN 2 THEN 'rot180' ELSE 'rot270' END AS aug_op, "
        "CAST(CASE WHEN o IN (1, 3) THEN h ELSE w END AS BIGINT) AS aug_w, "
        "CAST(CASE WHEN o IN (1, 3) THEN w ELSE h END AS BIGINT) AS aug_h "
        "FROM m"
    )
    # frame-sampler replay: eff = min(3, total)=3 picks at
    # idx = trunc((f+0.5)*total/eff) with the generator's frames_per_clip
    # contract (total=8), ts = trunc(idx/fps*1000); the engine reads total
    # and fps from the FSV1 container header it demuxes
    sql["video_frames"] = (
        "WITH m AS (SELECT media_id, CAST(fps AS DOUBLE) AS fps "
        f"FROM read_parquet('{VIDEO_SPOOL_DIR}/part-0.parquet')), "
        "f AS (SELECT * FROM (VALUES (0), (1), (2)) v(f)), "
        "p AS (SELECT media_id, f, CAST(trunc((f + 0.5) * 8 / 3) AS INT) AS idx, fps FROM m, f) "
        "SELECT media_id, CAST(f AS INT) AS frame_no, "
        "CAST(trunc(idx / fps * 1000) AS INT) AS ts_ms FROM p"
    )
    # thumbnail dims from the spooled metadata: s = max(w,h)/64; dims pass
    # through when s<=1, else trunc(dim/s) floored at 1 — identical float
    # ops to ThumbnailStage._downscale over the DECODED pixel dims
    sql["images_thumbnails"] = (
        "WITH s AS (SELECT image_id, CAST(w AS DOUBLE) AS w, CAST(h AS DOUBLE) AS h, "
        "CAST(greatest(w, h) AS DOUBLE) / 64.0 AS sc "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')) "
        "SELECT image_id, "
        "CAST(CASE WHEN sc <= 1 THEN w ELSE greatest(1.0, trunc(w / sc)) END AS BIGINT) AS thumb_w, "
        "CAST(CASE WHEN sc <= 1 THEN h ELSE greatest(1.0, trunc(h / sc)) END AS BIGINT) AS thumb_h "
        "FROM s"
    )
    # aspect bucketing replay: ladder ratios as exact double divisions,
    # nearest-log-ratio with numpy-argmin first-min tie-break (ORDER BY
    # dist, ladder index), then per-bucket rank in image_id order // 16
    from fscrawler_ray.pipelines.image_corpus import ASPECT_LADDER

    _lad_rows = ", ".join(f"({i}, '{rw}:{rh}', CAST({rw} AS DOUBLE) / {rh})" for i, (rw, rh) in enumerate(ASPECT_LADDER))
    sql["images_aspect_buckets"] = (
        f"WITH im AS (SELECT image_id, w, h FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')), "
        f"lad AS (SELECT * FROM (VALUES {_lad_rows}) AS v(i, lbl, r)), "
        "d AS (SELECT image_id, lbl, i, abs(ln(CAST(w AS DOUBLE) / h) - ln(r)) AS dist FROM im, lad), "
        "pick AS (SELECT image_id, lbl FROM (SELECT *, row_number() OVER ("
        "PARTITION BY image_id ORDER BY dist, i) AS rn FROM d) WHERE rn = 1) "
        "SELECT image_id, lbl AS bucket, "
        "CAST((row_number() OVER (PARTITION BY lbl ORDER BY image_id) - 1) // 16 AS BIGINT) AS batch_idx "
        "FROM pick"
    )
    from fscrawler_ray.pipelines.crawl_report import (
        URL_BANNED_TOKENS,
        URL_BLOCKED_HOSTS,
        URL_MAX_LEN,
        URL_MAX_SLASHES,
    )

    _blk = ", ".join(f"'{h}'" for h in URL_BLOCKED_HOSTS)
    _tok = " OR ".join(f"regexp_matches(url, '{t}')" for t in URL_BANNED_TOKENS)
    sql["crawl_url_filter"] = (
        "WITH c AS (SELECT url, host, CAST(length(url) AS BIGINT) AS ln, "
        "cast(len(regexp_extract_all(url, '[0-9]')) AS BIGINT) AS n_dig, "
        "cast(len(regexp_extract_all(url, '/')) AS BIGINT) AS n_sl "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')) "
        "SELECT url, "
        f"CAST(CASE WHEN ln <= {URL_MAX_LEN} THEN 1 ELSE 0 END AS BIGINT) AS r_len, "
        "CAST(CASE WHEN 4 * n_dig <= ln THEN 1 ELSE 0 END AS BIGINT) AS r_digits, "
        f"CAST(CASE WHEN n_sl <= {URL_MAX_SLASHES} THEN 1 ELSE 0 END AS BIGINT) AS r_depth, "
        f"CAST(CASE WHEN host IN ({_blk}) THEN 0 ELSE 1 END AS BIGINT) AS r_host, "
        f"CAST(CASE WHEN {_tok} THEN 0 ELSE 1 END AS BIGINT) AS r_token, "
        f"CAST(CASE WHEN ln <= {URL_MAX_LEN} AND 4 * n_dig <= ln "
        f"AND n_sl <= {URL_MAX_SLASHES} AND host NOT IN ({_blk}) "
        f"AND NOT ({_tok}) THEN 1 ELSE 0 END AS BIGINT) AS url_pass "
        "FROM c"
    )
    # RFC 9309 robots re-audit: the oracle translates each robots pattern
    # to RE2 ITSELF ('*' -> '.*', trailing '$' -> anchor, '.' escaped) and
    # replays longest-match precedence (allow wins ties, no match = allow)
    # with a join + grouped MAX — only the spooled (host, pattern, allow)
    # ruleset is shared with the engine
    def _robots_cte(src_glob: str) -> str:
        """u/r/m/v CTE chain evaluating the RFC ruleset over the URL table
        at ``src_glob`` (the output spool for the re-audit queries, the
        trace for the tier composition)."""
        return (
            "u AS (SELECT url, host, CASE WHEN regexp_replace(url, '^[a-z+.-]+://[^/]*', '') = '' "
            "THEN '/' ELSE regexp_replace(url, '^[a-z+.-]+://[^/]*', '') END AS path "
            f"FROM read_parquet('{src_glob}')), "
            "r AS (SELECT host, allow, CAST(length(pattern) AS BIGINT) AS plen, "
            "'^' || replace(replace(CASE WHEN pattern LIKE '%$' THEN substr(pattern, 1, length(pattern) - 1) "
            "ELSE pattern END, '.', '\\.'), '*', '.*') "
            "|| CASE WHEN pattern LIKE '%$' THEN '$' ELSE '' END AS rx "
            f"FROM read_parquet('{ROBOTS_RULES_DIR}/*.parquet')), "
            "m AS (SELECT u.url, u.host, r.plen, r.allow FROM u "
            "LEFT JOIN r ON u.host = r.host AND regexp_matches(u.path, r.rx)), "
            "v AS (SELECT url, host, "
            "COALESCE(MAX(CASE WHEN allow THEN plen END), 0) AS allow_len, "
            "COALESCE(MAX(CASE WHEN NOT allow THEN plen END), -1) AS deny_len "
            "FROM m GROUP BY url, host) "
        )

    def _robots_cte2(src_glob: str, rules_dir: str, sfx: str) -> str:
        """The same u/r/m/v evaluation chain with suffixed CTE names and
        a parameterized rules spool, so two rulesets compose in one
        statement (crawl_robots_diff)."""
        return (
            f"u{sfx} AS (SELECT url, host, CASE WHEN regexp_replace(url, '^[a-z+.-]+://[^/]*', '') = '' "
            "THEN '/' ELSE regexp_replace(url, '^[a-z+.-]+://[^/]*', '') END AS path "
            f"FROM read_parquet('{src_glob}')), "
            f"r{sfx} AS (SELECT host, allow, CAST(length(pattern) AS BIGINT) AS plen, "
            "'^' || replace(replace(CASE WHEN pattern LIKE '%$' THEN substr(pattern, 1, length(pattern) - 1) "
            "ELSE pattern END, '.', '\\.'), '*', '.*') "
            "|| CASE WHEN pattern LIKE '%$' THEN '$' ELSE '' END AS rx "
            f"FROM read_parquet('{rules_dir}/*.parquet')), "
            f"m{sfx} AS (SELECT u{sfx}.url, u{sfx}.host, r{sfx}.plen, r{sfx}.allow FROM u{sfx} "
            f"LEFT JOIN r{sfx} ON u{sfx}.host = r{sfx}.host AND regexp_matches(u{sfx}.path, r{sfx}.rx)), "
            f"v{sfx} AS (SELECT url, host, "
            "COALESCE(MAX(CASE WHEN allow THEN plen END), 0) AS allow_len, "
            "COALESCE(MAX(CASE WHEN NOT allow THEN plen END), -1) AS deny_len "
            f"FROM m{sfx} GROUP BY url, host) "
        )

    _src_glob = f"{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet"
    sql["crawl_robots_diff"] = (
        "WITH "
        + _robots_cte2(_src_glob, ROBOTS_DIFF_OLD_DIR, "o")
        + ", "
        + _robots_cte2(_src_glob, ROBOTS_DIFF_NEW_DIR, "n")
        + ", j AS (SELECT vo.host, "
        "CAST(vo.allow_len >= vo.deny_len AS INT) AS ok_o, "
        "CAST(vn.allow_len >= vn.deny_len AS INT) AS ok_n "
        "FROM vo JOIN vn ON vn.url = vo.url) "
        "SELECT host, CAST(count(*) AS BIGINT) AS n_urls, "
        "CAST(sum(1 - ok_o) AS BIGINT) AS denied_old, "
        "CAST(sum(1 - ok_n) AS BIGINT) AS denied_new, "
        "CAST(sum(CASE WHEN ok_o = 1 AND ok_n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS newly_denied, "
        "CAST(sum(CASE WHEN ok_o = 0 AND ok_n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS newly_allowed "
        "FROM j GROUP BY host"
    )
    _robots_uv = _robots_cte(f"{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet")
    sql["crawl_robots_eval"] = (
        "WITH " + _robots_uv + "SELECT url, host, allow_len, deny_len, "
        "CAST(allow_len >= deny_len AS BIGINT) AS allowed FROM v"
    )
    sql["crawl_robots_audit"] = (
        "WITH " + _robots_uv + "SELECT host, "
        "CAST(SUM(CASE WHEN allow_len < deny_len THEN 1 ELSE 0 END) AS BIGINT) AS n_denied, "
        "CAST(SUM(CASE WHEN allow_len >= deny_len AND deny_len >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_override, "
        "CAST(COUNT(*) AS BIGINT) AS n_urls FROM v GROUP BY host"
    )
    # Frontier funnel: compose the robots verdict, URL-filter verdict and
    # spam-feature gate into stage survivor counts (each component CTE is
    # its already-certified oracle).
    sql["crawl_frontier_funnel"] = (
        "WITH " + _robots_uv
        + ", uf AS (" + sql["crawl_url_filter"] + "), "
        "sp AS (SELECT url, "
        r"regexp_extract(url, '^[a-z]+://[^/?#]*([^?#]*)', 1) AS p "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')), "
        "spf AS (SELECT url, CASE WHEN "
        "len(regexp_extract_all(p, '/')) <= 6 "
        "AND len(regexp_extract_all(p, '[0-9]')) <= 12 "
        "AND (SELECT coalesce(max(length(x.s)), 0) FROM "
        "unnest(string_split(p, '/')) AS x(s)) <= 40 THEN 1 ELSE 0 END AS nonspam FROM sp) "
        "SELECT 'total' AS stage, CAST(count(*) AS BIGINT) AS n FROM v "
        "UNION ALL SELECT 'robots', CAST(count(*) AS BIGINT) FROM v "
        "WHERE allow_len >= deny_len "
        "UNION ALL SELECT 'filter', CAST(count(*) AS BIGINT) FROM v "
        "JOIN uf USING (url) WHERE allow_len >= deny_len AND uf.url_pass = 1 "
        "UNION ALL SELECT 'nonspam', CAST(count(*) AS BIGINT) FROM v "
        "JOIN uf USING (url) JOIN spf USING (url) "
        "WHERE allow_len >= deny_len AND uf.url_pass = 1 AND spf.nonspam = 1"
    )
    from fscrawler_ray.pipelines.crawl_report import ROBOTS_DEMOTE_PERMILLE as _DEMOTE

    _w2_case = (
        "CASE tier2 "
        + " ".join(f"WHEN '{nm}' THEN {w}" for nm, _, w in TIER_BANDS)
        + f" ELSE {TIER_FLOOR[1]} END"
    )
    sql["crawl_tier_plan_robots"] = (
        "WITH "
        + _robots_cte(f"{CRAWL_ROLLUP_DIR}_trace/part-*.parquet")
        + ", aud AS (SELECT host, CAST(SUM(CASE WHEN allow_len < deny_len THEN 1 ELSE 0 END) "
        "* 1000 // COUNT(*) AS BIGINT) AS denied_permille FROM v GROUP BY host), "
        f"c AS (SELECT host, {_ch} AS ch "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')), "
        "h AS (SELECT host, CAST(count(*) AS BIGINT) AS n_urls, "
        "CAST(sum(ch) AS BIGINT) AS changes FROM c GROUP BY host), "
        f"hr AS (SELECT *, changes * 1000000 // (n_urls * {_k}) AS rate_micro FROM h), "
        f"ht AS (SELECT *, {_tier_case} AS tier FROM hr), "
        f"hd AS (SELECT ht.*, aud.denied_permille, CASE WHEN aud.denied_permille >= {_DEMOTE} "
        f"THEN '{TIER_FLOOR[0]}' ELSE ht.tier END AS tier2 FROM ht JOIN aud USING (host)), "
        f"hw AS (SELECT *, {_w2_case} AS w FROM hd), "
        "tt AS (SELECT tier2, SUM(n_urls) AS tier_urls, SUM(w * n_urls) AS tier_mass "
        "FROM hw GROUP BY tier2), "
        f"tq AS (SELECT tier2, tier_urls, {TIER_BUDGET} * tier_mass "
        "// (SELECT SUM(tier_mass) FROM tt) AS tier_quota FROM tt) "
        "SELECT hw.host, hw.n_urls, hw.changes, CAST(hw.rate_micro AS BIGINT) AS rate_micro, "
        "CAST(hw.denied_permille AS BIGINT) AS denied_permille, hw.tier2 AS tier, "
        "CAST(tq.tier_quota * hw.n_urls // tq.tier_urls AS BIGINT) AS budget "
        "FROM hw JOIN tq USING (tier2)"
    )
    from fscrawler_ray.pipelines.image_corpus import SHARD_CAP_BYTES as _CAP

    sql["crawl_curation_funnel"] = (
        "WITH t AS (SELECT image_id, url, host, CAST(w AS BIGINT) AS w, "
        "CAST(h AS BIGINT) AS h, caption, CAST(phash AS BIGINT) AS phash, "
        "CAST(size AS BIGINT) AS size, CAST(length(url) AS BIGINT) AS ln, "
        "cast(len(regexp_extract_all(url, '[0-9]')) AS BIGINT) AS n_dig, "
        "cast(len(regexp_extract_all(url, '/')) AS BIGINT) AS n_sl "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')), "
        "f AS (SELECT *, "
        f"CASE WHEN ln <= {URL_MAX_LEN} AND 4 * n_dig <= ln AND n_sl <= {URL_MAX_SLASHES} "
        f"AND host NOT IN ({_blk}) AND NOT ({_tok}) THEN 1 ELSE 0 END AS url_pass, "
        "CASE WHEN least(w, h) >= 48 AND 2 * greatest(w, h) <= 5 * least(w, h) "
        "AND len(regexp_extract_all(coalesce(caption, ''), '\\S+')) >= 3 "
        "THEN 1 ELSE 0 END AS ok FROM t), "
        "s2 AS (SELECT *, w * h AS px FROM f WHERE url_pass = 1 AND ok = 1), "
        "m AS (SELECT phash, max(px) AS best FROM s2 GROUP BY phash), "
        "win AS (SELECT s2.* FROM s2 JOIN m ON s2.phash = m.phash AND s2.px = m.best), "
        "k AS (SELECT phash, min(image_id) AS keeper FROM win GROUP BY phash), "
        "kr AS (SELECT win.size AS size FROM win JOIN k "
        "ON win.phash = k.phash AND win.image_id = k.keeper), "
        "tot AS (SELECT COALESCE(sum(size), 0) AS kb, count(*) AS nk FROM kr) "
        "SELECT 'total' AS stage, CAST(count(*) AS BIGINT) AS n FROM f "
        "UNION ALL SELECT 'url_pass', CAST(COALESCE(sum(url_pass), 0) AS BIGINT) FROM f "
        "UNION ALL SELECT 'quality', CAST(count(*) AS BIGINT) FROM s2 "
        "UNION ALL SELECT 'dedup', CAST(nk AS BIGINT) FROM tot "
        f"UNION ALL SELECT 'shards', CAST(CASE WHEN kb = 0 THEN 0 "
        f"ELSE (kb + {_CAP} - 1) // {_CAP} END AS BIGINT) FROM tot"
    )
    sql["crawl_host_overlap"] = (
        "WITH d AS (SELECT DISTINCT host, image_id "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')), "
        "hs AS (SELECT host, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY host), "
        "p AS (SELECT a.host AS host_a, b.host AS host_b, CAST(count(*) AS BIGINT) AS shared "
        "FROM d a JOIN d b ON a.image_id = b.image_id AND a.host < b.host "
        "GROUP BY 1, 2) "
        "SELECT p.host_a, p.host_b, p.shared, "
        "CAST(p.shared * 1000000 // (x.n + y.n - p.shared) AS BIGINT) AS jaccard_micro "
        "FROM p JOIN hs x ON x.host = p.host_a JOIN hs y ON y.host = p.host_b"
    )
    sql["crawl_exif_normalized"] = (
        "WITH ps AS (SELECT image_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h, "
        "CAST('0x' || substr(image_id, 5) AS UBIGINT) AS s "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')) "
        "SELECT image_id, CAST(1 + s % 8 AS BIGINT) AS exif_orientation, "
        "CAST(CASE WHEN 1 + s % 8 >= 5 THEN h ELSE w END AS BIGINT) AS norm_w, "
        "CAST(CASE WHEN 1 + s % 8 >= 5 THEN w ELSE h END AS BIGINT) AS norm_h "
        "FROM ps"
    )
    sql["crawl_round_profile"] = (
        "SELECT CAST(round AS BIGINT) AS round, CAST(count(*) AS BIGINT) AS n_urls, "
        "CAST(sum(COALESCE(size, 0)) AS BIGINT) AS total_bytes, "
        "CAST(count(DISTINCT host) AS BIGINT) AS n_hosts "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet') GROUP BY round"
    )
    sql["crawl_host_url_quality"] = (
        "WITH c AS (SELECT host, CAST(length(url) AS BIGINT) AS ln, "
        "cast(len(regexp_extract_all(url, '[0-9]')) AS BIGINT) AS n_dig, "
        "cast(len(regexp_extract_all(url, '/')) AS BIGINT) AS n_sl, url "
        f"FROM read_parquet('{CRAWL_ROLLUP_DIR}/round=*/table-*/*.parquet')), "
        f"f AS (SELECT host, CASE WHEN ln <= {URL_MAX_LEN} AND 4 * n_dig <= ln "
        f"AND n_sl <= {URL_MAX_SLASHES} AND host NOT IN ({_blk}) "
        f"AND NOT ({_tok}) THEN 1 ELSE 0 END AS p FROM c) "
        "SELECT host, CAST(count(*) AS BIGINT) AS n_urls, CAST(sum(p) AS BIGINT) AS n_pass, "
        "CAST(sum(p) * 1000000 // count(*) AS BIGINT) AS pass_rate_micro "
        "FROM f GROUP BY host"
    )
    sql["images_phash_dedup_spool"] = (
        "SELECT CAST(phash AS BIGINT) AS phash, min(image_id) AS keeper_image_id, "
        "CAST(count(*) AS BIGINT) AS copies "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet') "
        "GROUP BY phash HAVING count(*) > 1"
    )
    sql["images_shard_roundtrip"] = (
        "SELECT image_id, CAST(octet_length(bytes) AS BIGINT) AS nbytes, "
        "md5(hex(bytes)) AS payload_md5 "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')"
    )
    # WebDataset tar export: the oracle PREDICTS each archive's on-disk
    # size from pure ustar 512-block arithmetic (one header block per
    # member + data rounded up to 512, archive = data + two zero blocks
    # rounded up to the 10240 record), over the same prefix-sum shard
    # assignment the parquet-blob manifest replays — while the engine
    # reports os.path.getsize of the real tar files it wrote
    sql["images_wds_export"] = (
        "WITH t AS (SELECT image_id, CAST(octet_length(bytes) AS BIGINT) AS nb, "
        "CAST(octet_length(encode(caption)) AS BIGINT) AS cb, "
        "CAST(floor(coalesce(sum(octet_length(bytes)) OVER "
        "(ORDER BY image_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        f"/ {SHARD_CAP_BYTES}) AS BIGINT) AS shard "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')), "
        "s AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_samples, "
        "CAST(sum(nb) AS BIGINT) AS img_bytes, CAST(sum(cb) AS BIGINT) AS cap_bytes, "
        "sum(1024 + 512 * ((nb + 511) // 512) + 512 * ((cb + 511) // 512)) AS data_bytes "
        "FROM t GROUP BY shard) "
        "SELECT shard, n_samples, img_bytes, cap_bytes, "
        "CAST(((data_bytes + 1024 + 10239) // 10240) * 10240 AS BIGINT) AS tar_bytes FROM s"
    )
    sql["images_wds_roundtrip"] = (
        "SELECT image_id, CAST(octet_length(bytes) AS BIGINT) AS nbytes, "
        "md5(hex(bytes)) AS payload_md5, caption "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')"
    )
    sql["images_codec_efficiency"] = (
        "SELECT fmt, CAST(count(*) AS BIGINT) AS n_images, "
        "CAST(sum(octet_length(bytes)) AS BIGINT) AS total_bytes, "
        "CAST(sum(CAST(w AS BIGINT) * h) AS BIGINT) AS total_px, "
        "CAST(sum(octet_length(bytes)) * 1000000 // sum(CAST(w AS BIGINT) * h) AS BIGINT) "
        "AS bytes_per_px_micro "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet') GROUP BY fmt"
    )
    sql["images_caption_dedup"] = (
        "SELECT caption, min(image_id) AS keeper_image_id, "
        "CAST(count(*) AS BIGINT) AS n_images "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet') "
        "GROUP BY caption HAVING count(*) > 1"
    )
    # band value = (ph >> 16b) & 0xFFFF: the mask keeps only bits that are
    # identical under arithmetic (DuckDB) and logical (numpy uint64) shift
    sql["images_phash_neardup_spool"] = (
        "WITH t AS (SELECT image_id, CAST(phash AS BIGINT) AS ph "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')), "
        "b AS (SELECT band, (ph >> (16 * band)) & 65535 AS bucket, image_id, ph "
        "FROM t, (VALUES (0), (1), (2), (3)) v(band)) "
        "SELECT DISTINCT x.image_id AS image_a, y.image_id AS image_b, "
        "CAST(bit_count(xor(x.ph, y.ph)) AS BIGINT) AS hamming "
        "FROM b x JOIN b y ON x.band = y.band AND x.bucket = y.bucket "
        "AND x.image_id < y.image_id "
        "WHERE bit_count(xor(x.ph, y.ph)) <= 6"
    )
    sql["images_split_leakage"] = (
        "WITH p AS ("
        + sql["images_phash_neardup_spool"]
        + "), s AS (SELECT image_id, "
        + _split_case("image_id")
        + f" AS split FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')) "
        "SELECT p.image_a, p.image_b, sa.split AS split_a, sb.split AS split_b, p.hamming "
        "FROM p JOIN s sa ON sa.image_id = p.image_a JOIN s sb ON sb.image_id = p.image_b "
        "WHERE sa.split <> sb.split"
    )
    sql["images_neardup_groups_spool"] = (
        "WITH RECURSIVE t AS (SELECT image_id, CAST(phash AS BIGINT) AS ph "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')), "
        "bb AS (SELECT band, (ph >> (16 * band)) & 65535 AS bucket, image_id, ph "
        "FROM t, (VALUES (0), (1), (2), (3)) v(band)), "
        "p AS (SELECT DISTINCT x.image_id AS a, y.image_id AS b "
        "FROM bb x JOIN bb y ON x.band = y.band AND x.bucket = y.bucket "
        "AND x.image_id < y.image_id "
        "WHERE bit_count(xor(x.ph, y.ph)) <= 6), "
        "e AS (SELECT a, b FROM p UNION SELECT b, a FROM p), "
        "reach(a, b) AS ((SELECT a, a FROM e UNION SELECT a, b FROM e) "
        "UNION SELECT r.a, e.b FROM reach r JOIN e ON e.a = r.b) "
        "SELECT a AS image_id, min(b) AS canonical_id FROM reach GROUP BY a"
    )
    sql["images_phash_banded_recall"] = (
        "WITH t AS (SELECT image_id, CAST(phash AS BIGINT) AS ph "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')), "
        "tr AS (SELECT x.image_id AS a, y.image_id AS b FROM t x JOIN t y "
        "ON x.image_id < y.image_id WHERE bit_count(xor(x.ph, y.ph)) <= 6), "
        "bb AS (SELECT band, (ph >> (16 * band)) & 65535 AS bucket, image_id, ph "
        "FROM t, (VALUES (0), (1), (2), (3)) v(band)), "
        "bd AS (SELECT DISTINCT x.image_id AS a, y.image_id AS b "
        "FROM bb x JOIN bb y ON x.band = y.band AND x.bucket = y.bucket "
        "AND x.image_id < y.image_id WHERE bit_count(xor(x.ph, y.ph)) <= 6), "
        "e AS (SELECT count(*) AS n_true FROM tr), "
        "l AS (SELECT count(*) AS n_banded FROM bd), "
        "f AS (SELECT count(*) AS n_found FROM tr JOIN bd USING (a, b)) "
        "SELECT CAST(e.n_true AS BIGINT) AS n_true, CAST(l.n_banded AS BIGINT) AS n_banded, "
        "CAST(f.n_found AS BIGINT) AS n_found, "
        "CAST(CASE WHEN e.n_true = 0 THEN 0 ELSE f.n_found * 1000000 // e.n_true END AS BIGINT) AS recall_micro "
        "FROM e, l, f"
    )
    sql["images_dedup_keep_best_spool"] = (
        "WITH s AS (SELECT CAST(phash AS BIGINT) AS phash, image_id, "
        "CAST(w AS BIGINT) * h AS px "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')), "
        "m AS (SELECT phash, max(px) AS best_px FROM s GROUP BY phash) "
        "SELECT s.phash, min(s.image_id) AS keeper_image_id, "
        "CAST(count(*) AS BIGINT) AS ties "
        "FROM s JOIN m USING (phash) WHERE s.px = m.best_px GROUP BY s.phash"
    )
    from fscrawler_ray.pipelines.image_corpus import SHARD_CAP_BYTES as _BCAP

    sql["images_bucketed_shards"] = (
        f"WITH im AS (SELECT image_id, w, h, octet_length(bytes) AS nb "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')), "
        f"lad AS (SELECT * FROM (VALUES {_lad_rows}) AS v(i, lbl, r)), "
        "d AS (SELECT image_id, lbl, i, abs(ln(CAST(w AS DOUBLE) / h) - ln(r)) AS dist FROM im, lad), "
        "pick AS (SELECT image_id, lbl FROM (SELECT *, row_number() OVER ("
        "PARTITION BY image_id ORDER BY dist, i) AS rn FROM d) WHERE rn = 1) "
        "SELECT im.image_id, pick.lbl AS bucket, CAST(im.nb AS BIGINT) AS nbytes, "
        "CAST(floor(coalesce(sum(im.nb) OVER (PARTITION BY pick.lbl ORDER BY im.image_id "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {_BCAP}) AS BIGINT) AS shard "
        "FROM im JOIN pick ON pick.image_id = im.image_id"
    )
    sql["images_caption_conflict"] = (
        "SELECT CAST(phash AS BIGINT) AS phash, CAST(count(*) AS BIGINT) AS n_images, "
        "CAST(count(DISTINCT caption) AS BIGINT) AS n_captions, "
        "CAST(count(DISTINCT caption) >= 2 AS BIGINT) AS has_conflict, "
        "min(image_id) AS keeper_image_id "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet') "
        "GROUP BY phash HAVING count(*) >= 2"
    )
    # caption self-retrieval: identical \W+ tokenization, distinct-token
    # overlap join, better-than-self count with (score, image_id) tie-break
    sql["images_caption_selfrank"] = (
        f"WITH cap AS (SELECT image_id, caption FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')), "
        "q AS (SELECT image_id AS qid, caption FROM cap ORDER BY image_id LIMIT 8), "
        "qt AS (SELECT DISTINCT qid, tok FROM (SELECT qid, "
        "unnest(string_split_regex(lower(caption), '\\W+')) AS tok FROM q) WHERE tok <> ''), "
        "ct AS (SELECT DISTINCT image_id, tok FROM (SELECT image_id, "
        "unnest(string_split_regex(lower(caption), '\\W+')) AS tok FROM cap) WHERE tok <> ''), "
        "qs AS (SELECT qid, count(*) AS selfscore FROM qt GROUP BY qid), "
        "sc AS (SELECT qt.qid, ct.image_id, count(*) AS s FROM qt "
        "JOIN ct ON ct.tok = qt.tok GROUP BY qt.qid, ct.image_id), "
        "bt AS (SELECT qs.qid, count(*) AS n_better FROM qs JOIN sc ON sc.qid = qs.qid "
        "WHERE sc.s > qs.selfscore OR (sc.s = qs.selfscore AND sc.image_id < qs.qid) "
        "GROUP BY qs.qid) "
        "SELECT qs.qid AS image_id, CAST(qs.selfscore AS BIGINT) AS self_overlap, "
        "CAST(1 + COALESCE(bt.n_better, 0) AS BIGINT) AS self_rank "
        "FROM qs LEFT JOIN bt USING (qid)"
    )
    sql["images_caption_features"] = (
        "WITH c AS (SELECT image_id, caption, "
        "CAST(length(caption) AS DOUBLE) AS n_chars, "
        "CAST(len(regexp_extract_all(caption, '\\S+')) AS DOUBLE) AS n_tokens, "
        "CAST(len(regexp_extract_all(caption, '[^\\w\\s]')) AS DOUBLE) AS n_punct "
        f"FROM read_parquet('{IMAGES_SPOOL_DIR}/*.parquet')), "
        "l AS (SELECT image_id, "
        "len(regexp_extract_all(lower(caption), '\\b(the|and|of|to|is|that|with|for)\\b')) AS c0, "
        "len(regexp_extract_all(lower(caption), '\\b(le|la|les|des|est|que|une|dans)\\b')) AS c1, "
        "len(regexp_extract_all(lower(caption), '\\b(der|die|und|das|ist|nicht|ein|mit)\\b')) AS c2, "
        "len(regexp_extract_all(lower(caption), '\\b(el|los|las|que|una|por|con|para)\\b')) AS c3, "
        "len(regexp_extract_all(lower(caption), '的|是|了|在|我|有|和|不')) AS c4 FROM c) "
        "SELECT c.image_id, CAST(c.n_tokens AS BIGINT) AS caption_tokens, "
        "CASE WHEN regexp_extract(c.caption, '\\+\\+*') = '' THEN NULL "
        "ELSE least(CAST(length(regexp_extract(c.caption, '\\+\\+*')) AS BIGINT), 5) END AS rating, "
        "(c.n_chars - (c.n_tokens - 1.0)) / greatest(c.n_tokens, 1.0) AS mean_token_len, "
        "c.n_punct / greatest(c.n_chars, 1.0) AS punct_ratio, "
        "CASE WHEN l.c0 + l.c1 + l.c2 + l.c3 + l.c4 = 0 THEN 'und' "
        "WHEN l.c0 >= l.c1 AND l.c0 >= l.c2 AND l.c0 >= l.c3 AND l.c0 >= l.c4 THEN 'en' "
        "WHEN l.c1 >= l.c2 AND l.c1 >= l.c3 AND l.c1 >= l.c4 THEN 'fr' "
        "WHEN l.c2 >= l.c3 AND l.c2 >= l.c4 THEN 'de' "
        "WHEN l.c3 >= l.c4 THEN 'es' ELSE 'zh' END AS caption_lang "
        "FROM c JOIN l ON c.image_id = l.image_id"
    )
    return sql
