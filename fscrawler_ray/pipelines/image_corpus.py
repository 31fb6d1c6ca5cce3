"""LAION-style image-corpus curation: quality filters + caption-image
consistency over the input_hint image table (image_id, bytes, w, h, fmt,
caption, phash).

The filter ladder is ordered by cost, the way a 100-TB curation run must
be: metadata predicates (size / aspect / caption length) drop rows
vectorized BEFORE any payload is decoded; only survivors pay the decode,
inside an actor-pool stage (codec state per actor, not per batch).
Per-rule drop tallies fold as tiny integer partials — the image twin of
corpus.clean_text_corpus's audit stance (and like that twin, the kept
stream stays lazy; consuming BOTH the tally and the kept rows costs two
passes, which is the streaming trade Ray Data makes for never pinning
the corpus).

Reference analog: the reference crawler filters paths/extensions before
processing payloads (app/filters/* ordering, SURVEY §2.2); re-expressed
here for pixel payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import codecs

DEFAULT_RULES = {
    "min_side": 48,  # thumbnails/icons out
    "max_aspect": 2.5,  # banners out
    "min_caption_tokens": 3,  # unusable alt-text out
    "brightness_lo": 0.08,  # near-black decodes out
    "brightness_hi": 0.97,  # blown-out decodes out
}

_DROP_COLS = ("drop_small", "drop_aspect", "drop_caption", "drop_dark", "drop_bright", "kept")


def _meta_flags(b: pa.Table, rules: dict):
    """Vectorized metadata predicates — no decode, no Python rows."""
    w = b.column("w").to_numpy(zero_copy_only=False).astype(np.float64)
    h = b.column("h").to_numpy(zero_copy_only=False).astype(np.float64)
    small = (w < rules["min_side"]) | (h < rules["min_side"])
    aspect = (np.maximum(w, h) / np.minimum(w, h)) > rules["max_aspect"]
    cap = pc.coalesce(b.column("caption"), pa.scalar(""))
    ntok = pc.list_value_length(pc.split_pattern_regex(cap, r"\s+")).to_numpy(zero_copy_only=False)
    # split counts empty fragments; a caption of pure whitespace is 0 tokens
    blank = pc.equal(pc.utf8_trim_whitespace(cap), "").to_numpy(zero_copy_only=False)
    thin_caption = np.where(blank, 0, ntok) < rules["min_caption_tokens"]
    return small, aspect, thin_caption


class _QualityStage:
    """Actor-pool stage: metadata ladder first, decode only survivors.
    ``emit`` picks the output view — 'rows' (kept rows + brightness) or
    'tally' (one 6-int audit row per batch)."""

    def __init__(self, rules: dict, emit: str):
        self.rules = dict(DEFAULT_RULES, **(rules or {}))
        self.emit = emit

    def __call__(self, b: pa.Table) -> pa.Table:
        rules = self.rules
        small, aspect, thin = _meta_flags(b, rules)
        need_decode = ~(small | aspect | thin)
        bright = np.zeros(b.num_rows, dtype=np.float64)
        undecodable = np.zeros(b.num_rows, dtype=bool)
        for i in np.flatnonzero(need_decode):  # payload decode: per-row by nature
            try:
                img, _, _, _ = codecs.decode(b.column("bytes")[int(i)].as_py())
                bright[i] = float(img.astype(np.float32).mean()) / 255.0
            except Exception:
                undecodable[i] = True
        dark = need_decode & ~undecodable & (bright < rules["brightness_lo"])
        blown = need_decode & ~undecodable & (bright > rules["brightness_hi"])
        kept = need_decode & ~undecodable & ~dark & ~blown
        if self.emit == "rows":
            return b.filter(pa.array(kept)).append_column(
                "brightness", pa.array(bright[kept], pa.float64())
            )
        return pa.table(
            {
                "drop_small": pa.array([int(small.sum())], pa.int64()),
                "drop_aspect": pa.array([int((aspect & ~small).sum())], pa.int64()),
                "drop_caption": pa.array([int((thin & ~small & ~aspect).sum())], pa.int64()),
                "drop_dark": pa.array([int((dark | undecodable).sum())], pa.int64()),
                "drop_bright": pa.array([int(blown.sum())], pa.int64()),
                "kept": pa.array([int(kept.sum())], pa.int64()),
            }
        )


def clean_image_corpus(images_ds, rules: dict | None = None, concurrency=(1, 4), batch_size: int = 64):
    """(kept Dataset — lazy, payload retained, + brightness column;
    per-rule tally dict folded from one streaming audit pass)."""
    kept = images_ds.map_batches(
        _QualityStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"rules": rules or {}, "emit": "rows"},
    )
    tally_ds = images_ds.map_batches(
        _QualityStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"rules": rules or {}, "emit": "tally"},
    )
    agg = {c: 0 for c in _DROP_COLS}
    for tb in tally_ds.iter_batches(batch_format="pyarrow"):
        for c in _DROP_COLS:
            s = pc.sum(tb.column(c))
            agg[c] += int(s.as_py() or 0)
    return kept, agg


def caption_consistency(images_ds, concurrency=(1, 4), batch_size: int = 64):
    """Caption-image agreement score (the CLIP-filter shape with a
    deterministic stand-in model): decode → pixel-derived descriptor
    words (hue / brightness / texture, as the caption extractor emits
    them) → score = fraction of descriptor words the stored caption
    contains.  Emits (image_id, consistency); a LAION-style alignment
    threshold then becomes one streaming filter.

    A learned scorer slots into the same actor stage (weights loaded
    once in __init__) without touching the pipeline shape."""
    from ..stages.multimodal import CaptionExtractStage

    return images_ds.map_batches(
        _ConsistencyStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _consistency_cls():
    from ..stages.multimodal import CaptionExtractStage

    class _Score(CaptionExtractStage):
        def __call__(self, b: pa.Table) -> pa.Table:
            feats = CaptionExtractStage.__call__(self, b)
            stored = pc.utf8_lower(pc.coalesce(b.column("caption"), pa.scalar(""))).to_pylist()
            derived = feats.column("extracted_caption").to_pylist()
            score = np.zeros(b.num_rows, dtype=np.float64)
            for i, (s, d) in enumerate(zip(stored, derived)):
                if not d:
                    continue  # undecodable → 0.0
                words = [w for w in d.split() if w not in ("a", "image")]
                score[i] = sum(1.0 for w in words if w in s) / max(1, len(words))
            return pa.table(
                {"image_id": b.column("image_id"), "consistency": pa.array(score, pa.float64())}
            )

    return _Score


_ConsistencyStage = _consistency_cls()


# ---------------------------------------------------------------------------
# aspect-ratio bucketing (diffusion-training batch packing)
# ---------------------------------------------------------------------------

# NovelAI-style ratio ladder: every image joins the bucket whose aspect
# is nearest in log space, so batches share a crop geometry
ASPECT_LADDER = ((1, 1), (5, 4), (4, 5), (4, 3), (3, 4), (3, 2), (2, 3), (16, 9), (9, 16))


def _bucket_labels(w: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Vectorized nearest-log-ratio bucket label ('4:3', ...) per image."""
    ladder = np.array([rw / rh for rw, rh in ASPECT_LADDER])
    d = np.abs(np.log(w / h)[:, None] - np.log(ladder)[None, :])
    labels = np.array([f"{rw}:{rh}" for rw, rh in ASPECT_LADDER], dtype=object)
    return labels[d.argmin(axis=1)]


def aspect_buckets(ds, batch_size: int = 16, range_hex: int = 6):
    """Aspect-ratio bucketing: assign every image to its nearest-ratio
    bucket, then pack each bucket into fixed-size training batches in
    image_id order — the image twin of textops.pack_by_budget's two-level
    scan, run PER BUCKET:

    1. metadata stage (no decode): bucket label from (w, h), plus a range
       key ``rng`` = the image_id's leading bytes (a lex-order-preserving
       PREFIX of the id for any id scheme, so per-(bucket, rng) groups
       concatenate in global image_id order);
    2. per-(bucket, rng) counts → driver-side exclusive cumsum per bucket
       (range-table-sized) → broadcast offsets;
    3. per-group local sort + arange + offset → global position in the
       bucket → ``batch_idx`` = position // batch_size.

    No global sort, no driver row loop; payload bytes never leave the
    first projection.  Output: (image_id, bucket, batch_idx)."""
    import pandas as pd

    import ray as _ray

    from .analytics import grouped_sum

    def prep(b: pa.Table) -> pa.Table:
        w = b.column("w").to_numpy(zero_copy_only=False).astype(np.float64)
        h = b.column("h").to_numpy(zero_copy_only=False).astype(np.float64)
        ids = b.column("image_id")
        rng = pc.binary_slice(ids.cast(pa.binary()), 0, 4 + range_hex).cast(pa.string())
        return pa.table(
            {
                "image_id": ids,
                "bucket": pa.array(_bucket_labels(w, h), pa.string()),
                "rng": rng,
            }
        )

    slim = ds.map_batches(prep, batch_format="pyarrow").materialize()
    totals = grouped_sum(slim, ["bucket", "rng"], {}, count_out="n").to_pandas()
    totals = totals.sort_values(["bucket", "rng"]).reset_index(drop=True)
    totals["off"] = totals.groupby("bucket")["n"].cumsum() - totals["n"]
    offs_ref = _ray.put({(r.bucket, r.rng): int(r.off) for r in totals.itertuples()})

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        offs = _ray.get(offs_ref)
        g = g.sort_values("image_id")
        base = offs[(g["bucket"].iat[0], g["rng"].iat[0])]
        pos = base + np.arange(len(g), dtype=np.int64)
        return pd.DataFrame(
            {
                "image_id": g["image_id"].to_numpy(),
                "bucket": g["bucket"].to_numpy(),
                "batch_idx": pos // batch_size,
            }
        )

    return slim.groupby(["bucket", "rng"]).map_groups(pack, batch_format="pandas")


# ---------------------------------------------------------------------------
# WebDataset-style training-shard assignment

SHARD_CAP_BYTES = 512 * 1024  # payload bytes per training shard


def shard_manifest(images_ds, cap: int = SHARD_CAP_BYTES, range_width: int = 64):
    """WebDataset-style shard assignment: images in image_id order are
    packed into ``cap``-byte training shards by cumulative payload offset
    (shard = floor(exclusive-prefix-bytes / cap)) — the deterministic,
    resumable layout a 100-TB image-corpus export wants: any shard can be
    re-cut independently because its membership is a pure function of the
    byte prefix sum, not of which writer task ran.

    Reuses textops.pack_by_budget's two-level distributed prefix scan
    (per-range totals → broadcast offsets → in-range cumsum), so nothing
    corpus-sized is sorted globally and payload BYTES never shuffle —
    only (image_id, nbytes) rides the scan.

    Output: (image_id, nbytes, shard) — one row per image.
    """
    import numpy as np

    from .textops import pack_by_budget

    def slim(b: pa.Table) -> pa.Table:
        ids = b.column("image_id")
        nbytes = pc.binary_length(b.column("bytes")).cast(pa.int64())
        num = pc.utf8_slice_codeunits(ids, 4, 14).cast(pa.int64())
        return pa.table(
            {
                "image_id": ids,
                "nbytes": nbytes,
                "rng": pc.divide(num, range_width),
            }
        )

    s = images_ds.map_batches(slim, batch_format="pyarrow").materialize()
    packed = pack_by_budget(s, "nbytes", cap, ["image_id"])
    return packed.map_batches(
        lambda b: pa.table(
            {
                "image_id": b.column("image_id"),
                "nbytes": b.column("nbytes").cast(pa.int64()),
                "shard": b.column("bin").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def write_shards(images_ds, out_dir: str, cap: int = SHARD_CAP_BYTES, range_width: int = 64):
    """Materialize the shard layout ``shard_manifest`` plans: one payload
    blob per shard (concatenated image bytes in image_id order) plus an
    index parquet per shard recording (image_id, offset, nbytes) — the
    WebDataset/tar-analog export a training loader memory-maps.

    Resumable by construction (the W2 batched-commit stance,
    crawl/engine.py round partitions): a shard whose blob AND index both
    exist is skipped on re-run, so a failed export restarts where it died;
    blob+index are written blob-first and the index last, making the index
    the commit marker.  Shard membership is a pure prefix-sum function, so
    a re-cut after a failure reproduces identical files.

    The one wide step is the shard-keyed groupby that co-locates each
    shard's payload rows in its writer task; shard ids are contiguous in
    image_id order, so the exchange is near-local, and each group is
    cap-bounded (≤ cap + one straddling item).

    Returns the per-shard summary (shard, n_items, total_bytes, skipped).
    """
    import os

    os.makedirs(out_dir, exist_ok=True)

    assign = shard_manifest(images_ds, cap=cap, range_width=range_width)
    from ..stages.joins import join as _join

    rows = _join(
        images_ds.map_batches(
            lambda b: b.select(["image_id", "bytes"]), batch_format="pyarrow"
        ),
        assign,
        on="image_id",
        how="inner",
    )

    def write_one(g):
        import pandas as pd

        g = g.sort_values("image_id")
        shard = int(g["shard"].iloc[0])
        blob_path = os.path.join(out_dir, f"shard-{shard:06d}.bin")
        idx_path = os.path.join(out_dir, f"shard-{shard:06d}.index.parquet")
        if os.path.exists(idx_path) and os.path.exists(blob_path):
            return pd.DataFrame(
                {
                    "shard": [shard],
                    "n_items": [len(g)],
                    "total_bytes": [int(g["nbytes"].sum())],
                    "skipped": [True],
                }
            )
        payloads = g["bytes"].tolist()
        sizes = np.array([len(p) for p in payloads], np.int64)
        offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        with open(blob_path, "wb") as f:
            for p in payloads:
                f.write(p)
        idx = pa.table(
            {
                "image_id": pa.array(g["image_id"].tolist(), pa.string()),
                "offset": pa.array(offs),
                "nbytes": pa.array(sizes),
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(idx, idx_path)  # index last = commit marker
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_items": [len(g)],
                "total_bytes": [int(sizes.sum())],
                "skipped": [False],
            }
        )

    return rows.groupby("shard").map_groups(write_one, batch_format="pandas")


def curation_funnel(out_dir: str, cap: int = SHARD_CAP_BYTES):
    """LAION-style end-to-end curation FUNNEL over a crawl snapshot — the
    composed pipeline an image-corpus team actually runs, reported as
    stage-by-stage survivor counts:

      total      all crawled rows
      url_pass   FineWeb-style URL rules (crawl_report.url_flag_batch)
      quality    + metadata quality ladder (min side 48, aspect ≤ 2.5,
                 caption ≥ 3 tokens — integer predicates)
      dedup      + exact-pixel dedup: one keep-best-resolution keeper per
                 phash group (argmax w·h, ties → min image_id)
      shards     byte-budget shard count over the keepers' payload sizes

    Shape: one URL-sized streaming flag pass with per-block integer
    partials (total/url/quality counts never shuffle rows), ONE
    phash-keyed groupby over quality survivors for the keeper argmax, and
    a scalar shard-count fold — no stage materializes the corpus."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    from .crawl_report import url_flag_batch

    ds = ray.data.read_parquet(
        out_dir, columns=["image_id", "url", "host", "w", "h", "caption", "phash", "size"]
    )

    def flags(b: pa.Table) -> pa.Table:
        up = url_flag_batch(b.column("url"), b.column("host")).column("url_pass")
        w = b.column("w").cast(pa.int64())
        h = b.column("h").cast(pa.int64())
        cap_ = pc.coalesce(b.column("caption"), pa.scalar(""))
        ntok = pc.count_substring_regex(cap_, r"\S+").cast(pa.int64())
        mx = pc.max_element_wise(w, h)
        mn = pc.min_element_wise(w, h)
        ok = pc.and_(
            pc.and_(pc.greater_equal(mn, 48), pc.less_equal(pc.multiply(mx, 2), pc.multiply(mn, 5))),
            pc.greater_equal(ntok, 3),
        ).cast(pa.int64())
        return pa.table(
            {
                "image_id": b.column("image_id"),
                "phash": b.column("phash").cast(pa.int64()),
                "px": pc.multiply(w, h),
                "size": b.column("size").cast(pa.int64()),
                "url_pass": up,
                "quality": pc.multiply(up, ok),
            }
        )

    flagged = ds.map_batches(flags, batch_format="pyarrow").materialize()

    def counts(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "total": pa.array([b.num_rows], pa.int64()),
                "url_pass": pa.array([pc.sum(b.column("url_pass")).as_py() or 0], pa.int64()),
                "quality": pa.array([pc.sum(b.column("quality")).as_py() or 0], pa.int64()),
            }
        )

    partial = flagged.map_batches(counts, batch_format="pyarrow").to_pandas()
    n_total, n_url, n_qual = (int(partial[c].sum()) for c in ("total", "url_pass", "quality"))

    surv = flagged.map_batches(
        lambda b: b.filter(pc.equal(b.column("quality"), 1)), batch_format="pyarrow"
    ).materialize()  # consumed by the max pass AND the winner filter
    # keeper = argmax px per phash (tie → min image_id): grouped max, join
    # back, then min image_id among winners, then the keeper's size
    best = surv.groupby("phash").aggregate(Max("px"))
    best = best.map_batches(lambda b: b.rename_columns(["phash", "best_px"]), batch_format="pyarrow")
    from ..stages.joins import join as _join

    winners = _join(surv, best.materialize(), on="phash", how="inner").map_batches(
        lambda b: b.filter(pc.equal(b.column("px"), b.column("best_px"))),
        batch_format="pyarrow",
    ).materialize()  # consumed by the keeper-min pass AND the size lookup
    keep = winners.groupby("phash").aggregate(Min("image_id"))
    keep = keep.map_batches(
        lambda b: b.rename_columns(["phash", "keeper_id"]), batch_format="pyarrow"
    )
    keeper_rows = _join(winners, keep.materialize(), on="phash", how="inner").map_batches(
        lambda b: b.filter(pc.equal(b.column("image_id"), b.column("keeper_id"))),
        batch_format="pyarrow",
    )
    agg = keeper_rows.map_batches(
        lambda b: pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "bytes": pa.array([pc.sum(b.column("size")).as_py() or 0], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    n_keep, keep_bytes = int(agg["n"].sum()), int(agg["bytes"].sum())
    n_shards = (keep_bytes + cap - 1) // cap if keep_bytes else 0
    return pa.table(
        {
            "stage": pa.array(["total", "url_pass", "quality", "dedup", "shards"], pa.string()),
            "n": pa.array([n_total, n_url, n_qual, n_keep, n_shards], pa.int64()),
        }
    )


def read_shards(out_dir: str):
    """Read back a ``write_shards`` export as a Dataset of
    (image_id, bytes, shard) — the loader side of the WebDataset-style
    sink, one task per shard (the shard list is shard-count-bounded on
    the driver; payload bytes are read inside the tasks, never the
    driver)."""
    import glob
    import os
    import re

    import ray

    idxs = sorted(glob.glob(os.path.join(out_dir, "shard-*.index.parquet")))
    shards = [int(re.search(r"shard-(\d+)", os.path.basename(p)).group(1)) for p in idxs]
    t = pa.table(
        {
            "shard": pa.array(shards, pa.int64()),
            "idx_path": pa.array(idxs, pa.string()),
            "blob_path": pa.array(
                [p.replace(".index.parquet", ".bin") for p in idxs], pa.string()
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(max(1, len(shards)))

    def load(b: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for shard, ip, bp in zip(
            b.column("shard").to_pylist(),
            b.column("idx_path").to_pylist(),
            b.column("blob_path").to_pylist(),
        ):
            idx = pq.read_table(ip)
            with open(bp, "rb") as f:
                blob = f.read()
            offs = idx.column("offset").to_pylist()
            szs = idx.column("nbytes").to_pylist()
            outs.append(
                pa.table(
                    {
                        "image_id": idx.column("image_id"),
                        "bytes": pa.array([blob[o : o + n] for o, n in zip(offs, szs)], pa.binary()),
                        "shard": pa.array([shard] * len(offs), pa.int64()),
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "image_id": pa.array([], pa.string()),
                    "bytes": pa.array([], pa.binary()),
                    "shard": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(outs)

    return ds.map_batches(load, batch_format="pyarrow", batch_size=1)


_TAR_BLK = 512  # ustar block size
_TAR_REC = 10240  # ustar record (blocking factor 20): archives pad to this


def _tar_info(name: str, size: int):
    """Fully pinned ustar member header — every field fixed so the same
    sample set always produces byte-identical archives (resumability +
    the size-arithmetic oracle both depend on determinism)."""
    import tarfile

    ti = tarfile.TarInfo(name)
    ti.size = size
    ti.mtime = 0
    ti.mode = 0o644
    ti.uid = ti.gid = 0
    ti.uname = ti.gname = ""
    return ti


def write_tar_shards(images_ds, out_dir: str, cap: int = SHARD_CAP_BYTES, range_width: int = 64):
    """WebDataset tar export: the interop format image-training loaders
    consume directly.  Same deterministic prefix-sum shard assignment as
    ``write_shards`` (shard = floor(exclusive-byte-prefix / cap), so any
    shard re-cuts independently), but each shard is a POSIX ustar archive
    holding two members per sample — ``{image_id}.{fmt}`` (payload) and
    ``{image_id}.txt`` (caption) — with every header field pinned
    (mtime 0, uid/gid 0) so re-exports are byte-identical.

    Resumable like write_shards: an existing ``.tar`` whose trailing
    ``.done`` marker exists is skipped (tar has no atomic index file, so
    the marker is the commit point; a crash mid-archive leaves no marker
    and the shard is rewritten from its pure-function membership).

    Returns per-shard (shard, n_samples, img_bytes, cap_bytes, tar_bytes,
    skipped) where tar_bytes is the REAL on-disk archive size — the SQL
    oracle predicts it from pure 512-block arithmetic, certifying the
    writer end-to-end."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    assign = shard_manifest(images_ds, cap=cap, range_width=range_width)
    from ..stages.joins import join as _join

    rows = _join(
        images_ds.map_batches(
            lambda b: b.select(["image_id", "bytes", "fmt", "caption"]),
            batch_format="pyarrow",
        ),
        assign,
        on="image_id",
        how="inner",
    )

    def write_one(g):
        import tarfile

        import pandas as pd

        g = g.sort_values("image_id")
        shard = int(g["shard"].iloc[0])
        tar_path = os.path.join(out_dir, f"shard-{shard:06d}.tar")
        done_path = tar_path + ".done"
        caps = [c.encode() for c in g["caption"].tolist()]
        img_bytes = int(g["nbytes"].sum())
        cap_bytes = int(sum(len(c) for c in caps))
        if os.path.exists(done_path) and os.path.exists(tar_path):
            return pd.DataFrame(
                {
                    "shard": [shard],
                    "n_samples": [len(g)],
                    "img_bytes": [img_bytes],
                    "cap_bytes": [cap_bytes],
                    "tar_bytes": [int(os.path.getsize(tar_path))],
                    "skipped": [True],
                }
            )
        import io

        with tarfile.open(tar_path, "w", format=tarfile.USTAR_FORMAT) as tf:
            for iid, payload, fmt, c in zip(
                g["image_id"].tolist(), g["bytes"].tolist(), g["fmt"].tolist(), caps
            ):
                tf.addfile(_tar_info(f"{iid}.{fmt}", len(payload)), io.BytesIO(payload))
                tf.addfile(_tar_info(f"{iid}.txt", len(c)), io.BytesIO(c))
        with open(done_path, "w") as f:
            f.write("ok\n")  # commit marker (written last)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_samples": [len(g)],
                "img_bytes": [img_bytes],
                "cap_bytes": [cap_bytes],
                "tar_bytes": [int(os.path.getsize(tar_path))],
                "skipped": [False],
            }
        )

    return rows.groupby("shard").map_groups(write_one, batch_format="pandas")


def read_tar_shards(out_dir: str):
    """Loader side of ``write_tar_shards``: one task per shard archive,
    re-pairing each sample's payload + caption members into rows of
    (image_id, bytes, caption, shard). Shard list is shard-count-bounded
    on the driver; archive bytes are read inside the tasks."""
    import glob
    import os
    import re

    import ray

    tars = sorted(glob.glob(os.path.join(out_dir, "shard-*.tar")))
    shards = [int(re.search(r"shard-(\d+)", os.path.basename(p)).group(1)) for p in tars]
    t = pa.table(
        {
            "shard": pa.array(shards, pa.int64()),
            "tar_path": pa.array(tars, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(max(1, len(tars)))

    def load(b: pa.Table) -> pa.Table:
        import tarfile

        ids, payloads, caps, shs = [], [], [], []
        for shard, tp in zip(b.column("shard").to_pylist(), b.column("tar_path").to_pylist()):
            samples: dict[str, dict] = {}
            with tarfile.open(tp, "r") as tf:
                for m in tf:
                    stem, ext = m.name.rsplit(".", 1)
                    d = samples.setdefault(stem, {})
                    data = tf.extractfile(m).read()
                    if ext == "txt":
                        d["caption"] = data.decode()
                    else:
                        d["bytes"] = data
            for stem in sorted(samples):
                ids.append(stem)
                payloads.append(samples[stem]["bytes"])
                caps.append(samples[stem]["caption"])
                shs.append(shard)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(payloads, pa.binary()),
                "caption": pa.array(caps, pa.string()),
                "shard": pa.array(shs, pa.int64()),
            }
        )

    return ds.map_batches(load, batch_format="pyarrow", batch_size=1)


def bucketed_shard_manifest(images_ds, cap: int = SHARD_CAP_BYTES, range_width: int = 64):
    """Aspect-BUCKETED WebDataset export plan — the diffusion-training
    layout where every shard holds ONE crop geometry: images join their
    nearest-log-ratio ladder bucket, then each bucket is packed into
    cap-byte shards by the same two-level byte prefix scan as
    shard_manifest (shard ids are per-bucket).

    ONE totals pass + ONE packing pass regardless of ladder size (the
    keyed two-level scan, textops.pack_by_budget_keyed): per-(bucket,
    range) offsets are broadcast from the driver and payload bytes never
    ride the scan; no bucket ever funnels into one task.

    Output: (image_id, bucket, nbytes, shard) — shard numbering local to
    its bucket, matching the per-geometry shard directories a loader
    expects."""
    import numpy as np

    from .textops import pack_by_budget_keyed

    def slim(b: pa.Table) -> pa.Table:
        ids = b.column("image_id")
        w = b.column("w").to_numpy(zero_copy_only=False).astype(np.float64)
        h = b.column("h").to_numpy(zero_copy_only=False).astype(np.float64)
        num = pc.utf8_slice_codeunits(ids, 4, 14).cast(pa.int64())
        return pa.table(
            {
                "image_id": ids,
                "bucket": pa.array(_bucket_labels(w, h), pa.string()),
                "nbytes": pc.binary_length(b.column("bytes")).cast(pa.int64()),
                "rng": pc.divide(num, range_width),
            }
        )

    s = images_ds.map_batches(slim, batch_format="pyarrow").materialize()
    packed = pack_by_budget_keyed(s, "nbytes", cap, ["image_id"], key="bucket")
    parts = [x for x in packed.iter_batches(batch_format="pyarrow") if x.num_rows]
    if not parts:
        return pa.table(
            {
                "image_id": pa.array([], pa.string()),
                "bucket": pa.array([], pa.string()),
                "nbytes": pa.array([], pa.int64()),
                "shard": pa.array([], pa.int64()),
            }
        )
    t = pa.concat_tables(parts)
    return pa.table(
        {
            "image_id": t.column("image_id"),
            "bucket": t.column("bucket"),
            "nbytes": t.column("nbytes").cast(pa.int64()),
            "shard": t.column("bin").cast(pa.int64()),
        }
    )


def caption_selfrank(images_ds, n_queries: int = 8):
    """Cross-modal retrieval self-eval: for the first ``n_queries``
    image_ids, score EVERY image by distinct-token overlap between its
    caption and the query caption (pure integers), and report the rank
    the query's own image lands at (ties → lexically smaller image_id
    wins).  The caption-side analog of text→image retrieval recall —
    rank 1 everywhere means captions identify their images uniquely;
    higher self-ranks expose duplicate or near-template captions.

    Scale shape: query token sets broadcast (n_queries-sized); ONE
    streaming pass over the corpus accumulates per-query
    better-than-self counts as integer partials (rank = 1 + Σ betters);
    nothing corpus-sized lands anywhere.  Queries with an empty token
    set are skipped (mirrors the oracle's domain)."""
    import pandas as pd

    import ray

    from .index_sink import tokenize

    slim = images_ds.map_batches(
        lambda b: b.select(["image_id", "caption"]), batch_format="pyarrow"
    )

    def bottomk(b: pa.Table) -> pa.Table:
        ids = b.column("image_id").to_pandas().to_numpy()
        sel = np.argsort(ids, kind="stable")[:n_queries]
        return b.take(pa.array(np.sort(sel)))

    cands = [
        b
        for b in slim.map_batches(bottomk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if b.num_rows
    ]
    qdf = pa.concat_tables(cands).to_pandas().sort_values("image_id").head(n_queries)

    queries = []
    for qid, cap in zip(qdf["image_id"], qdf["caption"]):
        flat, _, keep = tokenize(pa.array([cap or ""], pa.string()))
        toks = set(flat.filter(keep).to_pylist())
        if toks:  # empty-caption queries fall outside the oracle's domain
            queries.append((str(qid), toks, len(toks)))
    q_ref = ray.put(queries)

    def betters(b: pa.Table) -> pa.Table:
        qs = ray.get(q_ref)
        flat, lens, keep = tokenize(b.column("caption"))
        rows = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        km = keep.to_numpy(zero_copy_only=False)
        toks = flat.filter(keep).to_pandas().to_numpy()
        pairs = pd.DataFrame({"r": rows[km], "t": toks}).drop_duplicates()
        ids = b.column("image_id").to_pandas().to_numpy()
        counts = np.zeros(len(qs), np.int64)
        for qi, (qid, qset, ss) in enumerate(qs):
            m = pairs["t"].isin(qset).to_numpy()
            sc = np.bincount(pairs["r"].to_numpy()[m], minlength=b.num_rows)
            beat = (sc > ss) | ((sc == ss) & (ids < qid))
            counts[qi] = int(beat.sum())
        return pa.table(
            {"qi": pa.array(np.arange(len(qs), dtype=np.int64)), "n_better": pa.array(counts)}
        )

    agg = (
        slim.map_batches(betters, batch_format="pyarrow")
        .groupby("qi")
        .sum("n_better")
        .to_pandas()
    )
    total = dict(zip(agg["qi"], agg["sum(n_better)"])) if len(agg) else {}
    return pa.table(
        {
            "image_id": pa.array([q[0] for q in queries], pa.string()),
            "self_overlap": pa.array([q[2] for q in queries], pa.int64()),
            "self_rank": pa.array(
                [1 + int(total.get(qi, 0)) for qi in range(len(queries))], pa.int64()
            ),
        }
    )


def caption_size_rankcorr(spool_dir: str):
    """Integer-exact Spearman rank correlation between caption length
    (tokens) and payload size (bytes) over the image corpus — the
    dataset-health probe for 'do richer captions come with richer
    images?' (a strong negative value flags thumbnail farms with
    boilerplate alt-text).  Reported as (n, sum_d2, rho_plus1_micro)
    where rho+1 = (2·D − 6·Σd²)/D with D = n(n²−1) — all integer
    (bigint) arithmetic, so DuckDB replays it exactly; the ±1 shift
    keeps the quotient nonnegative (trunc ≡ floor on both sides).

    Ranks are deterministic ROW_NUMBER twins ordered by (value, id),
    computed with the two-level distributed rank (value-bucketed grouped
    counts → driver exclusive cumsum over the bucket table → per-bucket
    in-group rank) — no global sort; d² partials fold per block."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    import ray

    from ..stages.joins import join as _join

    ds = ray.data.read_parquet(spool_dir, columns=["image_id", "bytes", "caption"])

    def feats(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": b.column("image_id"),
                "tk": pc.count_substring_regex(
                    pc.fill_null(b.column("caption"), ""), r"\S+"
                ).cast(pa.int64()),
                "nb": pc.binary_length(b.column("bytes")).cast(pa.int64()),
            }
        )

    f = ds.map_batches(feats, batch_format="pyarrow").materialize()

    def ranked(val_col: str, width: int, out: str):
        def slim(b: pa.Table) -> pa.Table:
            v = b.column(val_col)
            return pa.table(
                {
                    "image_id": b.column("image_id"),
                    "v": v,
                    "bucket": pc.divide(v, width),
                }
            )

        s = f.map_batches(slim, batch_format="pyarrow").materialize()
        counts = s.groupby("bucket").count().to_pandas().sort_values("bucket")
        offs = dict(
            zip(
                counts["bucket"].astype(int),
                np.concatenate([[0], counts["count()"].cumsum().to_numpy()[:-1]]),
            )
        )

        def rank(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["v", "image_id"]).reset_index(drop=True)
            base = int(offs[int(g["bucket"].iloc[0])])
            return pd.DataFrame(
                {
                    "image_id": g["image_id"],
                    out: base + 1 + np.arange(len(g), dtype=np.int64),
                }
            )

        return s.groupby("bucket").map_groups(rank, batch_format="pandas")

    ra = ranked("tk", 1, "ra")
    rb = ranked("nb", 1024, "rb")

    def norm(colname):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "image_id": b.column("image_id").cast(pa.string()),
                    colname: b.column(colname).cast(pa.int64()),
                }
            )

        return fn

    j = _join(
        ra.map_batches(norm("ra"), batch_format="pyarrow"),
        rb.map_batches(norm("rb"), batch_format="pyarrow"),
        on="image_id",
        how="inner",
    )

    def partial(b: pa.Table) -> pa.Table:
        d = (
            b.column("ra").to_numpy(zero_copy_only=False)
            - b.column("rb").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "n_p": pa.array([len(d)], pa.int64()),
                "s2_p": pa.array([int((d * d).sum())], pa.int64()),
            }
        )

    n = s2 = 0
    for b in j.map_batches(partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        n += int(pc.sum(b.column("n_p")).as_py() or 0)
        s2 += int(pc.sum(b.column("s2_p")).as_py() or 0)
    D = n * (n * n - 1)
    rho1 = (2 * D - 6 * s2) * 1_000_000 // D if D else 1_000_000
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "sum_d2": pa.array([s2], pa.int64()),
            "rho_plus1_micro": pa.array([rho1], pa.int64()),
        }
    )


def images_release(spool_dir: str):
    """The composed image RELEASE chain, certified end-to-end: metadata
    quality gate (min side 48, aspect ≤ 2.5 in integer cross-multiplied
    form, caption ≥ 3 tokens — the clean_image_corpus metadata prefix) →
    exact pixel dedup (keep-min image_id per phash) → salted-md5
    train/val split (md5(image_id) % 10 < 8) → per-(split, fmt) release
    datacard (images, payload bytes, caption tokens).

    Shuffles: one phash-keyed grouped min + one keeper semi-join through
    the size-aware front door + one (split, fmt)-keyed grouped sum; the
    md5 split twin makes every stage DuckDB-replayable."""
    import numpy as np
    import pyarrow.compute as pc

    import ray

    from ..functions.sketches import md5_u64_batch
    from ..stages.joins import join as _join
    from .analytics import grouped_sum

    ds = ray.data.read_parquet(
        spool_dir, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    )

    def gate(b: pa.Table) -> pa.Table:
        w = b.column("w").cast(pa.int64())
        h = b.column("h").cast(pa.int64())
        tk = pc.count_substring_regex(pc.fill_null(b.column("caption"), ""), r"\S+")
        keep = pc.and_(
            pc.and_(
                pc.and_(pc.greater_equal(w, 48), pc.greater_equal(h, 48)),
                pc.less_equal(
                    pc.multiply(pa.scalar(2, pa.int64()), pc.max_element_wise(w, h)),
                    pc.multiply(pa.scalar(5, pa.int64()), pc.min_element_wise(w, h)),
                ),
            ),
            pc.greater_equal(tk, 3),
        )
        return b.filter(keep)

    g = ds.map_batches(gate, batch_format="pyarrow").materialize()

    keepers = g.groupby("phash").min("image_id")

    def kslim(b: pa.Table) -> pa.Table:
        return pa.table({"image_id": b.column("min(image_id)").cast(pa.string())})

    r = _join(
        g,
        keepers.map_batches(kslim, batch_format="pyarrow"),
        on="image_id",
        how="inner",
    )

    def card(b: pa.Table) -> pa.Table:
        ids = b.column("image_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        tenth = md5_u64_batch(ids) % np.uint64(10)
        split = np.where(tenth < 8, "train", "val")
        return pa.table(
            {
                "split": pa.array(split.tolist(), pa.string()),
                "fmt": b.column("fmt"),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
                "nb": pc.binary_length(b.column("bytes")).cast(pa.int64()),
                "tk": pc.count_substring_regex(
                    pc.fill_null(b.column("caption"), ""), r"\S+"
                ).cast(pa.int64()),
            }
        )

    return grouped_sum(
        r.map_batches(card, batch_format="pyarrow"),
        ["split", "fmt"],
        {"one": "n_images", "nb": "payload_bytes", "tk": "caption_tokens"},
    )
