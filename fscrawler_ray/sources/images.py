"""Distributed deterministic generator of the input table.

Builds the authoritative input shape from BASELINE.json ``input_hint``:
``(image_id: string, bytes: binary, w: int32, h: int32, fmt: string,
caption: string, phash: int64)`` as a ``ray.data.Dataset`` — generation is
itself a ``map_batches`` over ``ray.data.range`` so it scales with the
cluster instead of running on the driver. Deterministic per (seed, index):
same table at any parallelism.

Plays the role of the reference's crawl corpus; used by the flagship
pipeline, bench, and tests. ~5% duplicate payloads and caption naming
conventions ('- ', '[..]', '+++') are injected per FIXTURES.md.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.codecs import encode, synth_image
from ..functions.phash import phash_batch, to_gray32

SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

_FMTS = np.array(["png", "jpeg", "webp"])
_FMT_W = np.array([0.3, 0.5, 0.2])
_WORDS = np.array(
    (
        "sunset beach mountain river city night forest bridge cloud star "
        "garden ocean desert island valley harbor temple market castle tower"
    ).split()
)


def synth_images_batch(indices: np.ndarray, seed: int = 42, dup_rate: float = 0.05) -> pa.Table:
    """Generate rows for a batch of global indices (deterministic)."""
    n = len(indices)
    rows_bytes: list[bytes] = []
    ws = np.empty(n, dtype=np.int32)
    hs = np.empty(n, dtype=np.int32)
    fmts: list[str] = []
    caps: list[str] = []
    ids: list[str] = []
    grays = np.empty((n, 32, 32), dtype=np.float32)
    for k, i in enumerate(indices):
        i = int(i)
        rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + i))
        is_dup = rng.random() < dup_rate
        payload = (seed * 7 + (i % 16)) if is_dup else (seed * 1_000_003 + i)
        prng = np.random.Generator(np.random.PCG64(payload))
        w = int(prng.integers(32, 160))
        h = int(prng.integers(32, 160))
        fmt = str(prng.choice(_FMTS, p=_FMT_W))  # skewed 30/50/20 per FIXTURES.md
        img = synth_image(payload & 0xFFFFFFFF, w, h)
        buf = encode(img, fmt)
        words = [str(x) for x in prng.choice(_WORDS, size=5)]
        style = payload % 10
        cap = " ".join(words)
        if style == 0:
            cap = f"{words[0]} - {'_'.join(words[1:3])}, {words[3]}"
        elif style == 1:
            cap = f"{cap} [{words[0]}, {words[1]}]"
        elif style == 2:
            cap = cap + " " + "+" * (1 + payload % 7)
        rows_bytes.append(buf)
        ws[k], hs[k] = w, h
        fmts.append(fmt)
        caps.append(cap)
        ids.append(f"img_{i:010d}")
        # phash of the *decoded* pixels (post-lossy), as a verifier would see
        from ..functions.codecs import decode

        grays[k] = to_gray32(decode(buf)[0])
    ph = phash_batch(grays)
    return pa.table(
        {
            "image_id": pa.array(ids),
            "bytes": pa.array(rows_bytes, type=pa.binary()),
            "w": pa.array(ws),
            "h": pa.array(hs),
            "fmt": pa.array(fmts),
            "caption": pa.array(caps),
            "phash": pa.array(ph),
        },
        schema=SCHEMA,
    )


def images_dataset(n: int, seed: int = 42, parallelism: int = -1):
    """Distributed Dataset of n synthetic input rows (input_hint schema)."""
    import ray.data

    ds = ray.data.range(n, override_num_blocks=parallelism if parallelism > 0 else None)

    def gen(batch: pa.Table) -> pa.Table:
        return synth_images_batch(batch.column("id").to_numpy(), seed=seed)

    return ds.map_batches(gen, batch_format="pyarrow")


def rows_for_sf(sf_dir: str, per_sf: int = 20000) -> int:
    """Scale the synthetic image table with the driver's sf directory."""
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    return max(64, int(per_sf * sf))
