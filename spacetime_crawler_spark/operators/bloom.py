"""Partitioned bloom URL-seen pre-filter (SURVEY.md §2 F3 / §4.3).

P independent bloom bitmaps, one per pmod(url_hash, P) bucket, each sized
for its own key count at the target FPR.  Hashing is Kirsch–Mitzenmacher
double hashing g_i = h1 + i·h2 over two JVM-computed hashes
(h1 = xxhash64(url_norm), h2 = hash(url_norm) — Spark's murmur3_x86_32 per
BASELINE.json north_star "canonicalized murmur3 URL hashes"), so the Python
side does only vectorized numpy bit ops on Arrow batches.

Correctness NEVER depends on the bloom (SURVEY §4.3): a negative is
definitely-new and may skip the exact anti-join; a positive falls through to
the exact check.  Choice of bloom over cuckoo: the URL-seen set is
insert-only — cuckoo's deletions buy nothing (SURVEY §4.3).

At the 10^10 tier: P scales up and each task needs only the shards its
url_hash bucket range maps to; in this sandbox the whole sidecar is one
small broadcast dict.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_SCHEMA = T.StructType([
    T.StructField("part_id", T.IntegerType()),
    T.StructField("nbits", T.LongType()),
    T.StructField("nhashes", T.IntegerType()),
    T.StructField("n_items", T.LongType()),
    T.StructField("bits", T.BinaryType()),
])

DEFAULT_FPR = 0.01
MIN_BITS = 1 << 10


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, nbits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing, in uint64 wraparound space."""
    u1 = h1.astype(np.int64).view(np.uint64)
    u2 = h2.astype(np.int64).astype(np.uint64)  # 32-bit murmur sign-extended
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((u1[:, None] + i * u2[:, None]) % np.uint64(nbits)).astype(np.int64)


def _build_bitmap(h1: np.ndarray, h2: np.ndarray, fpr: float) -> tuple[int, int, bytes]:
    n = max(len(h1), 1)
    nbits = max(MIN_BITS, int(-n * math.log(fpr) / (math.log(2) ** 2)))
    nbits = (nbits + 63) // 64 * 64
    k = max(1, round(nbits / n * math.log(2)))
    bits = np.zeros(nbits // 8, dtype=np.uint8)
    if len(h1):
        pos = _positions(h1, h2, k, nbits)
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return nbits, k, bits.tobytes()


def _build_bitmap_fixed(
    h1: np.ndarray, h2: np.ndarray, nbits: int, k: int
) -> bytes:
    """Bitmap with CALLER-fixed geometry — the incremental-maintenance path:
    per-round delta bitmaps share (nbits, k) so they OR together."""
    bits = np.zeros(nbits // 8, dtype=np.uint8)
    if len(h1):
        pos = _positions(h1, h2, k, nbits)
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits.tobytes()


def build_delta_sidecar(
    delta: DataFrame, n_parts: int, nbits: int, k: int
) -> dict[int, tuple[int, int, bytes]]:
    """Per-partition bitmaps of ONE round's newly-seen keys at fixed
    geometry, collected to the driver (≤P small rows).  Incremental bloom
    maintenance: OR these into the running sidecar instead of rebuilding
    from the full seen set — per-round bloom cost becomes O(new), not
    O(total), which is what survives a 10^10-URL seen set."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["part_id"].iloc[0])
        bits = _build_bitmap_fixed(
            pdf["url_hash"].to_numpy(), pdf["h2"].to_numpy(), nbits, k
        )
        return pd.DataFrame({
            "part_id": [part], "nbits": [nbits], "nhashes": [k],
            "n_items": [len(pdf)], "bits": [bits],
        })

    keyed = delta.select(
        F.pmod("url_hash", F.lit(n_parts)).cast("int").alias("part_id"),
        "url_hash",
        "h2",
    )
    built = keyed.groupBy("part_id").applyInPandas(build, schema=BLOOM_SCHEMA)
    return {
        r.part_id: (r.nbits, r.nhashes, bytes(r.bits)) for r in built.collect()
    }


def merge_sidecars(
    acc: dict[int, tuple[int, int, bytes]],
    delta: dict[int, tuple[int, int, bytes]],
) -> dict[int, tuple[int, int, bytes]]:
    """OR per-partition bitmaps (same geometry) into the accumulator."""
    out = dict(acc)
    for part, (nbits, k, bits) in delta.items():
        if part in out:
            nb0, k0, b0 = out[part]
            assert (nb0, k0) == (nbits, k), "bloom geometry mismatch"
            merged = np.bitwise_or(
                np.frombuffer(b0, dtype=np.uint8),
                np.frombuffer(bits, dtype=np.uint8),
            ).tobytes()
            out[part] = (nbits, k, merged)
        else:
            out[part] = (nbits, k, bits)
    return out


def build_bloom_sidecar(seen: DataFrame, n_parts: int, fpr: float = DEFAULT_FPR) -> DataFrame:
    """seen(url_hash, h2, …) → bloom_state(part_id, nbits, nhashes, n_items,
    bits): one grouped-map task per partition bucket, each building its own
    bitmap (the applyInPandas-as-UDAF pattern — SURVEY §2 group G)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["part_id"].iloc[0])
        nbits, k, bits = _build_bitmap(
            pdf["url_hash"].to_numpy(), pdf["h2"].to_numpy(), fpr
        )
        return pd.DataFrame({
            "part_id": [part],
            "nbits": [nbits],
            "nhashes": [k],
            "n_items": [len(pdf)],
            "bits": [bits],
        })

    keyed = seen.select(
        F.pmod("url_hash", F.lit(n_parts)).cast("int").alias("part_id"),
        "url_hash",
        "h2",
    )
    return keyed.groupBy("part_id").applyInPandas(build, schema=BLOOM_SCHEMA)


def collect_sidecar(bloom_df: DataFrame) -> dict[int, tuple[int, int, bytes]]:
    """≤P small rows to the driver (the ONE permitted collect — SURVEY §4)."""
    return {
        r.part_id: (r.nbits, r.nhashes, bytes(r.bits))
        for r in bloom_df.collect()
    }


def make_maybe_seen_udf(spark, sidecar: dict[int, tuple[int, int, bytes]], n_parts: int):
    """Vectorized membership test: (url_hash, h2) → maybe_seen boolean.
    The sidecar rides a Spark broadcast; numpy does the bit tests per Arrow
    batch."""
    bcast = spark.sparkContext.broadcast(
        {p: (nb, k, np.frombuffer(b, dtype=np.uint8)) for p, (nb, k, b) in sidecar.items()}
    )

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(url_hash: pd.Series, h2: pd.Series) -> pd.Series:
        shards = bcast.value
        h1a = url_hash.to_numpy()
        h2a = h2.to_numpy()
        parts = (
            h1a.astype(np.int64) % np.int64(n_parts) + n_parts
        ) % np.int64(n_parts)
        out = np.zeros(len(h1a), dtype=bool)
        for part in np.unique(parts):
            shard = shards.get(int(part))
            if shard is None:
                continue  # no bitmap for this bucket → nothing seen there
            nbits, k, bits = shard
            mask = parts == part
            pos = _positions(h1a[mask], h2a[mask], k, nbits)
            hit = (bits[pos >> 3] >> (pos & 7)) & 1
            out[mask] = hit.all(axis=1)
        return pd.Series(out)

    return maybe_seen
