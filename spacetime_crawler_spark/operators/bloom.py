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

Sidecar lifecycle (round 2 design): the sidecar is a per-round STATE TABLE
(P rows of (part_id, nbits, nhashes, n_items, bits)) committed atomically
with frontier/seen — resume reads it back in O(P) instead of rebuilding
from the full seen set.  Maintenance is distributed (union previous rows
with the round's delta bitmaps, OR per part_id in a grouped-map task); the
driver never has to hold the bitmaps.  Membership testing is size-gated:
small sidecars ride one broadcast (destroyed after the round); past
`bloom_broadcast_max_bytes` the candidates COGROUP with the sidecar rows on
part_id, so each task receives only the bitmaps of its own buckets — the
shard-routing design SURVEY §4.3 calls for at the 10^10 tier.
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


def delta_bitmaps_df(
    delta: DataFrame, n_parts: int, nbits: int, k: int
) -> DataFrame:
    """Per-partition bitmaps of ONE round's newly-seen keys at fixed
    geometry, as a DataFrame (≤P small rows) — NOT collected.  Incremental
    bloom maintenance: OR these into the running sidecar table instead of
    rebuilding from the full seen set — per-round bloom cost becomes O(new),
    not O(total), which is what survives a 10^10-URL seen set."""

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
    return keyed.groupBy("part_id").applyInPandas(build, schema=BLOOM_SCHEMA)


def merge_bitmaps_df(rows: DataFrame) -> DataFrame:
    """OR together all bitmap rows sharing a part_id (same geometry) —
    distributed sidecar maintenance: union(previous sidecar, delta bitmaps)
    → one merged row per partition bucket.  Shuffles only ≤2P small rows."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        nbits = int(pdf["nbits"].iloc[0])
        k = int(pdf["nhashes"].iloc[0])
        assert (pdf["nbits"] == nbits).all() and (pdf["nhashes"] == k).all(), (
            "bloom geometry mismatch"
        )
        acc = np.zeros(nbits // 8, dtype=np.uint8)
        for b in pdf["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({
            "part_id": [int(pdf["part_id"].iloc[0])],
            "nbits": [nbits],
            "nhashes": [k],
            "n_items": [int(pdf["n_items"].sum())],
            "bits": [acc.tobytes()],
        })

    return rows.groupBy("part_id").applyInPandas(merge, schema=BLOOM_SCHEMA)


def flag_maybe_seen_cogrouped(
    candidates: DataFrame, bloom_df: DataFrame, n_parts: int
) -> DataFrame:
    """Membership test WITHOUT broadcasting the sidecar: candidates cogroup
    with the sidecar rows on part_id = pmod(url_hash, P), so each task holds
    only its own buckets' bitmaps — executor memory stays O(sidecar/P) no
    matter how large the seen set grows.  Multiple bitmap rows per bucket
    (e.g. sidecar ∪ fresh deltas) are OR'd on the fly.  Returns candidates
    + maybe_seen, exactly like the broadcast-UDF path."""
    import pyspark.sql.types as _T

    cand_cols = [f.name for f in candidates.schema.fields]
    out_schema = _T.StructType(
        list(candidates.schema.fields) + [_T.StructField("maybe_seen", _T.BooleanType())]
    )
    keyed = candidates.withColumn(
        "part_id", F.pmod("url_hash", F.lit(n_parts)).cast("int")
    )
    bloomed = bloom_df.select("part_id", "nbits", "nhashes", "bits")

    def flag(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cand_pdf):
            return pd.DataFrame(columns=cand_cols + ["maybe_seen"])
        if not len(bloom_pdf):
            maybe = np.zeros(len(cand_pdf), dtype=bool)
        else:
            nbits = int(bloom_pdf["nbits"].iloc[0])
            k = int(bloom_pdf["nhashes"].iloc[0])
            # uniform-geometry guard (same contract as merge_bitmaps_df):
            # OR-ing bitmaps built under different nbits/nhashes would
            # compute bit positions against the wrong modulus — a silent
            # bloom FALSE NEGATIVE that re-admits seen URLs.  A mixed
            # sidecar is a caller bug; fail loudly — ValueError, not
            # assert, so the check survives `python -O`.
            if not (
                (bloom_pdf["nbits"] == nbits).all()
                and (bloom_pdf["nhashes"] == k).all()
            ):
                raise ValueError(
                    "mixed bloom geometry within one part_id group"
                )
            bits = np.zeros(nbits // 8, dtype=np.uint8)
            for b in bloom_pdf["bits"]:
                bits |= np.frombuffer(b, dtype=np.uint8)
            pos = _positions(
                cand_pdf["url_hash"].to_numpy(), cand_pdf["h2"].to_numpy(), k, nbits
            )
            maybe = ((bits[pos >> 3] >> (pos & 7)) & 1).all(axis=1)
        return cand_pdf[cand_cols].assign(maybe_seen=maybe)

    return (
        keyed.groupBy("part_id")
        .cogroup(bloomed.groupBy("part_id"))
        .applyInPandas(flag, schema=out_schema)
    )


def collect_sidecar(bloom_df: DataFrame) -> dict[int, tuple[int, int, bytes]]:
    """≤P small rows to the driver (the ONE permitted collect — SURVEY §4)."""
    return {
        r.part_id: (r.nbits, r.nhashes, bytes(r.bits))
        for r in bloom_df.collect()
    }


def make_maybe_seen_udf(spark, sidecar: dict[int, tuple[int, int, bytes]], n_parts: int):
    """Vectorized membership test: (url_hash, h2) → maybe_seen boolean.
    The sidecar rides a Spark broadcast; numpy does the bit tests per Arrow
    batch.  Returns (udf, broadcast) — the CALLER must destroy() the
    broadcast once the round's filtering is materialized, otherwise each
    round leaks a full sidecar copy on the driver and every executor."""
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

    return maybe_seen, bcast
