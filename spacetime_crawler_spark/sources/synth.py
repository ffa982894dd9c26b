"""Deterministic synthetic `pages` world (FIXTURES.md §A) — the closed link
graph the crawl engine and the single-node oracle both run over.

Everything about page i is derived from md5(seed, i) — no RNG state — so the
same world can be materialized EITHER distributed (mapInPandas over
spark.range, the bench path) OR on the driver (the oracle path), byte-
identically.  `pages.text` is produced by the SAME pinned extract_text the
engine's F9 UDF wraps, closing the byte-identity invariant
(BASELINE.json input_hint).

Schema (authoritative shape, BASELINE.json input_hint):
  pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from spacetime_crawler_spark.functions.textextract import extract_text
from spacetime_crawler_spark.functions.urlnorm import canonicalize_url

SEED = 42
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

_VOCAB = (
    "crawl frontier spark shuffle partition politeness robot scheduler queue "
    "bloom filter hash murmur seed host depth priority fetch parse extract "
    "link page text token word index graph node edge batch round quota delay "
    "commit resume lineage metric skew salt broadcast join scan column row"
).split()

_LANGS = ("en", "es", "de", "zh")


def _h(*parts: object) -> int:
    """Deterministic 64-bit hash of (SEED, *parts) — the world's only RNG."""
    key = (str(SEED) + ":" + ":".join(str(p) for p in parts)).encode()
    return struct.unpack("<Q", hashlib.md5(key).digest()[:8])[0]


@dataclass(frozen=True)
class WorldParams:
    scale: str
    n_pages: int
    n_hosts: int
    # paragraph-length multiplier: bench pages carry realistic-weight text so
    # the measured work is parse/extract, not just scheduling (tiny/small
    # stay at 1 — the differential-oracle fixtures are unaffected)
    text_scale: int = 1


SCALES = {
    "tiny": WorldParams("tiny", 2_000, 20),
    "small": WorldParams("small", 50_000, 200),
    "bench": WorldParams("bench", 1_000_000, 2_000, text_scale=64),
}


def world(scale: str | WorldParams, n_pages: int | None = None) -> WorldParams:
    if isinstance(scale, WorldParams):
        return scale
    p = SCALES[scale]
    if n_pages is not None:
        return WorldParams(p.scale, n_pages, p.n_hosts, p.text_scale)
    return p


# --- host model (Zipf skew fixture) -------------------------------------------

def _zipf_cdf(n_hosts: int) -> list[float]:
    weights = [1.0 / (j + 1) ** 1.2 for j in range(n_hosts)]
    total = sum(weights)
    acc, cdf = 0.0, []
    for w in weights:
        acc += w / total
        cdf.append(acc)
    return cdf


_CDF_CACHE: dict[int, list[float]] = {}


def host_of_page(i: int, p: WorldParams) -> str:
    cdf = _CDF_CACHE.get(p.n_hosts)
    if cdf is None:
        cdf = _CDF_CACHE[p.n_hosts] = _zipf_cdf(p.n_hosts)
    u = _h("host", i) / 2**64
    lo, hi = 0, p.n_hosts - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if cdf[mid] < u:
            lo = mid + 1
        else:
            hi = mid
    return f"host{lo:04d}.example.com"


def scheme_of_host(host: str) -> str:
    return "https" if _h("scheme", host) % 2 else "http"


# --- robots model (FIXTURES §A2) ------------------------------------------------

def robots_body_of_host(host: str) -> bytes | None:
    """70%: disallow /private + crawl-delay ∈ {0.5,1,2}; 20%: no robots row;
    10%: disallow-all (scheduler-starvation fixture)."""
    r = _h("robots", host) % 10
    if r < 7:
        delay = (0.5, 1.0, 2.0)[_h("delay", host) % 3]
        return (
            f"User-agent: *\nDisallow: /private\nCrawl-delay: {delay}\n".encode()
        )
    if r < 9:
        return None
    return b"User-agent: *\nDisallow: /\n"


def robots_url_of_host(host: str) -> str:
    return f"{scheme_of_host(host)}://{host}/robots.txt"


# --- page model --------------------------------------------------------------------

def canonical_url_of_page(i: int, p: WorldParams) -> str:
    host = host_of_page(i, p)
    private = "/private" if _h("priv", i) % 8 == 0 else ""
    return f"{scheme_of_host(host)}://{host}{private}/p/{i:06d}"


def noisy_url_of_page(i: int, p: WorldParams, variant: int) -> str:
    """A noise form that canonicalizes back to canonical_url_of_page(i)."""
    url = canonical_url_of_page(i, p)
    v = variant % 4
    if v == 0:
        return url + "/"
    if v == 1:
        return url + "#frag"
    if v == 2:
        scheme, rest = url.split("://", 1)
        host, _, path = rest.partition("/")
        port = "443" if scheme == "https" else "80"
        return f"{scheme}://{host}:{port}/{path}"
    scheme, rest = url.split("://", 1)
    host, _, path = rest.partition("/")
    return f"{scheme}://{host.upper()}/{path}"


def lang_of_page(i: int) -> str:
    return _LANGS[i % 4]


def _words(i: int, salt: str, n: int) -> str:
    return " ".join(
        _VOCAB[_h("w", i, salt, k) % len(_VOCAB)] for k in range(n)
    )


def link_targets(i: int, p: WorldParams) -> list[str]:
    """hrefs embedded in page i, deterministic, out-degree 3–12.  Mix of:
    canonical/noise forms of other pages, a dead URL (404 fixture), and a
    blacklisted-extension file (F1 fixture)."""
    degree = 3 + _h("deg", i) % 10
    hrefs: list[str] = []
    for k in range(degree):
        r = _h("kind", i, k) % 20
        if r < 14:
            j = _h("tgt", i, k) % p.n_pages
            hrefs.append(canonical_url_of_page(j, p))
        elif r < 17:
            j = _h("tgt", i, k) % p.n_pages
            hrefs.append(noisy_url_of_page(j, p, _h("var", i, k)))
        elif r < 18:
            host = host_of_page(i, p)
            hrefs.append(f"{scheme_of_host(host)}://{host}/dead/{_h('dead', i, k) % 10**6:06d}")
        else:
            hrefs.append(f"x{_h('bl', i, k) % 100}.pdf")
    return hrefs


def html_of_page(i: int, p: WorldParams, capture: int = 0) -> bytes:
    anchors = "\n".join(
        f'<a href="{href}">l{k}</a>' for k, href in enumerate(link_targets(i, p))
    )
    extra = f"<p>updated capture {_words(i, 'upd', 6)}</p>" if capture else ""
    ts = p.text_scale
    html = (
        f"<html><head><title>Page {i:06d} {_words(i, 't', 3)}</title>"
        f"<script>var p={i};</script><style>p {{margin: 0}}</style></head>"
        f"<body><p>{_words(i, 'p1', (12 + _h('len1', i) % 30) * ts)}</p>"
        f"<p>{_words(i, 'p2', (8 + _h('len2', i) % 20) * ts)}</p>{extra}\n{anchors}\n"
        f"</body></html>"
    )
    return html.encode("utf-8")


def has_second_capture(i: int) -> bool:
    return _h("cap2", i) % 50 == 0  # ~2%


def warc_ts_of(i: int, capture: int = 0) -> datetime:
    return _EPOCH + timedelta(seconds=17 * i + capture * 3600)


def page_rows(i: int, p: WorldParams) -> list[dict]:
    """All `pages` rows for page index i (1 or 2 captures; ~10% of first
    captures are stored under a noise-variant url form — FIXTURES §A1)."""
    stored_url = (
        noisy_url_of_page(i, p, _h("stored", i))
        if _h("noisy_store", i) % 10 == 0
        else canonical_url_of_page(i, p)
    )
    rows = []
    html0 = html_of_page(i, p, 0)
    rows.append({
        "url": stored_url,
        "warc_ts": warc_ts_of(i, 0),
        "html": html0,
        "text": extract_text(html0),
        "lang": lang_of_page(i),
    })
    if has_second_capture(i):
        html1 = html_of_page(i, p, 1)
        rows.append({
            "url": canonical_url_of_page(i, p),
            "warc_ts": warc_ts_of(i, 1),
            "html": html1,
            "text": extract_text(html1),
            "lang": lang_of_page(i),
        })
    return rows


def robots_rows(p: WorldParams) -> list[dict]:
    rows = []
    hosts = {host_of_page(i, p) for i in range(p.n_pages)}
    for host in sorted(hosts):
        body = robots_body_of_host(host)
        if body is None:
            continue
        rows.append({
            "url": robots_url_of_host(host),
            "warc_ts": _EPOCH,
            "html": body,
            "text": extract_text(body),
            "lang": "en",
        })
    return rows


def seed_urls(p: WorldParams, n_seeds: int = 5) -> list[str]:
    """Seeds on distinct hosts: page 0 (largest-Zipf-mass host is most likely
    host of many pages), then the first page found on each subsequent distinct
    host, skipping /private paths so seeds are always fetchable."""
    seeds: list[str] = []
    seen_hosts: set[str] = set()
    i = 0
    while len(seeds) < n_seeds and i < p.n_pages:
        host = host_of_page(i, p)
        url = canonical_url_of_page(i, p)
        if host not in seen_hosts and "/private" not in url:
            seeds.append(url)
            seen_hosts.add(host)
        i += 1
    return seeds


def spread_seed_urls(p: WorldParams, n_seeds: int) -> list[str]:
    """A large seed list spread uniformly over the page index space (the
    bench fixture: the metric is sustained fetch+dedup throughput, so the
    frontier must be saturated from round 1, not grown from 5 seeds).
    Includes /private and disallow-all-host pages — the robots gate dropping
    them is part of the measured pipeline."""
    step = max(p.n_pages // n_seeds, 1)
    return [canonical_url_of_page(i, p) for i in range(0, p.n_pages, step)][:n_seeds]


# --- Spark materialization ------------------------------------------------------

PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def generate_pages_df(spark, scale: str | WorldParams, n_pages: int | None = None):
    """Distributed generation: mapInPandas over spark.range — each partition
    renders its page-index slice independently (no shuffle, scales linearly
    with cores; the bench world generates in parallel)."""
    import pandas as pd

    p = world(scale, n_pages)

    def gen(batches):
        for pdf in batches:
            rows: list[dict] = []
            for i in pdf["id"]:
                rows.extend(page_rows(int(i), p))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    pages = (
        spark.range(0, p.n_pages, 1, max(spark.sparkContext.defaultParallelism, 4))
        .mapInPandas(gen, schema=PAGES_SCHEMA_DDL)
    )
    robots = spark.createDataFrame(
        [
            (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
            for r in robots_rows(p)
        ],
        schema=PAGES_SCHEMA_DDL,
    )
    return pages.unionByName(robots)


def driver_side_pages(p: WorldParams) -> list[dict]:
    """Oracle-path materialization (tiny/small scales only)."""
    rows: list[dict] = []
    for i in range(p.n_pages):
        rows.extend(page_rows(i, p))
    rows.extend(robots_rows(p))
    return rows


def write_pages_parquet(spark, scale: str | WorldParams, out_dir: str,
                        n_pages: int | None = None) -> str:
    """Materialize once for bench runs (generation excluded from timings —
    BASELINE.md protocol).  Partitioned by (is_robots, pmod(xxhash64(url),
    32)).

    is_robots (1 iff the url path is /robots.txt) exists so that
    build_robots_rules — which needs html ONLY for the ~#hosts robots
    captures — is a partition-pruned read of the robots directories
    instead of a full-corpus scan: parquet cannot skip the html column
    for filtered-out rows (the vectorized reader materializes every
    projected column of a surviving row group, and url min/max stats
    never exclude interleaved robots urls), so without the partition
    split the crawl paid one full ~O(world) html decompress just to
    extract robots rules (measured ≈30 s at 4 cores / ≈110 s at 1 core
    on the 2M-page bench world — guide §6 'partitioning on write
    determines how well readers can skip data').  Readers that want the
    whole corpus (the per-round fetch scan) read all partitions exactly
    as before; the column is derived, so world CONTENT is unchanged.
    Worlds cached under the previous layout stay readable —
    build_robots_rules falls back to the unpruned filter when the column
    is absent."""
    from pyspark.sql import functions as F

    df = generate_pages_df(spark, scale, n_pages)
    (
        df.withColumn(
            "is_robots",
            (F.parse_url("url", F.lit("PATH")) == "/robots.txt").cast("int"),
        )
        .withColumn("url_bucket", F.pmod(F.xxhash64("url"), F.lit(32)))
        .write.mode("overwrite")
        .partitionBy("is_robots", "url_bucket")
        .parquet(out_dir)
    )
    return out_dir


def sanity_check_world(p: WorldParams, sample: int = 200) -> None:
    """Closed-world invariants (used by tests): every canonical link target
    is a generated page url; text matches extract_text(html) byte-for-byte."""
    for i in range(0, p.n_pages, max(p.n_pages // sample, 1)):
        for row in page_rows(i, p):
            assert row["text"] == extract_text(row["html"])
        for href in link_targets(i, p):
            c = canonicalize_url(href)
            tail = c.rsplit("/p/", 1)[-1]
            if "/p/" in c and "/dead/" not in c and tail[:6].isdigit():
                j = int(tail[:6])
                assert canonicalize_url(canonical_url_of_page(j, p)) == c, (href, c)
