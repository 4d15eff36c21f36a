"""Deterministic Common-Crawl-style page corpus generator (FIXTURES.md §1).

Pure function of ``(seed, n_pages)`` — per-page RNG is keyed by
``sha256(f"{seed}:{url}")`` so row content is independent of generation
order and partitioning. No wall clock, no external data.

This plays the role of the reference's "given code object" input
(/root/reference/src/ccm/xdis.py:167-188) made reproducible at scale: each
page is a self-describing unit whose expected extraction output (text,
ordered link list) is known in closed form.

Structural edge cases baked in (mirroring the reference's worked examples,
/root/reference README.rst:255-321), for any n_pages >= 12:

- page 0: isolated page with a self-link  (≙ ccm's single-line ``identity``
  self-loop case: per-component score E−N+2 = 2)
- pages 1,2,3: disjoint 3-cycle cluster A (triangle; multi-component P>1)
- pages 4,5:   disjoint 2-cycle cluster B
- pages 6,7,8,9: 3-cycle + pendant (9 -> 6)
- page 10: dangling-only page (no out-links; PageRank dangling mass)
- pages with index % 1000 == 17: hub pages with out-degree n_pages//4
  (power-law skew path, BASELINE.json:6,14)

Random pages (index >= 10) never target pages 0..9, so the special
components stay disjoint. ~1% of link targets are dangling urls (linked but
no page row).
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass
from datetime import datetime, timedelta

EPOCH = datetime(2025, 1, 1, 0, 0, 0)
N_HOSTS = 7
DEFAULT_SEED = 42

# corpus sizes per FIXTURES.md
TINY = 40
SMALL = 200
MEDIUM = 20_000


def url_for(i: int) -> str:
    return f"https://site{i % N_HOSTS}.example/p{i}"


def _rng_for(seed: int, url: str) -> random.Random:
    key = hashlib.sha256(f"{seed}:{url}".encode()).digest()
    return random.Random(int.from_bytes(key[:8], "big"))


def _escape(s: str) -> str:
    """Minimal HTML escaping — the inverse of extract._unescape."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _host_of(url: str) -> str:
    return url.split("://", 1)[1].split("/", 1)[0]


def _href_variant(j: int, src_url: str, dst_url: str) -> str:
    """Render the j-th anchor's href in one of several equivalent spellings.

    All variants normalize back to exactly ``dst_url`` under the canonical
    extractor spec (uppercase scheme/host lowered, fragments stripped,
    root-relative resolved against the source page's host).
    """
    if j % 3 == 1 and _host_of(src_url) == _host_of(dst_url):
        # root-relative (same host only, so resolution lands on dst_url)
        return "/" + dst_url.split("://", 1)[1].split("/", 1)[1]
    if j % 3 == 2:
        return dst_url + f"#sec{j}"
    if j % 3 == 0 and j > 0:
        scheme, rest = dst_url.split("://", 1)
        host, path = rest.split("/", 1)
        return f"{scheme.upper()}://{host.upper()}/{path}"
    return dst_url


@dataclass(frozen=True)
class PageRow:
    url: str
    warc_ts: datetime
    html: bytes
    text: str
    lang: str


def _out_targets(rng: random.Random, i: int, n_pages: int) -> list[int]:
    """Deterministic out-link target indices for page i (i >= 10)."""
    if i == 10:
        return []  # dangling-only page
    n_dangling = max(1, n_pages // 100)
    pool_hi = n_pages + n_dangling  # indices >= n_pages are dangling urls
    if i % 1000 == 17:
        degree = max(2, n_pages // 4)  # hub
    else:
        # heavy-tailed out-degree: ccdf ~ 1/k (Zipf-ish), clipped to [0, 50]
        u = rng.random()
        degree = 0 if u < 0.05 else min(50, int(1.0 / max(u - 0.05, 1e-9)))
    degree = max(0, min(degree, pool_hi - 11))
    targets = rng.sample(range(10, pool_hi), degree)
    return [t for t in targets if t != i]


_SPECIAL_LINKS: dict[int, list[int]] = {
    0: [0],          # isolated self-loop
    1: [2], 2: [3], 3: [1],   # cluster A: 3-cycle
    4: [5], 5: [4],            # cluster B: 2-cycle
    6: [7], 7: [8], 8: [6], 9: [6],  # 3-cycle + pendant
}


def page_links(seed: int, i: int, n_pages: int) -> list[str]:
    """Ground-truth ordered normalized out-link urls for page i."""
    url = url_for(i)
    if i in _SPECIAL_LINKS and n_pages >= 12:
        idxs = _SPECIAL_LINKS[i]
    else:
        idxs = _out_targets(_rng_for(seed, url), i, n_pages)
    return [url_for(k) for k in idxs]


def gen_page(seed: int, i: int, n_pages: int) -> tuple[PageRow, list[str]]:
    url = url_for(i)
    rng = _rng_for(seed, url)
    links = page_links(seed, i, n_pages)

    paras = [
        f"café — δοκιμή {i}",
        f"Body of page {i} & more <data> here  ",
        f"trailing   whitespace {i}\t.",
    ]
    text = "\n".join(paras)

    anchors = "".join(
        f'<a href="{_href_variant(j, url, dst)}">L{j}</a>' for j, dst in enumerate(links)
    )
    html = (
        f"<html><head><title>T{i}</title></head><body>"
        + "".join(f"<p>{_escape(p)}</p>" for p in paras)
        + anchors
        + "</body></html>"
    ).encode("utf-8")

    r = rng.random()
    lang = "en" if r < 0.9 else ("de" if r < 0.95 else "xx")
    return PageRow(url, EPOCH + timedelta(seconds=i), html, text, lang), links


def gen_corpus(seed: int = DEFAULT_SEED, n_pages: int = SMALL):
    """Return (rows, links_by_url) — rows in index order, ground-truth links."""
    rows: list[PageRow] = []
    links_by_url: dict[str, list[str]] = {}
    for i in range(n_pages):
        row, links = gen_page(seed, i, n_pages)
        rows.append(row)
        links_by_url[row.url] = links
    return rows, links_by_url


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def corpus_df(spark, seed: int = DEFAULT_SEED, n_pages: int = SMALL, num_partitions: int | None = None):
    """Materialize the corpus as a pages DataFrame with the mandated schema
    (url, warc_ts, html, text, lang) — BASELINE.json input_hint."""
    rows, _ = gen_corpus(seed, n_pages)
    df = spark.createDataFrame(
        [(r.url, r.warc_ts, r.html, r.text, r.lang) for r in rows], PAGES_SCHEMA
    )
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def write_corpus_parquet(spark, path: str, seed: int = DEFAULT_SEED, n_pages: int = SMALL, num_partitions: int = 8) -> None:
    corpus_df(spark, seed, n_pages, num_partitions).write.mode("overwrite").parquet(path)
