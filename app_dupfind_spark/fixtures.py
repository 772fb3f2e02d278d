"""Deterministic synthetic `pages` corpus + ground-truth clusters.

Mirrors the reference's fixture design (/root/reference/t/data/: 42
files in several size strata, 5 exact-dup clusters of sizes [3,5,4,4,2],
weed-out decoys that share size/prefix/suffix but differ in the middle —
golden outputs t/solutions/004_scanfs.pl, 006_weed.pl, 007_digest.pl),
adapted to the graft's input shape (url, warc_ts, html, text, lang) and
extended with near-dup archetypes whose expected pairing is controlled.

Everything is seeded; NO randomness outside numpy.default_rng(seed).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

import numpy as np

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu ocean river mountain forest desert valley harbor island "
    "meadow canyon glacier prairie lagoon tundra savanna reef"
).split()

EXACT_CLUSTER_SIZES = (3, 5, 4, 4, 2)  # ref t/solutions/007_digest.pl
BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)


@dataclass
class FixtureCorpus:
    rows: list[dict] = field(default_factory=list)          # pages rows
    true_clusters: dict[str, str] = field(default_factory=dict)  # url -> cluster_id
    kinds: dict[str, str] = field(default_factory=dict)     # url -> archetype

    def pair_set(self, kinds: set[str] | None = None) -> set[tuple[str, str]]:
        """All unordered true dup pairs (a<b), optionally by kind."""
        groups: dict[str, list[str]] = {}
        for url, cid in self.true_clusters.items():
            if kinds is None or self.kinds[url] in kinds:
                groups.setdefault(cid, []).append(url)
        out = set()
        for members in groups.values():
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    out.add((ms[i], ms[j]))
        return out


def _sentence(rng: np.random.Generator, n_words: int) -> str:
    return " ".join(rng.choice(WORDS, size=n_words))


def _url(i: int) -> str:
    return f"https://site{i % 37:02d}.example/page-{i:06d}"


def build_corpus(seed: int = 42, scale: int = 1) -> FixtureCorpus:
    """`scale` multiplies the per-archetype counts (scale=1 ≈ 160 rows).

    Archetypes (FIXTURES.md):
      empty       3×scale     zero-size bypass, one exact cluster
      exact       5 clusters × [3,5,4,4,2], ×scale cluster copies
      decoy       10×scale    same length + same first/last 32 chars as a
                              base doc, different middle (must NOT pair)
      near        6×scale clusters, word-substituted copies (MUST pair)
      span        4×scale pairs sharing a ≥200-char verbatim span
      border      10×scale    ~30-50% Jaccard (must NOT pair)
      unique      30×scale    background
    """
    rng = np.random.default_rng(seed)
    c = FixtureCorpus()
    i = 0

    def add(text: str, kind: str, cluster: str | None) -> str:
        nonlocal i
        url = _url(i)
        c.rows.append(
            {
                "url": url,
                "warc_ts": BASE_TS + timedelta(seconds=i),
                "html": f"<html><body><p>{text}</p></body></html>".encode(),
                "text": text,
                "lang": ["en", "en", "en", "de", "fr"][i % 5],
            }
        )
        c.kinds[url] = kind
        if cluster is not None:
            c.true_clusters[url] = cluster
        i += 1
        return url

    # --- empty docs: one exact cluster of 3 (zero-size bypass path)
    for rep in range(scale):
        urls = [add("", "empty", f"empty-{rep}") for _ in range(3)]
        for u in urls:
            c.true_clusters[u] = min(urls)

    # --- exact clusters [3,5,4,4,2]
    for rep in range(scale):
        for ci, size in enumerate(EXACT_CLUSTER_SIZES):
            text = _sentence(rng, 60 + 13 * ci)
            urls = [add(text, "exact", None) for _ in range(size)]
            for u in urls:
                c.true_clusters[u] = min(urls)

    # --- same-length decoys: share first/last 32 chars + length with a
    # base, differ in the middle (exercises the weed/probe stage: same
    # size+prefix+suffix must still NOT cluster — the digest decides)
    for rep in range(scale):
        base = _sentence(rng, 40)
        add(base, "decoy_base", None)
        for _ in range(9):
            mid_start = 32
            mid_end = len(base) - 32
            mid = list(base[mid_start:mid_end])
            # deterministic scramble of the middle, same length
            perm = rng.permutation(len(mid))
            scrambled = "".join(mid[p] for p in perm)
            add(base[:mid_start] + scrambled + base[mid_end:], "decoy", None)

    # --- near-dup clusters: word substitutions at low rates
    for rep in range(scale):
        for ci in range(6):
            n_words = 120
            base_words = list(rng.choice(WORDS, size=n_words))
            size = 2 + ci % 4
            urls = [add(" ".join(base_words), "near", None)]
            for v in range(size - 1):
                w = list(base_words)
                n_sub = 1 + v  # 1..3 word substitutions => Jaccard ~0.85-0.97
                pos = rng.choice(n_words, size=n_sub, replace=False)
                for p in pos:
                    w[p] = str(rng.choice(WORDS))
                urls.append(add(" ".join(w), "near", None))
            for u in urls:
                c.true_clusters[u] = min(urls)

    # --- shared-long-span pairs: >=200-char verbatim span inside
    # otherwise different docs
    for rep in range(scale):
        for _ in range(4):
            span = _sentence(rng, 40)  # ~250 chars
            a = _sentence(rng, 50) + " " + span + " " + _sentence(rng, 30)
            b = _sentence(rng, 25) + " " + span + " " + _sentence(rng, 55)
            ua = add(a, "span", None)
            ub = add(b, "span", None)
            cid = min(ua, ub)
            c.true_clusters[ua] = cid
            c.true_clusters[ub] = cid

    # --- borderline non-dups: ~50% token overlap but INTERLEAVED (no
    # long shared run), must NOT pair — guards both the Jaccard gate
    # (0.5 < threshold) and the span stage (no verbatim span)
    for rep in range(scale):
        for _ in range(10):
            shared = list(rng.choice(WORDS, size=60))
            d1, d2 = [], []
            for w in shared:
                d1.extend([w, str(rng.choice(WORDS))])
                d2.extend([w, str(rng.choice(WORDS))])
            add(" ".join(d1), "border", None)
            add(" ".join(d2), "border", None)

    # --- uniques
    for rep in range(scale):
        for _ in range(30):
            add(_sentence(rng, int(rng.integers(20, 150))), "unique", None)

    return c


def pages_df(spark, corpus: FixtureCorpus):
    """Spark DataFrame with the pinned input schema (BASELINE.json
    input_hint)."""
    schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    return spark.createDataFrame(
        [
            (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
            for r in corpus.rows
        ],
        schema,
    )
