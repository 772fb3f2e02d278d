"""Pinned pipeline configuration.

The reference drives its cascade from a flat ``opts`` hashref with
defaults + CLI overlay (/root/reference/lib/App/dupfind/App.pm:106-155);
unknown weed-pass names die at plan time
(/root/reference/lib/App/dupfind/Guts.pm:62-63).  The graft's analog is
a frozen dataclass validated eagerly: the MinHash/LSH/SimHash parameters
are part of the *identity* of a run (the recall metric is only defined
"at the same shingle/signature config"), so they are hashable and are
embedded in every checkpoint manifest.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

# Mersenne prime 2^31-1: MinHash permutation modulus.  Chosen so that
# a*h+b stays < 2^62 in int64 (no 128-bit math needed in numpy).
MINHASH_PRIME = (1 << 31) - 1

# Weed-pass names mirror the reference's wpass plugin map
# (/root/reference/lib/App/dupfind/Guts.pm:43-53).
WEED_PASS_NAMES = (
    "first",
    "last",
    "middle",
    "middle_last",
    "first_middle_last",
    "almost_middle",
)


@dataclass(frozen=True)
class DedupConfig:
    """All knobs for the dedup cascade, pinned and hashable."""

    # --- exact cascade (reference parity) ---
    # probe width in chars; reference --wpsize default 32
    # (/root/reference/lib/App/dupfind/App.pm:128)
    probe_width: int = 32
    # ordered weed passes; reference default [first_middle_last]
    # (/root/reference/lib/App/dupfind/App.pm:94-95)
    weed_passes: tuple[str, ...] = ("first_middle_last",)
    # skip weeding entirely (reference --weedout no, App.pm:233)
    weed_enabled: bool = True
    # max text length considered (reference read_limit 1 GiB, Guts.pm:36)
    max_chars: int = 1 << 30

    # --- shingling / MinHash ---
    shingle_k: int = 5          # word k-grams
    num_perm: int = 128         # MinHash permutations
    seed: int = 42

    # --- LSH banding: num_perm = bands * rows_per_band ---
    lsh_bands: int = 32
    lsh_rows: int = 4
    # buckets larger than this are truncated (boilerplate guard); every
    # truncation is logged — never silent.  At web scale a mega-bucket
    # is a stop-shingle artifact, not a dup cluster.
    lsh_bucket_cap: int = 2000
    # pair generation for under-cap buckets (minhash_lsh.candidate_pairs):
    # 'arrays'      — collect each capped bucket's sorted member array on
    #                 the sizing join's partitioning (no extra exchange)
    #                 and emit i<j pairs with a nested JVM explode; the
    #                 bucket cap bounds per-task quadratic work at
    #                 cap(cap-1)/2 emissions.  3 exchanges total.
    # 'salted_join' — adaptive triangle-block salted self-join (spreads
    #                 ONE bucket's pair enumeration over G(G+1)/2 tasks);
    #                 6 exchanges of the full bucket membership.  Keep
    #                 for caps large enough that cap^2/2 emissions in one
    #                 task would straggle (cap >~ 10^5).
    lsh_pair_strategy: str = "arrays"

    # --- verification ---
    simhash_bits: int = 64
    simhash_max_hamming: int = 3
    # primary near-dup gate on MinHash-estimated Jaccard (Broder-style
    # web dedup operating point, with margin below 0.8 to cover
    # estimator noise at num_perm=128)
    jaccard_threshold: float = 0.7

    # --- connected components ---
    cc_max_iterations: int = 50

    # --- suffix/long-span stage ---
    min_span_chars: int = 200
    # long-shingle candidate generation for the span stage: a shared
    # min_span_chars span guarantees shared span_shingle_words-grams
    span_shingle_words: int = 20
    # mod-sampling of span shingle hashes (1 = keep all; s>1 keeps
    # hash%s==0 — winnowing-style thinning).  Default 2: a
    # min_span_chars span covers >=21 windows, so the miss probability
    # is 2^-21 (~5e-7) while the span index — the pipeline's largest
    # shuffle — halves.
    span_sample_mod: int = 2
    span_enabled: bool = True
    # single text cap shared by the span index AND the LCS kernel —
    # both sides see the same prefix, so the stage is self-consistent
    # (spans past the cap are out of contract, documented in spans.py)
    span_max_chars: int = 20_000

    # --- near-dup verification mode ---
    # "exact":    gate LSH candidates on EXACT shingle-Jaccard >= tau
    #             (pair-targeted inverted-index count — cost linear in
    #             candidates).  Deterministic truth, no estimator noise.
    # "estimate": gate on MinHash-estimated Jaccard OR the SimHash
    #             Hamming gate (cheapest: no second touch of shingles).
    verify_mode: str = "exact"
    # exact mode's banding: pairs whose MinHash estimate clears the
    # threshold by this margin are accepted/rejected outright (~5 sigma
    # at num_perm=128 -> error odds ~3e-7/pair); only the borderline
    # band pays the pair-targeted exact-Jaccard recompute.
    est_clear_margin: float = 0.2

    # --- execution ---
    shuffle_partitions: int = 32
    salt_buckets: int = 16      # salting fan-out for skewed aggregations
    # intra-stage fan-out barrier strategy (plans/barriers.py):
    # 'local' (localCheckpoint — fastest, not executor-loss tolerant),
    # 'reliable' (checkpoint to sc checkpoint dir — cluster default),
    # 'persist' (DISK_ONLY_2 — middle ground, keeps lineage)
    barrier_strategy: str = "local"

    extra: dict = field(default_factory=dict, compare=False, hash=False)

    def __post_init__(self) -> None:
        if self.num_perm != self.lsh_bands * self.lsh_rows:
            raise ValueError(
                f"num_perm ({self.num_perm}) must equal lsh_bands*lsh_rows "
                f"({self.lsh_bands}*{self.lsh_rows})"
            )
        unknown = [p for p in self.weed_passes if p not in WEED_PASS_NAMES]
        if unknown:
            # plan-time validation, like the reference's death on unknown
            # pass names (Guts.pm:62-63)
            raise ValueError(
                f"unknown weed pass(es) {unknown}; valid: {WEED_PASS_NAMES}"
            )
        if self.shingle_k < 1 or self.probe_width < 1:
            raise ValueError("shingle_k and probe_width must be >= 1")
        if self.barrier_strategy not in ("local", "reliable", "persist"):
            raise ValueError(
                f"barrier_strategy must be 'local', 'reliable' or "
                f"'persist', got {self.barrier_strategy!r}"
            )
        if self.lsh_pair_strategy not in ("arrays", "salted_join"):
            raise ValueError(
                f"lsh_pair_strategy must be 'arrays' or 'salted_join', "
                f"got {self.lsh_pair_strategy!r}"
            )
        if self.verify_mode not in ("exact", "estimate"):
            raise ValueError(
                f"verify_mode must be 'exact' or 'estimate', got {self.verify_mode!r}"
            )

    def config_hash(self) -> str:
        """Stable hash of the config — stamped into checkpoint manifests
        so a resume never silently mixes configs."""
        d = asdict(self)
        d.pop("extra", None)
        blob = json.dumps(d, sort_keys=True, default=str).encode()
        return hashlib.sha256(blob).hexdigest()[:16]


DEFAULT_CONFIG = DedupConfig()
