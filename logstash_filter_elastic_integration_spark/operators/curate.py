"""Training-data curation utilities: deterministic sampling and mixture
control (brief: operations a large-scale training-data pipeline needs).

Both are pure Column-expression filters — no shuffle, no RNG state:
web-scale pipelines sample by HASH, not random(), so reruns, resumed
jobs, and different partitionings all select the identical row set
(the same reproducibility property the dedup family relies on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# md5-derived bucket in [0, 10000): portable across engines (same trick
# as queries._md5_long) and stable across Spark versions, unlike
# xxhash64 whose seed is an implementation detail.
_BUCKETS = 10_000


def _hash_bucket(key) -> "F.Column":
    from ..queries import _md5_long
    return _md5_long(key.cast("string")) % _BUCKETS


def sample_keep(key, rate: float, salt: str = "") -> "F.Column":
    """Boolean keep-decision of :func:`stable_sample` as a pure Column
    (exposed so pipelines can mark instead of filter; driver-gated via
    the doc_quality query)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    k = F.concat(key.cast("string"), F.lit(salt))
    return _hash_bucket(k) < int(rate * _BUCKETS)


def stable_sample(df: DataFrame, key: str, rate: float,
                  salt: str = "") -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by hashing ``key``:
    the kept set is a pure function of (key, salt) — identical on rerun,
    resume, and at any parallelism.  ``salt`` decorrelates independent
    samples drawn from the same corpus."""
    keep = sample_keep(F.col(key), rate, salt)   # validates rate first
    return df.filter(keep)


def stratified_mix(df: DataFrame, stratum_col: str,
                   target_rates: dict[str, float],
                   key: str, salt: str = "") -> DataFrame:
    """Domain/source reweighting by subsampling: keep each stratum at its
    configured rate (strata absent from ``target_rates`` keep rate 1.0).
    The per-stratum decision reuses the stable hash, so mixtures compose
    deterministically with dedup and sharding.  This is the 'data mixing'
    step of a pretraining pipeline expressed as one shuffle-free
    filter."""
    keep = mix_keep(F.col(stratum_col), target_rates, F.col(key), salt)
    return df.filter(keep)


def mix_keep(stratum, target_rates: dict[str, float], key,
             salt: str = "") -> "F.Column":
    """Boolean keep-decision of :func:`stratified_mix` as a pure Column."""
    for s, r in target_rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0, 1], got {r}")
    k = F.concat(key.cast("string"), F.lit(salt))
    bucket = _hash_bucket(k)
    thresh = F.lit(_BUCKETS)
    for s, r in target_rates.items():
        thresh = F.when(stratum == s,
                        F.lit(int(r * _BUCKETS))).otherwise(thresh)
    return bucket < thresh
