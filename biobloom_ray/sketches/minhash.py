"""MinHash signatures + banded LSH keys — near-duplicate detection.

Graft addition (training-data pipeline dedup).  A document's signature is
``num_perm`` minima of independently remixed shingle hashes (Broder 1997);
E[fraction of equal components] = Jaccard similarity of the shingle sets.
LSH banding (Leskovec/Rajaraman/Ullman, *Mining of Massive Datasets*
ch. 3): signatures split into b bands of r rows; documents sharing any
band key become candidate pairs, so P[candidate] = 1 - (1 - s^r)^b.

Vectorized per batch: one ``np.minimum.reduceat`` per permutation over
the row-segmented shingle-hash array.
"""

from __future__ import annotations

import numpy as np

from biobloom_ray.hashing import U64, splitmix64

_EMPTY_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def minhash_signatures(
    shingle_hashes: np.ndarray,
    n_per_row: np.ndarray,
    num_perm: int = 128,
    seed: int = 0x31337,
    perm: str = "mulshift",
) -> np.ndarray:
    """(n_rows, num_perm) uint64 signature matrix.

    ``shingle_hashes``: concatenated per-row 64-bit shingle hashes;
    ``n_per_row``: shingles per row (rows with 0 shingles get the max
    sentinel in every component).

    ``perm`` selects the permutation family (round-3 change):
    "mulshift" (default) uses the standard multiply-add universal family
    ``a_p·h + b_p mod 2^64`` with odd ``a_p`` — 2 vector ops per
    permutation vs splitmix64's ~8, measured 8× faster on the signature
    stage, with estimate error still inside the 1/√num_perm band (the
    input hashes are already splitmix-finalized, so the composition is
    well mixed).  "splitmix" keeps the round-2 full-remix family.
    """
    n_per_row = np.asarray(n_per_row, dtype=np.int64)
    n_rows = len(n_per_row)
    sig = np.full((n_rows, num_perm), _EMPTY_SENTINEL, dtype=U64)
    if len(shingle_hashes) == 0 or n_rows == 0:
        return sig
    nonempty = n_per_row > 0
    seg_starts = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(n_per_row[:-1], out=seg_starts[1:])
    starts_ne = seg_starts[nonempty]
    perm_seeds = splitmix64(np.arange(num_perm, dtype=U64) + U64(seed))
    with np.errstate(over="ignore"):
        if perm == "mulshift":
            a = perm_seeds | U64(1)
            b = splitmix64(perm_seeds)
            for p in range(num_perm):
                remixed = a[p] * shingle_hashes + b[p]
                sig[nonempty, p] = np.minimum.reduceat(remixed, starts_ne)
        elif perm == "splitmix":
            for p in range(num_perm):
                remixed = splitmix64(shingle_hashes ^ perm_seeds[p])
                sig[nonempty, p] = np.minimum.reduceat(remixed, starts_ne)
        else:
            raise ValueError(f"unknown perm family {perm!r}")
    return sig


def lsh_band_keys(signatures: np.ndarray, num_bands: int,
                  seed: int = 0xBA4D) -> np.ndarray:
    """(n_rows, num_bands) uint64 band keys: hash of each band's rows.

    Rows sharing key in any band are near-dup candidates.
    """
    n_rows, num_perm = signatures.shape
    if num_perm % num_bands != 0:
        raise ValueError("num_perm must be divisible by num_bands")
    r = num_perm // num_bands
    keys = np.empty((n_rows, num_bands), dtype=U64)
    band_seeds = splitmix64(np.arange(num_bands, dtype=U64) + U64(seed))
    with np.errstate(over="ignore"):
        for b in range(num_bands):
            acc = np.full(n_rows, band_seeds[b], dtype=U64)
            for j in range(r):
                acc = splitmix64(acc ^ signatures[:, b * r + j])
            keys[:, b] = acc
    return keys


def signature_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard from two (n, num_perm) signature blocks."""
    return (sig_a == sig_b).mean(axis=-1)


def exact_jaccard_from_hashes(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two shingle-hash sets (verification step)."""
    sa, sb = np.unique(a), np.unique(b)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / (len(sa) + len(sb) - inter)
