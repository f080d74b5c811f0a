"""SimHash fingerprints — near-duplicate detection by Hamming distance.

Graft addition (training-data pipeline dedup).  Charikar (2002): each
feature hash votes ±1 on each of 64 bit positions; the fingerprint is
the sign vector.  Similar documents (high cosine over feature space)
get fingerprints with small Hamming distance.

Vectorized per batch: bit-unpack the feature hashes to a ±1 matrix and
segment-sum per document with ``np.add.reduceat``.
"""

from __future__ import annotations

import numpy as np

from biobloom_ray.hashing import U64

_ONE = U64(1)


def simhash_fingerprints(feature_hashes: np.ndarray,
                         n_per_row: np.ndarray) -> np.ndarray:
    """uint64 fingerprint per row from concatenated per-row feature hashes."""
    n_per_row = np.asarray(n_per_row, dtype=np.int64)
    n_rows = len(n_per_row)
    out = np.zeros(n_rows, dtype=U64)
    if len(feature_hashes) == 0 or n_rows == 0:
        return out
    nonempty = n_per_row > 0
    seg_starts = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(n_per_row[:-1], out=seg_starts[1:])
    starts_ne = seg_starts[nonempty]
    # bits → int8 matrix (n_hashes, 64); memory 64 B per feature hash, so
    # process in slabs to stay cache/heap friendly
    shifts = np.arange(64, dtype=U64)
    fp_ne = np.zeros(int(nonempty.sum()), dtype=U64)
    with np.errstate(over="ignore"):
        votes = np.zeros((len(starts_ne), 64), dtype=np.int64)
        for c in range(0, 64, 16):
            cols = shifts[c:c + 16]
            bits = ((feature_hashes[:, None] >> cols[None, :]) & _ONE)
            part = np.add.reduceat(bits.astype(np.int64), starts_ne, axis=0)
            votes[:, c:c + 16] = part
        counts = n_per_row[nonempty][:, None]
        # vote for bit = (#ones > #zeros) ⇔ 2*ones > count
        bitmat = (2 * votes > counts).astype(U64)
        fp_ne = (bitmat << shifts[None, :]).sum(axis=1, dtype=U64)
    out[nonempty] = fp_ne
    return out


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between uint64 fingerprints."""
    v = a ^ b
    with np.errstate(over="ignore"):
        v = v - ((v >> _ONE) & U64(0x5555555555555555))
        v = (v & U64(0x3333333333333333)) + ((v >> U64(2)) & U64(0x3333333333333333))
        v = (v + (v >> U64(4))) & U64(0x0F0F0F0F0F0F0F0F)
        return ((v * U64(0x0101010101010101)) >> U64(56)).astype(np.int64)


def simhash_band_keys(fingerprints: np.ndarray, num_bands: int = 4) -> np.ndarray:
    """(n, num_bands) band keys: documents within Hamming distance
    < num_bands share at least one identical band (pigeonhole) — the
    standard SimHash blocking scheme for candidate generation."""
    width = 64 // num_bands
    mask = (_ONE << U64(width)) - _ONE if width < 64 else U64(0xFFFFFFFFFFFFFFFF)
    out = np.empty((len(fingerprints), num_bands), dtype=U64)
    with np.errstate(over="ignore"):
        for b in range(num_bands):
            # tag with the band index so keys from different bands never collide
            out[:, b] = ((fingerprints >> U64(b * width)) & mask) | (U64(b) << U64(60))
    return out
