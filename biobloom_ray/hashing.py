"""Vectorized ntHash-style rolling multi-hash over character k-shingles.

The reference (bcgsc/biobloom) hashes DNA k-mers with ntHash — a rolling
hash producing ``h`` 64-bit values per k-mer, where the extra hash values
are derived from one base hash (see call sites at
``BioBloomMaker/BloomFilterGenerator.h:170`` and the canonicality tests in
``Tests/ntHashTests.cpp:25-40``).  For web text we hash character
k-shingles of the extracted/normalized text instead.  This module gives
the same shape of API — one 64-bit base hash per shingle, computed in
O(1) per slide, plus a second independent value so downstream consumers
can derive ``h_i = h1 + i * h2`` (Kirsch–Mitzenmacher double hashing, the
same trick ntHash uses to multi-hash).

Everything is vectorized numpy over the raw UTF-8 buffer of a
``pyarrow`` string column — zero copies of the text itself.  The rolling
polynomial hash over a window of k bytes is computed with a prefix-sum
trick: with an odd multiplier ``A`` (invertible mod 2**64),

    P[i]   = sum_{j<i} b[j] * A^{-j}            (mod 2**64)
    raw(i) = (P[i+k] - P[i]) * A^{i+k-1}        (mod 2**64)
           = sum_{j=0..k-1} b[i+j] * A^{k-1-j}  (the classic poly hash)

so the whole buffer is hashed with three cumulative passes.  Raw
polynomial hashes have weakly mixed low bits, so each raw value is
finalized with a splitmix64-style avalanche mixer (public-domain
algorithm by Sebastiano Vigna) before use.

All seeds are fixed constants by default → deterministic under Ray task
retries (BASELINE requirement "deterministic hash seeds").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

U64 = np.uint64
_MASK64 = (1 << 64) - 1

#: odd multiplier for the rolling polynomial hash (2**64 / golden ratio, forced odd)
BASE_A = 0x9E3779B97F4A7C15 | 1
#: default global seed; mixed into every hash
DEFAULT_SEED = 0x5EED1DEA5EED1DEA

# splitmix64 constants
_SM_GAMMA = U64(0x9E3779B97F4A7C15)
_SM_M1 = U64(0xBF58476D1CE4E5B9)
_SM_M2 = U64(0x94D049BB133111EB)
_H2_TWEAK = U64(0xC2B2AE3D27D4EB4F)  # xxhash64 prime_2; decorrelates h2 from h1


def _mod_inverse_u64(a: int) -> int:
    """Modular inverse of odd ``a`` mod 2**64 (Newton–Hensel lifting)."""
    assert a & 1, "multiplier must be odd to be invertible mod 2**64"
    x = a
    for _ in range(6):  # 5 iterations suffice for 64 bits; one spare
        x = (x * (2 - a * x)) & _MASK64
    assert (a * x) & _MASK64 == 1
    return x


BASE_A_INV = _mod_inverse_u64(BASE_A)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 in → uint64 out)."""
    z = (x + _SM_GAMMA).astype(U64, copy=False)
    z = (z ^ (z >> U64(30))) * _SM_M1
    z = (z ^ (z >> U64(27))) * _SM_M2
    return z ^ (z >> U64(31))


def _powers(base: int, n: int) -> np.ndarray:
    """[base^0, base^1, ..., base^(n-1)] mod 2**64 as uint64."""
    out = np.empty(n, dtype=U64)
    if n == 0:
        return out
    out[0] = 1
    if n > 1:
        out[1:] = U64(base & _MASK64)
        np.multiply.accumulate(out, out=out)
    return out


def string_column_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-copy view of a pyarrow string column's UTF-8 bytes.

    Returns ``(data, starts, ends)`` where ``data`` is the raw byte buffer
    (uint8) and ``starts[i]:ends[i]`` is row i's span inside it.  Nulls
    become empty spans.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    elif pa.types.is_string(arr.type):
        off_dtype = np.int32
    else:  # dictionary / other: fall back through cast
        arr = arr.cast(pa.large_string())
        off_dtype = np.int64
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype)
    # account for array slicing offset
    o = arr.offset
    starts = offsets[o : o + len(arr)].astype(np.int64, copy=False)
    ends = offsets[o + 1 : o + 1 + len(arr)].astype(np.int64, copy=False)
    if buffers[2] is None:
        data = np.empty(0, dtype=np.uint8)
    else:
        data = np.frombuffer(buffers[2], dtype=np.uint8)
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
        starts = np.where(valid, starts, 0)
        ends = np.where(valid, ends, 0)
    return data, starts, ends


#: rows are hashed in chunks of at most this many text bytes so the
#: kernel's temporaries stay cache-resident — the polynomial hash is
#: translation-invariant, so per-chunk local prefix sums give identical
#: results while cutting DRAM traffic several-fold (the 32-way-concurrency
#: bottleneck on a shared-memory node is bandwidth, not FLOPs)
_CHUNK_CHARS = 1 << 16


def shingle_hashes_from_bytes(
    data: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    k: int,
    seed: int = DEFAULT_SEED,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hash every k-byte shingle of every row.

    Parameters: raw byte buffer + per-row [start, end) spans (as from
    :func:`string_column_bytes`), shingle length ``k`` in bytes.

    Returns ``(h1, h2, n_frames)``:

    - ``h1``, ``h2``: uint64 arrays, one pair per shingle, rows
      concatenated in order (row i contributes ``n_frames[i]`` entries);
    - ``n_frames``: int64 per-row frame counts ``max(len - k + 1, 0)``
      (``BloomFilterGenerator.h:132``: a record of length L yields
      L-k+1 frames, 0 when L < k).

    The caller can recover a per-shingle row index with
    ``np.repeat(np.arange(n), n_frames)``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    lens = ends - starts
    n_frames = np.maximum(lens - k + 1, 0)
    total = int(n_frames.sum())
    if total == 0:
        z = np.empty(0, dtype=U64)
        return z, z.copy(), n_frames

    h1 = np.empty(total, dtype=U64)
    h2 = np.empty(total, dtype=U64)
    frame_off = np.zeros(len(starts) + 1, dtype=np.int64)
    np.cumsum(n_frames, out=frame_off[1:])

    # group rows into chunks of <= _CHUNK_CHARS text bytes (a row longer
    # than the chunk size becomes its own chunk)
    r0 = 0
    n_rows = len(starts)
    while r0 < n_rows:
        r1 = r0
        span = 0
        while r1 < n_rows and (r1 == r0 or span + lens[r1] <= _CHUNK_CHARS):
            span += int(lens[r1])
            r1 += 1
        _hash_row_range(data, starts, ends, n_frames, frame_off,
                        r0, r1, k, seed, h1, h2)
        r0 = r1
    return h1, h2, n_frames


def _hash_row_range(data, starts, ends, n_frames, frame_off, r0, r1, k, seed,
                    out_h1, out_h2) -> None:
    """Hash rows [r0, r1) with chunk-local prefix sums into the output
    slices frame_off[r0]:frame_off[r1]."""
    sub_starts = starts[r0:r1]
    sub_ends = ends[r0:r1]
    sub_frames = n_frames[r0:r1]
    total = int(frame_off[r1] - frame_off[r0])
    if total == 0:
        return
    lo = int(sub_starts.min())
    hi = int(sub_ends.max())
    region = data[lo:hi]
    n = hi - lo

    with np.errstate(over="ignore"):
        # prefix sums P[i] = sum_{j<i} b[j] * A^{-j}  (mod 2**64)
        ainv_pow = _powers(BASE_A_INV, n)
        terms = region.astype(U64)
        terms *= ainv_pow
        P = np.empty(n + 1, dtype=U64)
        P[0] = 0
        np.cumsum(terms, out=P[1:])

        a_pow = _powers(BASE_A, n + 1)

        # window start positions, relative to `region`
        first = np.repeat(sub_starts - lo, sub_frames)
        cum = np.zeros(len(sub_starts), dtype=np.int64)
        np.cumsum(sub_frames[:-1], out=cum[1:])
        pos = np.arange(total, dtype=np.int64)
        pos -= np.repeat(cum, sub_frames)
        pos += first

        raw = P[pos + k]
        raw -= P[pos]
        raw *= a_pow[pos + k - 1]
        s = U64(seed & _MASK64)
        o0, o1 = int(frame_off[r0]), int(frame_off[r1])
        out_h1[o0:o1] = splitmix64(raw + s)
        raw ^= _H2_TWEAK
        raw += s
        out_h2[o0:o1] = splitmix64(raw) | U64(1)  # odd → full-period stride


def shingle_hashes(
    texts: "pa.Array | pa.ChunkedArray | list[str] | np.ndarray",
    k: int,
    seed: int = DEFAULT_SEED,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hash character k-shingles of a string column.

    Accepts a pyarrow (large_)string array (zero-copy fast path) or any
    sequence of Python strings.  Shingles are k *bytes* of the UTF-8
    encoding; for ASCII text this equals k characters.  Returns
    ``(h1, h2, n_frames)`` — see :func:`shingle_hashes_from_bytes`.
    """
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), type=pa.large_string())
    data, starts, ends = string_column_bytes(texts)
    return shingle_hashes_from_bytes(data, starts, ends, k, seed)


def hash_strings(values, seed: int = DEFAULT_SEED) -> np.ndarray:
    """One 64-bit hash per whole string (for tokens / keys).

    Equivalent to the k-shingle hash with k = len(value) — i.e. the full
    polynomial hash of each string, finalized with splitmix64.
    """
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(list(values), type=pa.large_string())
    data, starts, ends = string_column_bytes(values)
    lens = ends - starts
    n_rows = len(starts)
    if n_rows == 0:
        return np.empty(0, dtype=U64)
    lo = int(starts.min()) if n_rows else 0
    hi = int(ends.max()) if n_rows else 0
    region = data[lo:hi]
    n = hi - lo
    with np.errstate(over="ignore"):
        ainv_pow = _powers(BASE_A_INV, n)
        terms = region.astype(U64) * ainv_pow if n else np.empty(0, U64)
        P = np.empty(n + 1, dtype=U64)
        P[0] = 0
        if n:
            np.cumsum(terms, out=P[1:])
        a_pow = _powers(BASE_A, n + 1)
        s0 = starts - lo
        e0 = ends - lo
        raw = (P[e0] - P[s0]) * a_pow[np.maximum(e0 - 1, 0)]
        # fold in the length so "" and prefix-collisions differ
        raw = raw ^ lens.astype(U64)
        s = U64(seed & _MASK64)
        return splitmix64(raw + s)


def parse_seed_string(seed: str) -> np.ndarray:
    """Spaced-seed pattern → int positions of the care ('1') slots —
    ``MIBloomFilter::parseSeedString`` analogue (``MIBFGen.hpp:140``,
    design tool ``util/designSS.py``)."""
    if not seed or any(c not in "01" for c in seed):
        raise ValueError("seed must be a non-empty string of 0s and 1s")
    return np.flatnonzero(np.frombuffer(seed.encode(), np.uint8) == ord("1"))


def spaced_seed_hashes(
    texts: "pa.Array | pa.ChunkedArray | list[str]",
    seeds: list[str],
    global_seed: int = DEFAULT_SEED,
) -> tuple[np.ndarray, np.ndarray]:
    """One 64-bit hash per (frame, spaced seed), hashing ONLY the '1'
    positions of each seed (``stHashIterator`` analogue, used at
    ``MIBFGen.hpp:418-422`` / ``MIBFClassifier.hpp:788-790``).

    Returns ``(hashes, n_frames)`` with ``hashes`` shaped
    ``(total_frames, len(seeds))``; frames are windows of
    ``len(seeds[0])`` bytes (all seeds must share one length, as in the
    reference).  Two windows whose care positions agree hash equally no
    matter what the don't-care positions contain.

    O(|care positions| · n) vectorized adds — no rolling trick exists
    for non-contiguous windows, but the care set is small by design.
    """
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), type=pa.large_string())
    k = len(seeds[0])
    if any(len(s) != k for s in seeds):
        raise ValueError("all spaced seeds must have the same length")
    data, starts, ends = string_column_bytes(texts)
    lens = ends - starts
    n_frames = np.maximum(lens - k + 1, 0)
    total = int(n_frames.sum())
    out = np.empty((total, len(seeds)), dtype=U64)
    if total == 0:
        return out, n_frames
    lo = int(starts.min())
    region = data[lo:int(ends.max())]
    first = np.repeat(starts - lo, n_frames)
    cum = np.zeros(len(starts), dtype=np.int64)
    np.cumsum(n_frames[:-1], out=cum[1:])
    pos = np.arange(total, dtype=np.int64) - np.repeat(cum, n_frames) + first
    s = U64(global_seed & _MASK64)
    with np.errstate(over="ignore"):
        for si, seed in enumerate(seeds):
            care = parse_seed_string(seed)
            acc = np.full(total, s + U64(si), dtype=U64)
            for j in care:
                acc *= U64(BASE_A)
                acc += region[pos + int(j)]
            out[:, si] = splitmix64(acc)
    return out, n_frames


def derive_hashes(h1: np.ndarray, h2: np.ndarray, i: int) -> np.ndarray:
    """i-th derived hash ``h1 + i*h2`` (mod 2**64) — ntHash-style multi-hash."""
    with np.errstate(over="ignore"):
        return h1 + U64(i) * h2
