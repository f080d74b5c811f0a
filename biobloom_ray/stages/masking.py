"""Low-complexity / boilerplate masking — the webtext analogue of the
reference's SDUST masker (M5, ``Common/sdust.c``, ``Common/SDust.hpp``;
masked k-mers are treated as misses in every scorer, ``SeqEval.h:53``).

The DNA SDUST algorithm scores triplet repetitiveness in 64-base
windows.  For web text the equivalent nuisance is *in-document
repetition* (boilerplate, navigation strings, repeated separators), so
the masker here flags frames whose shingle hash occurs more than
``max_occurrences`` times within the same document — fully vectorized
via one lexsort over (row, hash).  The mask plugs into
``eval_batch(..., mask=...)`` exactly where SDUST plugs into the
reference scorers; the algorithmic divergence from sdust is documented
here (different definition of "low complexity", same plumbing and same
skip semantics).
"""

from __future__ import annotations

import numpy as np


def repetition_mask(h1: np.ndarray, n_frames: np.ndarray,
                    max_occurrences: int = 4) -> np.ndarray:
    """True for frames whose shingle repeats > max_occurrences within
    its row."""
    total = len(h1)
    mask = np.zeros(total, dtype=bool)
    if total == 0:
        return mask
    row_of = np.repeat(np.arange(len(n_frames), dtype=np.int64), n_frames)
    order = np.lexsort((h1, row_of))
    rh = row_of[order]
    hh = h1[order]
    new_group = np.empty(total, dtype=bool)
    new_group[0] = True
    new_group[1:] = (rh[1:] != rh[:-1]) | (hh[1:] != hh[:-1])
    gid = np.cumsum(new_group) - 1
    counts = np.bincount(gid)
    over = counts[gid] > max_occurrences
    mask[order] = over
    return mask


def entropy_mask(data: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                 k: int, min_distinct: int = 3) -> np.ndarray:
    """True for frames whose k-byte window has fewer than ``min_distinct``
    distinct bytes — the direct low-complexity criterion (e.g. runs of
    one or two characters), cheap enough to vectorize per offset pair."""
    lens = ends - starts
    n_frames = np.maximum(lens - k + 1, 0)
    total = int(n_frames.sum())
    out = np.zeros(total, dtype=bool)
    if total == 0:
        return out
    lo = int(starts.min())
    region = data[lo:int(ends.max())]
    first = np.repeat(starts - lo, n_frames)
    cum = np.zeros(len(starts), dtype=np.int64)
    np.cumsum(n_frames[:-1], out=cum[1:])
    pos = np.arange(total, dtype=np.int64) - np.repeat(cum, n_frames) + first
    # exact distinct-byte count per window: sort the k shifted views
    # column-wise and count value changes (k small, fully vectorized)
    stack = np.stack([region[pos + j] for j in range(k)], axis=1)
    stack.sort(axis=1)
    distinct = 1 + (stack[:, 1:] != stack[:, :-1]).sum(axis=1)
    return distinct < min_distinct
