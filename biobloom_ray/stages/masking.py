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


def dust_mask(data: np.ndarray, starts: np.ndarray, ends: np.ndarray,
              k: int, window: int = 64, threshold: float = 2.0) -> np.ndarray:
    """DUST-style triplet-repetitiveness mask (the direct analogue of the
    reference's SDUST criterion, ``Common/sdust.c``; Morgulis 2006).

    Score of a window = Σ_t c_t(c_t−1)/2 / (l−1) over triplet counts
    c_t (l = triplets in window); windows scoring above ``threshold``
    (= reference T=20 at the ×10 scale) are masked.  Divergence from
    sdust, documented: windows are NON-overlapping ``window``-byte
    blocks instead of sdust's perfect subintervals — block masking is
    the standard cheap approximation and is fully vectorizable (one
    lexsort over (window, triplet)); sdust's interval refinement is
    inherently sequential per row.

    Returns a frame mask aligned with ``shingle_hashes`` frames: frame
    f is masked iff its START byte falls in a masked window.
    """
    lens = ends - starts
    n_frames = np.maximum(lens - k + 1, 0)
    total = int(n_frames.sum())
    out = np.zeros(total, dtype=bool)
    if total == 0:
        return out

    n_rows = len(starts)
    # triplet positions per row: lens-2 of them
    n_trip = np.maximum(lens - 2, 0)
    t_total = int(n_trip.sum())
    if t_total == 0:
        return out
    row_of_t = np.repeat(np.arange(n_rows, dtype=np.int64), n_trip)
    cum_t = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(n_trip[:-1], out=cum_t[1:])
    # in-row triplet offset and global byte position
    off = np.arange(t_total, dtype=np.int64) - np.repeat(cum_t, n_trip)
    pos = np.repeat(starts, n_trip) + off
    d = data.astype(np.int64, copy=False)
    trip = d[pos] + (d[pos + 1] << 8) + (d[pos + 2] << 16)
    win = off // window
    # global window id per (row, win): windows per row = ceil.  Sized
    # from BOTH streams: frames outnumber triplets when k <= 2
    # (n_frames = lens-k+1 > lens-2 = n_trip), and the frame→window map
    # below must not collide with the next row's window 0 (ADVICE r2)
    max_win = (max(int(np.max(n_trip)), int(np.max(n_frames)))
               + window - 1) // window
    gwin = row_of_t * max_win + win

    order = np.lexsort((trip, gwin))
    gs, ts = gwin[order], trip[order]
    new_grp = np.empty(t_total, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = (gs[1:] != gs[:-1]) | (ts[1:] != ts[:-1])
    gid = np.cumsum(new_grp) - 1
    c = np.bincount(gid)                       # count per (window, triplet)
    pair_score = c * (c - 1) // 2
    # window boundaries in the sorted stream
    new_win = np.empty(t_total, dtype=bool)
    new_win[0] = True
    new_win[1:] = gs[1:] != gs[:-1]
    wid = np.cumsum(new_win) - 1
    # sum pair scores per window (each group contributes once)
    grp_first = np.nonzero(new_grp)[0]
    win_of_grp = wid[grp_first]
    w_score = np.bincount(win_of_grp, weights=pair_score.astype(np.float64))
    # window length l (triplets) per window id
    w_len = np.bincount(wid)
    denom = np.maximum(w_len - 1, 1).astype(np.float64)
    masked_w = (w_score / denom) > threshold
    # map back: triplet-stream → masked windows set (per gwin value)
    masked_gwin_vals = np.unique(gs[np.nonzero(new_win)[0][masked_w]])

    # frame start byte offset → window id → masked?
    cum_f = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(n_frames[:-1], out=cum_f[1:])
    f_off = np.arange(total, dtype=np.int64) - np.repeat(cum_f, n_frames)
    f_gwin = np.repeat(np.arange(n_rows, dtype=np.int64), n_frames) \
        * max_win + f_off // window
    idx = np.searchsorted(masked_gwin_vals, f_gwin)
    idx[idx == len(masked_gwin_vals)] = 0
    if len(masked_gwin_vals):
        out = masked_gwin_vals[idx] == f_gwin
    return out
