"""Sketch artifact store — the Ray analogue of the reference's ``.bf``
raw bit dump + ``.txt`` INI sidecar pair (``BloomFilterGenerator.cpp:71``,
``Common/BloomFilterInfo.cpp:81-116``).

Layout per filter:
    <dir>/<filter_id>.bf        raw serialized filter (header + bit dump)
    <dir>/<filter_id>.json      info sidecar (same fields as the INI)

Writes are atomic (temp file + rename) so a partially-written artifact
never looks complete to a resuming job.
"""

from __future__ import annotations

import json
import os
import tempfile

from biobloom_ray.sketches.bloom import BloomFilter


def _atomic_write(path: str, data: bytes) -> None:
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def save_filter(bf: BloomFilter, directory: str,
                desired_fpr: float | None = None,
                expected_entries: int | None = None,
                sources: list[str] | None = None) -> str:
    base = os.path.join(directory, bf.filter_id or "filter")
    _atomic_write(base + ".bf", bf.serialize())
    info = bf.info_dict(desired_fpr=desired_fpr,
                        expected_entries=expected_entries, sources=sources)
    _atomic_write(base + ".json", json.dumps(info, indent=2).encode())
    return base + ".bf"


def load_filter(path: str) -> BloomFilter:
    with open(path, "rb") as f:
        return BloomFilter.deserialize(f.read())


def save_mibf(mibf, directory: str, name: str = "mibf") -> str:
    """S10 analogue: persist a built multi-index Bloom filter (raw
    serialized blob, atomic write) so downstream classify jobs — or a
    resumed run — load it instead of rebuilding (the reference ships
    the ``.bf`` + id-table pair to the categorizer the same way)."""
    path = os.path.join(directory, name + ".mibf")
    _atomic_write(path, mibf.serialize())
    return path


def load_mibf(path: str):
    from biobloom_ray.sketches.mibf import MIBloomFilter
    with open(path, "rb") as f:
        return MIBloomFilter.deserialize(f.read())


def load_filter_bank(directory: str) -> list[BloomFilter]:
    """Load every ``*.bf`` in a directory, sorted by filename — the -f
    filter-order list of the categorizer (``BioBloomClassifier.cpp:950-971``)."""
    out = []
    for name in sorted(os.listdir(directory)):
        if name.endswith(".bf"):
            out.append(load_filter(os.path.join(directory, name)))
    return out
