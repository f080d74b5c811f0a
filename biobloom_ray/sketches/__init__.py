from biobloom_ray.sketches.bloom import (
    BloomFilter,
    calc_approx_fpr,
    calc_optimal_hash_num,
    calc_optimal_size,
    calc_redundancy_fpr,
)
from biobloom_ray.sketches.cms import CountMinSketch
from biobloom_ray.sketches.hll import HLL
from biobloom_ray.sketches.kll import KLL
from biobloom_ray.sketches.minhash import (
    exact_jaccard_from_hashes,
    lsh_band_keys,
    minhash_signatures,
    signature_jaccard,
)
from biobloom_ray.sketches.simhash import (
    hamming_distance,
    simhash_band_keys,
    simhash_fingerprints,
)
from biobloom_ray.sketches.tdigest import TDigest

__all__ = [
    "BloomFilter", "HLL", "CountMinSketch", "KLL", "TDigest",
    "calc_approx_fpr", "calc_optimal_hash_num", "calc_optimal_size",
    "calc_redundancy_fpr",
    "minhash_signatures", "lsh_band_keys", "signature_jaccard",
    "exact_jaccard_from_hashes",
    "simhash_fingerprints", "hamming_distance", "simhash_band_keys",
]
