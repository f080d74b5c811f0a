"""biobloom_ray — a from-scratch, Ray-Data-native sketch /
approximate-aggregation engine for web text, with the query and
data-processing capabilities of bcgsc/biobloom (studied read-only at
/root/reference; see SURVEY.md for the operator inventory and
citations).

Layers:
- ``hashing``     — vectorized ntHash-style rolling k-shingle multi-hash
- ``sketches``    — mergeable Bloom / HLL / CMS / KLL / MinHash / SimHash
- ``scoring``     — exact SeqEval.h per-read decision semantics, batch-vectorized
- ``stages``      — map_batches UDFs / actor-pool classes
- ``pipelines``   — build (biobloommaker), categorize (biobloomcategorizer),
                    dedup, text stats, ANN
- ``state``       — sketch artifacts + per-partition lineage/checkpoints
"""

__version__ = "0.1.0"

# Filter Ray Data's schema-hash warning here (not just in io.py): worker
# processes import this package when unpickling UDF closures, so the
# filter applies wherever blocks are actually unioned.  See io.py for
# why the testdata's pandas schema metadata is unhashable.  A targeted
# Filter (not setLevel) so unrelated warnings from the module still
# surface (ADVICE r2).
import logging as _logging


class _SchemaHashNoise(_logging.Filter):
    def filter(self, record: _logging.LogRecord) -> bool:
        return "Failed to hash the schema" not in record.getMessage()


_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow") \
    .addFilter(_SchemaHashNoise())
