"""`ray job submit` entry point (BASELINE: the whole pipeline runs via
``ray job submit`` and resumes from per-partition checkpoints).

    ray job submit --working-dir . -- python -m biobloom_ray \
        --ref ref_corpora_dir --input pages_dir --out out_dir \
        [--kmer 25] [--fpr 0.0078125] [--threshold 0.15] [--mode std]

Re-running the same command after a kill resumes: finished partitions
(complete ``_lineage.json``) are skipped.  This is the only script in
the package that owns a Ray session (guarded init).
"""

from __future__ import annotations

from biobloom_ray.io import read_parquet as _rp
import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="biobloom_ray")
    p.add_argument("--job", default="categorize",
                   choices=["categorize", "curate"],
                   help="categorize (build bank + classify) or curate "
                        "(quality gate + resumable cross-partition "
                        "exact dedup)")
    p.add_argument("--ref", default=None,
                   help="parquet dir/file of reference corpora "
                        "(filter_id, doc); required for categorize")
    p.add_argument("--min-alpha-pct", type=int, default=50,
                   help="curate: keep iff 100*n_alpha >= pct*n_chars")
    p.add_argument("--neardup", action="store_true",
                   help="curate: also drop MinHash near-duplicates "
                        "(within + cross partition, per-partition "
                        "signature checkpoints)")
    p.add_argument("--neardup-threshold", type=float, default=0.6,
                   help="curate --neardup: est-Jaccard drop threshold")
    p.add_argument("--input", required=True, help="parquet dir of pages")
    p.add_argument("--out", required=True, help="output dir (partitioned)")
    p.add_argument("--kmer", type=int, default=25)
    p.add_argument("--fpr", type=float, default=0.0078125)
    p.add_argument("--threshold", type=float, default=0.15)
    p.add_argument("--method", default="simple",
                   choices=["simple", "harmonic", "binomial", "length"])
    p.add_argument("--mode", default="std",
                   choices=["std", "ordered", "besthit", "scores"])
    p.add_argument("--text-col", default="text")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only for local runs; under `ray job submit` the "
                        "cluster provides resources")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kw = dict(include_dashboard=False, ignore_reinit_error=True)
        if args.num_cpus:
            kw.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kw)
    import ray.data

    from biobloom_ray.config import BuildConfig, CategorizeConfig
    from biobloom_ray.pipelines import build_filters
    from biobloom_ray.pipelines.resumable import (
        run_partitioned_categorize,
        run_partitioned_curation,
    )

    if args.job == "curate":
        result = run_partitioned_curation(
            args.input, args.out, min_alpha_pct=args.min_alpha_pct,
            neardup=args.neardup,
            neardup_threshold=args.neardup_threshold)
        print(json.dumps(result))
        ray.shutdown()
        return 0

    if not args.ref:
        p.error("--ref is required for --job categorize")
    ref = _rp(args.ref)
    built = build_filters(ref, text_col="doc", label_col="filter_id",
                          cfg=BuildConfig(kmer_size=args.kmer,
                                          desired_fpr=args.fpr))
    bank = [built[f]["filter"] for f in sorted(built)]
    cfg = CategorizeConfig(scoring_method=args.method,
                           score_threshold=args.threshold, mode=args.mode)
    result = run_partitioned_categorize(args.input, args.out, bank, cfg,
                                        text_col=args.text_col)
    print(json.dumps(result))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
