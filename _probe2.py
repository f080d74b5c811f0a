import sys
import time

import numpy as np
import pyarrow as pa

import ray

NC = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ray.init(address="local", num_cpus=NC, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
import ray.data

from biobloom_ray.config import BuildConfig
from biobloom_ray.hashing import shingle_hashes
from biobloom_ray.pages import generate_ref_corpora, pages_path
from biobloom_ray.pipelines import build_filters
from biobloom_ray.scoring import eval_batch
from biobloom_ray.textnorm import normalize_batch

pages_dir = pages_path(100000)
ref = ray.data.from_arrow(generate_ref_corpora(docs_per_lang=100))
built = build_filters(ref, text_col="doc", label_col="filter_id",
                      cfg=BuildConfig(kmer_size=8, batch_size=2048))
bank = [built[f]["filter"] for f in sorted(built)]
for f in bank:
    f.words = np.array(f.words, copy=True)
bank_ref = ray.put(bank)

CACHE = {}


def probe(b):
    bk = CACHE.get("bk")
    if bk is None:
        bk = ray.get(bank_ref)
        for f in bk:
            f.words = np.array(f.words, copy=True)
        CACHE["bk"] = bk
    ts = [time.process_time()]
    texts = b["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    tex = normalize_batch(texts)
    ts.append(time.process_time())
    h1, h2, nf = shingle_hashes(tex, 8)
    ts.append(time.process_time())
    pf = [f.contains(h1, h2) for f in bk]
    ts.append(time.process_time())
    for fh in pf:
        eval_batch(fh, nf, 8, method="simple", threshold=0.15)
    ts.append(time.process_time())
    d = np.diff(ts)
    return pa.table({"norm": pa.array([d[0]]), "shingle": pa.array([d[1]]),
                     "contains": pa.array([d[2]]), "ev": pa.array([d[3]])})


pages = ray.data.read_parquet(pages_dir, columns=["text"])
pages.limit(16384).map_batches(probe, batch_format="pyarrow",
                               batch_size=1024, num_cpus=1).count()
t0 = time.perf_counter()
df = pages.map_batches(probe, batch_format="pyarrow", batch_size=1024,
                       num_cpus=1).to_pandas()
print(f"RESULT nc={NC} wall={time.perf_counter()-t0:.2f} batches={len(df)} "
      f"norm={df.norm.sum():.1f} shingle={df.shingle.sum():.1f} "
      f"contains={df.contains.sum():.1f} eval={df.ev.sum():.1f}", flush=True)
ray.shutdown()
