"""Intrinsic per-worker scaling of the media extraction math — NO Spark:
N independent processes each running the single-image oracle path on its
own slice. This isolates the single-box memory-bus ceiling from Spark
overhead: on a real N->4N multi-node cluster every node contributes its
own DRAM channels, so the per-worker rate measured at N workers here is
what each node's workers sustain there.

Run:  python BENCH/intrinsic.py [imgs_per_worker]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def worker(args):
    wid, n_imgs = args
    from mit_spark.config import DetectorOptions, PreprocessorOptions
    from mit_spark.oracle import extract_media_span
    from mit_spark.session import apply_worker_env
    from mit_spark.synth import media_ref_for

    apply_worker_env()
    opts = DetectorOptions(detect_size=512, emit_mask=False)
    pre = PreprocessorOptions()
    refs = [media_ref_for(f"doc-{wid:02d}{i:06d}", 1) for i in range(n_imgs)]
    for r in refs[:8]:  # warm arenas/imports
        extract_media_span(r, 0, opts, pre)
    t0 = time.time()
    for r in refs:
        extract_media_span(r, 0, opts, pre)
    return n_imgs / (time.time() - t0)


def measure(n_workers: int, n_imgs: int) -> dict:
    with mp.Pool(n_workers) as pool:
        rates = pool.map(worker, [(w, n_imgs) for w in range(n_workers)])
    agg = sum(rates)
    return {
        "workers": n_workers,
        "per_worker_img_s": round(agg / n_workers, 1),
        "aggregate_img_s": round(agg, 1),
    }


def main() -> int:
    n_imgs = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    res = {}
    for n in (4, 16, 32):
        res[str(n)] = measure(n, n_imgs)
    r4 = res["4"]["per_worker_img_s"]
    res["eff_16_vs_4"] = round(res["16"]["per_worker_img_s"] / r4, 3)
    res["eff_32_vs_4"] = round(res["32"]["per_worker_img_s"] / r4, 3)
    print(json.dumps(res, indent=2))
    with open(os.path.join(REPO_ROOT, "BENCH", "intrinsic_result.json"), "w") as f:
        json.dump(res, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
