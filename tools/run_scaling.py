"""Scaling-efficiency protocol runner (BASELINE.md): the same
spark-submit index-build job at local[8] (N) and local[32] (4N) over the
same pre-generated corpus; reports docs/sec at both and
efficiency = docs_per_sec_4N / (4 * docs_per_sec_N).

Writes BENCH_scaling.json and appends a results section to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")

N_DOCS = int(os.environ.get("SCALING_DOCS", "40000"))


def gen_corpus(path: str) -> None:
    from lucene_solr_old_spark.session import get_spark
    from lucene_solr_old_spark.sources.pages import pages_dataframe

    spark = get_spark("gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    pages_dataframe(spark, N_DOCS, seed=42, num_partitions=64) \
        .write.mode("overwrite").parquet(path)
    spark.stop()


def run_one(master: str, shuffle: int, zip_path: str, inp: str,
            out: str) -> dict:
    cmd = [
        "spark-submit", "--master", master, "--py-files", zip_path,
        "--conf", "spark.ui.enabled=false",
        "--driver-memory", "8g",
        "bench/index_bench.py", "--input", inp, "--out", out,
        "--segments", "32", "--salt", "8", "--shuffle", str(shuffle),
    ]
    res = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo",
                         timeout=3600)
    for line in res.stdout.splitlines()[::-1]:
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from {master}:\n{res.stdout[-2000:]}\n"
                       f"{res.stderr[-3000:]}")


def main() -> None:
    from lucene_solr_old_spark.session import package_zip

    os.makedirs("/root/repo/dist", exist_ok=True)
    zip_path = package_zip("/root/repo/dist")

    work = tempfile.mkdtemp(prefix="scaling-")
    corpus = os.path.join(work, "pages")
    print(f"generating {N_DOCS} pages -> {corpus}", flush=True)
    gen_corpus(corpus)

    runs = {}
    for label, master, shuffle in [("N_local8", "local[8]", 32),
                                   ("4N_local32", "local[32]", 128)]:
        out = os.path.join(work, f"idx-{label}")
        print(f"running {master} shuffle={shuffle}", flush=True)
        runs[label] = run_one(master, shuffle, zip_path, corpus, out)
        print(runs[label], flush=True)

    dps_n = runs["N_local8"]["docs_per_sec"]
    dps_4n = runs["4N_local32"]["docs_per_sec"]
    eff = round(dps_4n / (4 * dps_n), 3)
    result = {
        "protocol": "BASELINE.md scaling-efficiency (sandbox substitute)",
        "corpus_docs": N_DOCS,
        "machine_cores": os.cpu_count(),
        "docs_per_sec_N": dps_n,
        "docs_per_sec_4N": dps_4n,
        "scaling_efficiency": eff,
        "target": 0.8,
        "pass": eff >= 0.8,
        "runs": runs,
    }
    with open("/root/repo/BENCH_scaling.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
