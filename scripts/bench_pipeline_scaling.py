"""Full-pipeline N vs 4N scaling: the WHOLE 7-stage KG build (extract →
mentions → link → triples → canonicalize → nodes/edges), launched exactly
as the north rule prescribes — ``spark-submit --py-files <zip>`` — at two
pinned parallelism levels on the same pre-generated pages table.

Reports wall, triples/sec at each level, and scaling efficiency. Unlike
the annotate-stage benchmark (BENCH_SCALING.md headline), this includes
every shuffle and every stage-commit parquet write, so it bounds the
end-to-end pipeline's scaling, not just the hot kernel's.

Usage: python scripts/bench_pipeline_scaling.py
Env: PIPE_DOCS (default 80000), PIPE_LO/PIPE_HI (default 4/16),
     PIPE_INTERLEAVES (default 2), PIPE_HTML_STYLE=clean|messy and
     PIPE_EXTRACTOR=synthetic|web (the real-web configuration: messy
     chrome-wrapped pages + the boilerplate-aware extractor — at real
     scale the extractor IS the dominant stage, so its cost must be on
     the scaling record, not just the synthetic inverse's).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LO = int(os.environ.get("PIPE_LO", "4"))
HI = int(os.environ.get("PIPE_HI", "16"))
N_DOCS = int(os.environ.get("PIPE_DOCS", "80000"))
SENTS = int(os.environ.get("PIPE_SENTS", "12"))
INTERLEAVES = int(os.environ.get("PIPE_INTERLEAVES", "2"))
BASE = os.environ.get("PIPE_BASE", "/tmp/quickner_pipe_scaling")
BUCKET = os.environ.get("PIPE_BUCKET", "") == "1"
HTML_STYLE = os.environ.get("PIPE_HTML_STYLE", "clean")
EXTRACTOR = os.environ.get("PIPE_EXTRACTOR", "synthetic")
ZIP = "/tmp/quickner_spark.zip"


def _gen_pages(path: str) -> None:
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from quickner_spark.session import get_spark
from quickner_spark.kg import corpus
spark = get_spark("pipe-gen", cores=32)
spark.sparkContext.setLogLevel("ERROR")
corpus.synth_pages(spark, {N_DOCS}, seed=42, gaz_size=999, partitions=128,
                   sents_per_page={SENTS}, html_style={HTML_STYLE!r}
                   ).write.mode("overwrite").parquet({path!r})
print("generated")
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True,
                   capture_output=True, text=True, timeout=3600)


def _cpu_sample(cores: int) -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) summed over the PINNED cpus 0..cores-1.

    Whole-box sampling dilutes steal with the (32 - cores) idle cpus'
    jiffies — a 4-core leg on a 32-core box underreports pinned-core steal
    8×. Summing only the cpus taskset pins the leg to makes steal_pct the
    share of the leg's *own* cpu-time budget lost to the hypervisor."""
    steal = total = 0
    with open("/proc/stat") as fh:
        for line in fh:
            f = line.split()
            if not f or not f[0].startswith("cpu") or f[0] == "cpu":
                continue
            if int(f[0][3:]) >= cores:
                continue
            vals = [int(x) for x in f[1:]]
            steal += vals[7] if len(vals) > 7 else 0
            total += sum(vals)
    return steal, total


def _mem_probe() -> tuple[float, float]:
    """(triad_gbs, fault_gbs) — a 2-second environment-health probe run
    before each leg. ``triad`` is single-thread in-place STREAM-style
    bandwidth over warm pages (this box calm: ~11-12 GB/s); ``fault`` is
    the same arithmetic over FRESHLY allocated arrays, so its wall is
    dominated by page-fault servicing — the channel co-tenant pressure
    and hypervisor ballooning show up in first (observed as low as
    0.5 GB/s while steal read 0.3%). /proc/stat steal misses both, so a
    leg can look 'calm' by steal while the memory system is degraded;
    these two numbers date-stamp the environment each wall was measured
    in."""
    import numpy as np
    import time as _t
    n = 20_000_000
    a = np.ones(n); b = np.ones(n); c = np.ones(n)
    np.add(b, c, out=a)
    t0 = _t.perf_counter()
    for _ in range(3):
        np.multiply(c, 1.5, out=a)
        np.add(a, b, out=a)
    triad = 4 * 8 * n * 3 / (_t.perf_counter() - t0) / 1e9
    t0 = _t.perf_counter()
    for _ in range(3):
        x = np.ones(n); y = np.ones(n)
        x = x + 1.5 * y
    fault = 4 * 8 * n * 3 / (_t.perf_counter() - t0) / 1e9
    return round(triad, 1), round(fault, 1)


def _submit(cores: int, out_dir: str) -> dict:
    """spark-submit --py-files, process tree pinned to `cores` cores.

    Each leg's result carries ``steal_pct`` — hypervisor steal as a share
    of the PINNED cpus' jiffies during the leg (Δsteal/Δtotal over cpus
    0..cores-1 from /proc/stat). This box shows near-zero steal idle but
    loses a large CPU share under load; a leg with elevated steal_pct is
    an environment reading, not a code reading, and the efficiency
    computed from it is a lower bound. ``triad_gbs``/``fault_gbs``
    (:func:`_mem_probe`, sampled just before the leg) catch the
    degradation channel steal misses: co-tenant memory-bus pressure and
    slow hypervisor page-fault servicing."""
    triad, fault = _mem_probe()
    s0, t0 = _cpu_sample(cores)
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit", "--master", f"local[{cores}]",
        "--driver-memory", f"{max(cores, 4)}g",
        # PIPE_SPARK_TMP=/dev/shm/... takes the single shared virtual disk
        # out of the measurement (stage outputs already go to PIPE_BASE):
        # cluster executors each bring their own local disks, one box does
        # not — shuffle spill on tmpfs models per-executor storage.
        "--conf", f"spark.local.dir={os.environ.get('PIPE_SPARK_TMP', '/tmp')}",
        # PIPE_CONF="k=v;k2=v2" — extra spark confs for A/B runs (e.g.
        # compression codecs: on a bandwidth-bound box smaller bytes in
        # flight trade CPU the wide leg has for bus traffic it doesn't)
        *[x for kv in os.environ.get("PIPE_CONF", "").split(";") if kv
          for x in ("--conf", kv)],
        "--py-files", ZIP,
        os.path.join(REPO, "scripts", "run_kg_pipeline.py"),
        "--pages", os.path.join(BASE, "pages"),
        "--out", out_dir, "--cores", str(cores),
        "--extractor", EXTRACTOR,
    ]
    if BUCKET:
        cmd += ["--bucket", str(cores * 2)]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=int(os.environ.get("PIPE_TIMEOUT", "2400")),
                         env={**os.environ, "PYTHONPATH": REPO})
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-3000:])
    r = json.loads(lines[-1])
    s1, t1 = _cpu_sample(cores)
    r["steal_pct"] = round(100.0 * (s1 - s0) / max(1, t1 - t0), 1)
    r["triad_gbs"], r["fault_gbs"] = triad, fault
    return r


def main() -> None:
    pages = os.path.join(BASE, "pages")
    if not os.path.exists(os.path.join(pages, "_SUCCESS")):
        os.makedirs(BASE, exist_ok=True)
        _gen_pages(pages)
    # always rebuild: a stale zip silently benchmarks yesterday's code
    if os.path.exists(ZIP):
        os.remove(ZIP)
    subprocess.run(["zip", "-qr", ZIP, "quickner_spark"],
                   cwd=REPO, check=True)
    runs: dict[int, list[dict]] = {LO: [], HI: []}
    for i in range(INTERLEAVES):
        for cores in (LO, HI):
            out_dir = os.path.join(BASE, f"kg_{cores}_{i}")
            shutil.rmtree(out_dir, ignore_errors=True)  # fresh: no skip
            r = _submit(cores, out_dir)
            assert all(v == "ran" for v in r["status"].values()), r["status"]
            runs[cores].append(r)
            shutil.rmtree(out_dir, ignore_errors=True)
    lo = max(runs[LO], key=lambda r: r["triples_per_sec"])
    hi = max(runs[HI], key=lambda r: r["triples_per_sec"])
    assert lo["rows"] == hi["rows"], (lo["rows"], hi["rows"])
    eff = (hi["triples_per_sec"] / lo["triples_per_sec"]) / (HI / LO)
    result = {
        "job": "full 7-stage KG pipeline via spark-submit --py-files",
        "n_docs": N_DOCS,
        "html_style": HTML_STYLE,
        "extractor": EXTRACTOR,
        f"local{LO}": lo, f"local{HI}": hi,
        "speedup": round(hi["triples_per_sec"] / lo["triples_per_sec"], 2),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "a") as fh:
        fh.write(
            f"| FULL PIPELINE{' BUCKETED' if BUCKET else ''}"
            f"{' WEB-EXTRACTOR (messy html)' if EXTRACTOR == 'web' else ''}"
            f" (spark-submit --py-files), {N_DOCS}x{SENTS}-sent pages "
            f"| {lo['triples_per_sec']} triples/s @{LO} ({lo['wall_sec']}s,"
            f" steal {lo.get('steal_pct', 'n/a')}%,"
            f" triad/fault {lo.get('triad_gbs', 'n/a')}/"
            f"{lo.get('fault_gbs', 'n/a')} GB/s) "
            f"| {hi['triples_per_sec']} triples/s @{HI} ({hi['wall_sec']}s,"
            f" steal {hi.get('steal_pct', 'n/a')}%,"
            f" triad/fault {hi.get('triad_gbs', 'n/a')}/"
            f"{hi.get('fault_gbs', 'n/a')} GB/s) "
            f"| speedup {result['speedup']}x "
            f"| efficiency {result['scaling_efficiency']} |\n")


if __name__ == "__main__":
    main()
