#!/usr/bin/env python
"""Reproduce the r14 driver-mode in-suite decay (VERDICT r15 item #1).

Runs the SAME 63 bench rows in the SAME order as bench.py (cold, one
session), but after every query also samples JVM health counters so the
decay — if present — can be attributed: cumulative GC time, metaspace /
codeheap (JIT code cache) usage, loaded class count, and block-manager
storage (accumulated localCheckpoint RDD blocks + broadcasts).

Usage: python scripts/diagnose_decay.py [out.json]
Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_CODEGEN_CACHE
exactly like bench.py. This is a diagnostic, NOT the bench — the bench
contract (one JSON line) is untouched.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.driver_contract import QUERIES

from bench import BENCH_QUERIES  # same rows, same order


def _jvm_pid() -> int | None:
    import subprocess

    try:
        out = subprocess.run(
            ["pgrep", "-f", "org.apache.spark.deploy.SparkSubmit"],
            capture_output=True, text=True,
        ).stdout.split()
        return int(out[0]) if out else None
    except Exception:
        return None


def _proc_cpu(pid: int | None) -> float:
    """utime+stime (all threads) of a process, seconds."""
    if pid is None:
        return 0.0
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().split()
        return (int(parts[13]) + int(parts[14])) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return 0.0


def jvm_stats(spark) -> dict:
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = 0
    gc_n = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        b = it.next()
        gc_ms += b.getCollectionTime()
        gc_n += b.getCollectionCount()
    pools = {}
    it = mf.getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        p = it.next()
        name = p.getName()
        if "Metaspace" in name or "CodeHeap" in name or "Code Cache" in name:
            pools[name] = p.getUsage().getUsed()
    cl = mf.getClassLoadingMXBean()
    jit_ms = mf.getCompilationMXBean().getTotalCompilationTime()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    # block-manager storage: accumulated checkpoint/broadcast blocks
    sc = spark.sparkContext
    try:
        status = sc._jsc.sc().getExecutorMemoryStatus()
        mem_str = status.toString()[:400]
    except Exception:
        mem_str = ""
    try:
        rdd_infos = sc._jsc.sc().getRDDStorageInfo()
        n_cached = len(rdd_infos)
        cached_bytes = sum(r.memSize() for r in rdd_infos)
    except Exception:
        n_cached, cached_bytes = -1, -1
    return {
        "gc_ms": gc_ms,
        "gc_count": gc_n,
        "jit_ms": jit_ms,
        "heap_used_mb": round(heap.getUsed() / 1e6, 1),
        "loaded_classes": cl.getLoadedClassCount(),
        "pools_mb": {k: round(v / 1e6, 1) for k, v in pools.items()},
        "cached_rdds": n_cached,
        "cached_mb": round(cached_bytes / 1e6, 1),
        "mem_status": mem_str,
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decay.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("diagnose-decay")
    # same warm-up as bench.py so position 1 is comparable
    warm = spark.read.parquet(f"{sf_dir}/nation.parquet")
    warm.count()

    rows = []
    jvm_pid = _jvm_pid()
    t_suite = time.time()
    for pos, name in enumerate(BENCH_QUERIES):
        fn = QUERIES[name]
        cpu0 = _proc_cpu(jvm_pid)
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        st = jvm_stats(spark)
        st.update(
            {
                "pos": pos,
                "query": name,
                "wall": round(wall, 3),
                "jvm_cpu": round(_proc_cpu(jvm_pid) - cpu0, 2),
            }
        )
        rows.append(st)
        print(
            f"[{pos:02d}] {name:32s} {wall:7.2f}s cpu={st['jvm_cpu']:7.1f}s "
            f"gc={st['gc_ms']/1000:6.1f}s jit={st['jit_ms']/1000:6.1f}s "
            f"heap={st['heap_used_mb']:7.0f}MB cls={st['loaded_classes']} "
            f"rdds={st['cached_rdds']} cached={st['cached_mb']:.0f}MB",
            flush=True,
        )
    total = time.time() - t_suite
    with open(out_path, "w") as f:
        json.dump({"total": round(total, 2), "rows": rows}, f, indent=1)
    print(f"TOTAL {total:.1f}s -> {out_path}")


if __name__ == "__main__":
    main()
